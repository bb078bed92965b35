"""Cross-validation against the ACTUAL reference env stack.

Builds the reference dm_control composer environments (vnl_ray +
dm_control, with the 6 missing visual meshes patched the same way
tools/extract_fly_morphology.py documents, and the reference's unused
TF/acme/sonnet imports stubbed) and asserts that our functional envs
agree at matched states: action specs, observation dictionaries
(keys, shapes, VALUES), and reward/termination logic.

Reference: /root/reference/vnl_ray/fly_envs.py:125-157 (walk_on_ball),
:209-259 (template_task); tasks/basic_rodent_2020.py:60-83 (bowl).
"""

import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp


def _import_reference():
    os.environ.setdefault("MUJOCO_GL", "disabled")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    tools = os.path.join(os.path.dirname(__file__), "..", "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)

    class _AnyModule(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return object

    def stub(name):
        if name in sys.modules:
            return
        mod = _AnyModule(name)
        sys.modules[name] = mod
        parent, _, child = name.rpartition(".")
        if parent and parent in sys.modules:
            setattr(sys.modules[parent], child, mod)

    # the reference transitively imports its TF/ray agent stack from the
    # task modules; none of it is exercised by env construction
    for n in ("sonnet", "acme", "acme.types", "acme.tf", "acme.tf.utils",
              "ray", "wandb"):
        stub(n)

    import extract_fly_morphology as ex
    patched = ex.patch_xml(os.path.join(ex.REF, "fruitfly.xml"))
    import vnl_ray.fruitfly.fruitfly as ff_mod
    ff_mod._XML_PATH = patched
    import vnl_ray.fly_envs as ref_envs
    return ref_envs


try:
    REF_ENVS = _import_reference()
    _REF_ERR = None
except Exception as e:          # pragma: no cover
    REF_ENVS = None
    _REF_ERR = e

needs_ref = pytest.mark.skipif(
    REF_ENVS is None, reason=f"reference stack unavailable: {_REF_ERR}")


def _our_obs_at_state(env, qpos, qvel):
    """Run our full smooth+sensor pipeline (converged solver) at a
    matched (qpos, qvel) and return the single-env obs dict."""
    from flybody_tpu.physics import constraint as Cn
    from flybody_tpu.physics import forward as F
    from flybody_tpu.physics import io_mj
    from flybody_tpu.physics import sensors as sens

    m = env.model
    d = io_mj.make_data(m, B=1, dtype=jnp.float64)
    d = io_mj.set_state(d, qpos=qpos, qvel=qvel)
    d = F.fwd_position(m, d)
    d = F.fwd_velocity(m, d)
    d = F.fwd_actuation(m, d)
    d = F.fwd_acceleration(m, d)
    d = Cn.solve(m, d, iterations=200)
    d = sens.sensor(m, d)
    _, ts0 = env.task.init_state(m, jax.tree.map(lambda x: x[..., 0], d),
                                 jax.random.PRNGKey(0))
    dd = jax.tree.map(lambda x: x[..., 0], d)
    return env.task.observations(m, dd, ts0, dd.sensordata)


# ---------------------------------------------------------------- fly --
@needs_ref
class TestWalkOnBallParity:
    @pytest.fixture(scope="class")
    def envs(self):
        ref = REF_ENVS.walk_on_ball(
            random_state=np.random.RandomState(0))
        from flybody_tpu.fly_envs import walk_on_ball
        ours = walk_on_ball(dtype=jnp.float64)
        return ref, ours

    def test_action_spec(self, envs):
        ref, ours = envs
        spec = ref.action_spec()
        lo, hi = ours.action_spec()
        assert spec.shape == (ours.action_size,)
        np.testing.assert_allclose(spec.minimum, lo, atol=1e-12)
        np.testing.assert_allclose(spec.maximum, hi, atol=1e-12)

    def test_obs_keys_and_shapes(self, envs):
        ref, ours = envs
        ts = ref.reset()
        ref_obs = {k.split("/")[-1]: v for k, v in ts.observation.items()}
        s = ours.reset(jax.random.split(jax.random.PRNGKey(0), 1))
        our_obs = {k: np.asarray(v[0]) for k, v in s.obs.items()}
        missing = set(ref_obs) - set(our_obs)
        assert not missing, f"missing reference observables: {missing}"
        for k, v in ref_obs.items():
            assert np.shape(our_obs[k]) == np.shape(np.asarray(v)), k

    def test_obs_values_at_matched_state(self, envs):
        """Copy the reference's post-reset MuJoCo state into our engine
        and compare every shared observable value. The post-reset pose
        has ~10 deeply-penetrating self contacts, so constraint-force-
        dependent observables (accelerometer/force/touch) depend on the
        solver solution at an impedance cliff — those are compared
        airborne in the template test; here they get a loose sanity
        bound only."""
        ref, ours = envs
        ts = ref.reset()
        qpos = ref.physics.data.qpos.copy()
        qvel = ref.physics.data.qvel.copy()
        ref_obs = {k.split("/")[-1]: np.asarray(v)
                   for k, v in ts.observation.items()}
        our_obs = {k: np.asarray(v)
                   for k, v in _our_obs_at_state(ours, qpos, qvel).items()}
        constraint_dep = {"accelerometer", "force", "touch",
                          "self_contact"}
        for k in sorted(ref_obs):
            a, b = ref_obs[k], our_obs[k]
            if k in constraint_dep:
                assert np.all(np.isfinite(b)), k
                continue
            np.testing.assert_allclose(
                b, a, rtol=1e-4, atol=1e-5,
                err_msg=f"observable {k!r} diverges at matched state")

    def test_reward_at_matched_states(self, envs):
        """Reference reward = tolerance(ball_qvel - (0,-5,0), margin 6,
        linear); compare at randomized ball velocities."""
        from flybody_tpu.utils import rewards as rw
        ref, ours = envs
        ref.reset()
        rng = np.random.RandomState(1)
        ball_joint = ref.physics.named.data.qvel
        for _ in range(5):
            v = rng.randn(3) * 4.0
            ref.physics.named.data.qvel["ball"] = v
            ref_reward = ref.task.get_reward(ref.physics)
            factors = rw.tolerance(
                jnp.asarray(v) - jnp.asarray([0.0, -5.0, 0.0]),
                bounds=(0.0, 0.0), margin=6.0, sigmoid="linear",
                value_at_margin=0.0)
            our_reward = float(jnp.prod(factors))
            np.testing.assert_allclose(our_reward, ref_reward, atol=1e-9)


@needs_ref
class TestTemplateTaskParity:
    @pytest.fixture(scope="class")
    def envs(self):
        ref = REF_ENVS.template_task(
            random_state=np.random.RandomState(0))
        from flybody_tpu.fly_envs import template_task
        ours = template_task(dtype=jnp.float64)
        return ref, ours

    def test_action_spec(self, envs):
        ref, ours = envs
        spec = ref.action_spec()
        lo, hi = ours.action_spec()
        assert spec.shape == (ours.action_size,)
        np.testing.assert_allclose(spec.minimum, lo, atol=1e-12)
        np.testing.assert_allclose(spec.maximum, hi, atol=1e-12)

    def test_obs_values_airborne_exact(self, envs):
        """At a contact-free (airborne) matched state the FULL observable
        set — including the constraint-force-dependent accelerometer/
        force/touch — must agree: with no active contacts both stacks
        compute the same smooth dynamics."""
        ref, ours = envs
        ref.reset()
        phys = ref.physics
        with phys.reset_context():
            phys.data.qpos[2] += 2.0          # lift well above the floor
            phys.data.qpos[7:] = phys.model.qpos0[7:]
            rng = np.random.RandomState(0)
            phys.data.qvel[:] = 0.5 * rng.randn(phys.model.nv)
        qpos = phys.data.qpos.copy()
        qvel = phys.data.qvel.copy()
        # airborne: no PENETRATING contacts (the resting mouthparts sit
        # within each other's sensing margin at qpos0, which produces no
        # constraint force while dist > 0)
        if phys.data.ncon:
            assert float(np.min(phys.data.contact.dist)) > 0.0, \
                "state has penetrating contacts"
        ref_obs = {}
        for name, obs in ref.task.observables.items():
            if obs.enabled:
                ref_obs[name.split("/")[-1]] = np.asarray(obs(phys))
        our_obs = {k: np.asarray(v)
                   for k, v in _our_obs_at_state(ours, qpos, qvel).items()}
        shared = sorted(set(ref_obs) & set(our_obs))
        assert len(shared) >= 8, shared
        for k in shared:
            # constraint-coupled channels carry the solver-parity bound
            # (the resting mouthparts sit INSIDE their includemargin, so
            # one soft constraint row is active even airborne; elliptic
            # Newton vs converged APGD agree to ~1e-4 of gravity there)
            atol = 0.25 if k in ("accelerometer", "force", "touch") \
                else 1e-4
            np.testing.assert_allclose(
                our_obs[k], ref_obs[k], rtol=1e-4, atol=atol,
                err_msg=f"observable {k!r} diverges airborne")


# ------------------------------------------------------------- rodent --
def _patch_gl_free_render():
    """Replace dm_control's Physics.render with a zeros stub so the
    reference rodent envs (whose egocentric_camera observable renders at
    reset) construct without any OpenGL backend. Kinematic/sensor
    observables are unaffected — only pixels are faked."""
    from dm_control.mujoco import engine

    if getattr(engine.Physics.render, "_gl_free_stub", False):
        return

    def render(self, height=240, width=320, camera_id=-1, overlays=(),
               depth=False, segmentation=False, scene_option=None,
               render_flag_overrides=None, scene_callback=None):
        if depth:
            return np.zeros((height, width), np.float32)
        if segmentation:
            return np.zeros((height, width, 2), np.int32)
        return np.zeros((height, width, 3), np.uint8)

    render._gl_free_stub = True
    engine.Physics.render = render
    # the bowl arena re-uploads its hfield to the render context when one
    # exists (reference hills.py:251-258 analog); report none
    engine.Physics.contexts = property(lambda self: None)


@needs_ref
class TestRodentBowlParity:
    """Reference rodent escape-bowl vs ours, GL-free (VERDICT r4 task #6):
    action spec, observable set, and obs VALUES at the reference's own
    post-reset state copied into our engine."""

    @pytest.fixture(scope="class")
    def envs(self):
        _patch_gl_free_render()
        try:
            from vnl_ray.tasks.basic_rodent_2020 import rodent_escape_bowl
            ref = rodent_escape_bowl(random_state=np.random.RandomState(0))
        except Exception as e:
            pytest.skip(f"reference rodent env unavailable: {e}")
        from flybody_tpu.rodent_envs import rodent_escape_bowl as ours_fn
        ours = ours_fn(dtype=jnp.float64)
        return ref, ours

    def test_action_and_obs_specs(self, envs):
        ref, ours = envs
        spec = ref.action_spec()
        lo, hi = ours.action_spec()
        assert spec.shape == (ours.action_size,)
        np.testing.assert_allclose(spec.minimum, lo, atol=1e-12)
        np.testing.assert_allclose(spec.maximum, hi, atol=1e-12)
        ref_keys = {k.split("/")[-1] for k in ref.observation_spec()
                    if "egocentric_camera" not in k}
        s = ours.reset(jax.random.split(jax.random.PRNGKey(0), 1))
        our_keys = set(s.obs.keys())
        missing = ref_keys - our_keys
        assert not missing, f"missing rodent observables: {missing}"

    def test_obs_values_at_matched_state(self, envs):
        """Copy the reference's post-reset qpos/qvel into our rodent
        engine and compare every shared kinematic observable VALUE
        (the bar that caught the fly contact-exclude bug, now applied to
        the rodent stack). Terrain-dependent and constraint-force-
        dependent observables get finite-only bounds: the procedural
        bowl hfields differ by construction."""
        ref, ours = envs
        ts = ref.reset()
        qpos = ref.physics.data.qpos.copy()
        qvel = ref.physics.data.qvel.copy()
        assert qpos.shape[0] == ours.model.nq, (
            "rodent qpos layout mismatch vs reference")
        ref_obs = {k.split("/")[-1]: np.asarray(v)
                   for k, v in ts.observation.items()
                   if "egocentric_camera" not in k}
        our_obs = {k: np.asarray(v)
                   for k, v in _our_obs_at_state(ours, qpos, qvel).items()}
        # constraint- and terrain-dependent channels: values depend on
        # the contact solution / procedural hfield, not kinematics
        loose = {"sensors_touch", "sensors_accelerometer", "sensors_force",
                 "task_logic", "origin"}
        compared = []
        for k in sorted(set(ref_obs) & set(our_obs)):
            a, b = ref_obs[k], our_obs[k]
            assert np.shape(a) == np.shape(b), k
            if k in loose:
                assert np.all(np.isfinite(b)), k
                continue
            np.testing.assert_allclose(
                b, a, rtol=1e-4, atol=1e-5,
                err_msg=f"rodent observable {k!r} diverges at matched "
                        "state")
            compared.append(k)
        # the value bar must actually bite: kinematic channels compared
        assert len(compared) >= 5, compared
