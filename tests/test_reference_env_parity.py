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
    """Run our full smooth+sensor pipeline at a matched (qpos, qvel) and
    return the single-env obs dict."""
    from flybody_tpu.physics import forward as F
    from flybody_tpu.physics import io_mj
    from flybody_tpu.physics import sensors as sens

    m = env.model
    d = io_mj.make_data(m, B=1, dtype=jnp.float64)
    d = io_mj.set_state(d, qpos=qpos, qvel=qvel)
    d = F.forward(m, d)
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
        and compare every shared observable value."""
        ref, ours = envs
        ts = ref.reset()
        qpos = ref.physics.data.qpos.copy()
        qvel = ref.physics.data.qvel.copy()
        ref_obs = {k.split("/")[-1]: np.asarray(v)
                   for k, v in ts.observation.items()}
        our_obs = {k: np.asarray(v)
                   for k, v in _our_obs_at_state(ours, qpos, qvel).items()}
        for k in sorted(ref_obs):
            a, b = ref_obs[k], our_obs[k]
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

    def test_obs_values_at_matched_state(self, envs):
        ref, ours = envs
        ts = ref.reset()
        # free-root fly on the floor: reference qpos includes the root
        qpos = ref.physics.data.qpos.copy()
        qvel = ref.physics.data.qvel.copy()
        ref_obs = {k.split("/")[-1]: np.asarray(v)
                   for k, v in ts.observation.items()}
        our_obs = {k: np.asarray(v)
                   for k, v in _our_obs_at_state(ours, qpos, qvel).items()}
        shared = sorted(set(ref_obs) & set(our_obs))
        assert len(shared) >= 8, shared
        for k in shared:
            np.testing.assert_allclose(
                our_obs[k], ref_obs[k], rtol=1e-4, atol=1e-5,
                err_msg=f"observable {k!r} diverges at matched state")


# ------------------------------------------------------------- rodent --
@needs_ref
def test_rodent_bowl_spec_parity():
    """Rodent escape-bowl: the reference task builds from dm_control's own
    rodent assets. Compare action space and the non-vision observable
    set/shapes (vision needs EGL, unavailable here)."""
    try:
        from vnl_ray.tasks.basic_rodent_2020 import rodent_escape_bowl
        ref = rodent_escape_bowl(random_state=np.random.RandomState(0))
    except Exception as e:
        pytest.skip(f"reference rodent env unavailable: {e}")
    from flybody_tpu.rodent_envs import rodent_escape_bowl as ours_fn
    ours = ours_fn()
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
