"""Tethered fly walking on a floating ball (the framework's first
end-to-end task and the north-star throughput benchmark).

Reference: vnl_ray/tasks/walk_on_ball.py + arenas/ball.py. The fly's thorax
is fused to the world; a ball with a 3-dof ball joint floats under its legs.
Reward = tolerance(ball_qvel - (0, -5, 0), margin 6, linear), termination on
excessive thorax linear/angular velocity, discount 0 on termination.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import mujoco

from flybody_tpu.envs.core import FlyEnv, Task
from flybody_tpu.envs.walker import FlyWalker
from flybody_tpu.models import fruitfly as ff
from flybody_tpu.physics.types import Data, Model
from flybody_tpu.utils import rewards as rw
from flybody_tpu.tasks import constants as C


def ball_arena(ball_pos=(-0.05, 0.0, -0.419), ball_radius=0.454,
               ball_density=0.0025):
    """Arena callback adding the floating ball (reference arenas/ball.py)."""
    def fn(spec: mujoco.MjSpec):
        ball = spec.worldbody.add_body(name="ball", pos=np.asarray(ball_pos))
        ball.add_geom(name="ball", type=mujoco.mjtGeom.mjGEOM_SPHERE,
                      size=[ball_radius, 0, 0], density=ball_density,
                      rgba=[0.3, 0.4, 0.5, 1.0])
        ball.add_joint(name="ball", type=mujoco.mjtJoint.mjJNT_BALL)
    return fn


class WalkOnBall(Task):
    ctrl_dt = C.WALK_CONTROL_TIMESTEP
    phys_dt = C.WALK_PHYSICS_TIMESTEP
    deterministic_init = True

    def __init__(self, walker: FlyWalker, time_limit: float = 2.0):
        self.walker = walker
        self.time_limit = time_limit
        self.action_size = walker.action_size
        model = walker.model
        # ball joint dof address
        jid = model.names["joint"]["ball"]
        self.ball_dofadr = int(np.asarray(model.jnt_dofadr)[jid])

    def action_bounds(self, model: Model):
        return self.walker.action_bounds(model)

    def init_state(self, model: Model, data: Data, rng):
        return data, ()

    def before_step(self, model: Model, data: Data, task_state, action):
        return self.walker.apply_action(data, action), task_state

    def _ball_qvel(self, data: Data):
        return jax.lax.dynamic_slice(data.qvel, (self.ball_dofadr,), (3,))

    def observations(self, model: Model, data: Data, task_state,
                     sensor_mean) -> dict:
        obs = self.walker.observables(model, data, sensor_mean)
        obs["appendages_pos"] = self.walker.appendages_pos(data)
        obs.update(self.walker.force_touch_obs(sensor_mean))
        obs["ball_qvel"] = self._ball_qvel(data)
        return obs

    def reward_term_discount(self, model: Model, data: Data, task_state,
                             sensor_mean):
        target = jnp.asarray([0.0, -5.0, 0.0], data.qpos.dtype)
        factors = rw.tolerance(self._ball_qvel(data) - target,
                               bounds=(0.0, 0.0), margin=6.0,
                               sigmoid="linear", value_at_margin=0.0)
        reward = jnp.prod(factors)
        linvel = jnp.linalg.norm(
            self.walker.sensor_obs(sensor_mean, "velocimeter"))
        angvel = jnp.linalg.norm(self.walker.sensor_obs(sensor_mean, "gyro"))
        qacc = jnp.linalg.norm(data.qacc)
        terminated = ((linvel > C.TERMINAL_LINVEL)
                      | (angvel > C.TERMINAL_ANGVEL)
                      | (qacc > C.TERMINAL_QACC)
                      | jnp.any(jnp.isnan(data.qpos)))
        discount = jnp.where(terminated, 0.0, 1.0)
        return reward, terminated, discount


def make_walk_on_ball(claw_friction: float = 1.0, time_limit: float = 2.0,
                      joint_filter: float = 0.01,
                      adhesion_filter: float = 0.007,
                      dtype=jnp.float32) -> FlyEnv:
    """Factory (reference fly_envs.walk_on_ball)."""
    cfg = ff.FlyConfig(
        use_legs=True, use_wings=False, use_mouth=False, use_antennae=False,
        joint_filter=joint_filter, adhesion_filter=adhesion_filter,
        root_joint="none", spawn_pos=(0.0, 0.0, 0.1278),
        physics_timestep=C.WALK_PHYSICS_TIMESTEP,
        control_timestep=C.WALK_CONTROL_TIMESTEP)
    morph = ff.apply_surgery(ff.load_morphology(), cfg)
    # claw friction override (reference walk_on_ball.py:42-44)
    for b in morph.bodies:
        for g in b.geoms:
            if g.name.startswith("claw") or "labrum" in g.name:
                if g.gap > 0:  # adhesion-collision class geoms
                    g.friction = np.array([claw_friction, 0.005, 0.0001])
    spec = ff.to_spec(morph, cfg, arena_fn=ball_arena())
    mj_model = spec.compile()
    amap = ff.action_indices(morph, cfg)

    from flybody_tpu.physics import io_mj
    # tight active islands: the ball scene has <=16 simultaneous
    # claw/tarsus-ball contacts; condim-1 self-contact pairs are rare
    # tight budgets for the production env: the center-line support gate
    # sees ~30 hot convex pairs on the ball scene (oracle-grade default
    # is 128; missing a grazing pair costs a 1-substep pop, not NaNs)
    # col_refresh=10: selection (gates + top-K islands) once per control
    # step, geometry-only refresh in between. Divergence vs per-substep
    # selection sits AT the env's chaos floor (== a 1e-6 qvel
    # perturbation's divergence; the resting self-contact cluster is
    # chaotic, tests/test_fly_model.py::test_selfcontact_cluster_is_chaotic).
    # budgets sized under the TRAINED gait (mean policy at 42M steps,
    # tools/measure_active_contacts.py POLICY_CKPT mode): penetrating
    # condim-3 max 17, ccd gate-hot per class max 22, cone rows 42,
    # limit rows 23 — all with margin below these caps.
    # per-class ccd lanes from the same measurement (gate-hot maxes
    # 11 / 8 / 22 / 4 by class): 64 total lanes with MORE headroom on
    # the hot one-axis class than a uniform 96/4 split
    model = io_mj.put_model(mj_model, dtype=dtype,
                            con_sel={1: 8, 3: 20},
                            ccd_class_budgets={(False, False): 16,
                                               (False, True): 12,
                                               (True, False): 28,
                                               (True, True): 8},
                            contact_solver="fused", fused_sel=(24, 40),
                            col_refresh=10)
    walker = FlyWalker(model, amap)
    task = WalkOnBall(walker, time_limit=time_limit)
    return FlyEnv(model, task, mj_model=mj_model, dtype=dtype)
