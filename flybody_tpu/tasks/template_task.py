"""No-op walking task for testing/experimentation
(reference vnl_ray/tasks/template_task.py)."""

from __future__ import annotations

import jax.numpy as jnp
import mujoco
import numpy as np

from flybody_tpu.envs.core import FlyEnv, Task
from flybody_tpu.envs.walker import FlyWalker
from flybody_tpu.models import fruitfly as ff
from flybody_tpu.physics.types import Data, Model
from flybody_tpu.tasks import constants as C


def floor_arena(size=(50.0, 50.0), friction=0.5,
                solref=(0.001, 1.0), solimp=(0.95, 0.99, 0.01)):
    """Flat floor arena with the reference Walking contact params
    (reference tasks/base.py:354-358)."""
    def fn(spec: mujoco.MjSpec):
        spec.worldbody.add_geom(
            name="floor", type=mujoco.mjtGeom.mjGEOM_PLANE,
            size=[size[0], size[1], 0.1],
            friction=[friction, 0.005, 0.0001],
            solref=list(solref), solimp=list(solimp) + [0.5, 2.0],
            condim=3)
    return fn


class TemplateTask(Task):
    """Constant-reward walking task with optional action corruptor."""

    ctrl_dt = C.WALK_CONTROL_TIMESTEP
    phys_dt = C.WALK_PHYSICS_TIMESTEP

    def __init__(self, walker: FlyWalker, time_limit: float = 1.0,
                 action_corruptor=None):
        self.walker = walker
        self.time_limit = time_limit
        self.action_size = walker.action_size
        self.action_corruptor = action_corruptor

    def action_bounds(self, model: Model):
        return self.walker.action_bounds(model)

    def init_state(self, model: Model, data: Data, rng):
        # spawn above the floor (reference _SPAWN_POS, fruitfly.py:23)
        qpos = data.qpos
        free_adr = int(np.asarray(model.jnt_qposadr)[0])
        qpos = qpos.at[free_adr + 2].add(0.1278)
        return data.replace(qpos=qpos), ()

    def before_step(self, model, data, task_state, action):
        if self.action_corruptor is not None:
            action = self.action_corruptor(action)
        return self.walker.apply_action(data, action), task_state

    def observations(self, model, data, task_state, sensor_mean):
        obs = self.walker.observables(model, data, sensor_mean)
        obs["appendages_pos"] = self.walker.appendages_pos(data)
        obs.update(self.walker.force_touch_obs(sensor_mean))
        return obs

    def reward_term_discount(self, model, data, task_state, sensor_mean):
        reward = jnp.asarray(1.0, data.qpos.dtype)
        qacc = jnp.linalg.norm(data.qacc)
        terminated = (qacc > C.TERMINAL_QACC) | jnp.any(jnp.isnan(data.qpos))
        return reward, terminated, jnp.where(terminated, 0.0, 1.0)


def make_template_task(time_limit: float = 1.0, action_corruptor=None,
                       dtype=jnp.float32) -> FlyEnv:
    cfg = ff.FlyConfig(use_legs=True, use_wings=False, root_joint="free",
                       physics_timestep=C.WALK_PHYSICS_TIMESTEP,
                       control_timestep=C.WALK_CONTROL_TIMESTEP)
    morph = ff.apply_surgery(ff.load_morphology(), cfg)
    spec = ff.to_spec(morph, cfg, arena_fn=floor_arena())
    mj_model = spec.compile()
    amap = ff.action_indices(morph, cfg)
    from flybody_tpu.physics import io_mj
    model = io_mj.put_model(mj_model, dtype=dtype)
    walker = FlyWalker(model, amap)
    task = TemplateTask(walker, time_limit=time_limit,
                        action_corruptor=action_corruptor)
    return FlyEnv(model, task, mj_model=mj_model, dtype=dtype)
