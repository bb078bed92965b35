"""Functional environment core: batched, jittable fly RL environments.

Re-design of the reference env stack (dm_control composer.Environment +
task hooks, SURVEY.md §3.1-3.2) as a pure state machine:

    env = FlyEnv(task)
    state = env.reset(rng)                     # pure
    state = env.step(state, action)            # pure: substeps + obs/reward

* Batched execution is `jax.vmap(env.step)`; auto-reset is a masked
  in-graph state swap (no per-episode recompilation — SURVEY.md §7).
* Observations are a flat dict of arrays; sensor observables are averaged
  over the control step's substeps, matching the reference's buffered
  observables (reference vnl_ray/fruitfly/fruitfly.py:573-620).
* Episode bookkeeping (step index, discount, termination reason) lives in
  the state pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

from flybody_tpu.physics import forward as F
from flybody_tpu.physics import io_mj
from flybody_tpu.physics.types import Data, Model, pytree


@pytree(meta=())
class EnvState:
    data: Data
    obs: Any              # dict[str, Array]
    reward: jax.Array
    done: jax.Array       # bool
    discount: jax.Array
    step_idx: jax.Array   # int32 control steps since episode start
    rng: jax.Array
    task_state: Any       # task-specific pytree (reference snippets, etc.)
    metrics: Any          # dict of per-step diagnostics


class Task:
    """Task protocol. Subclasses provide pure functions over (model, data).

    This replaces the reference composer.Task hook set
    (initialize_episode / before_step / get_reward / check_termination,
    reference vnl_ray/tasks/base.py) with a functional interface.
    """

    # control timestep / physics timestep
    ctrl_dt: float = 2e-3
    phys_dt: float = 2e-4
    time_limit: float = 1.0

    def init_state(self, model: Model, data: Data, rng) -> tuple[Data, Any]:
        """Set episode-initial qpos/qvel and task state."""
        return data, ()

    def before_step(self, model: Model, data: Data, task_state,
                    action) -> tuple[Data, Any]:
        """Map env action -> ctrl (and mutate ghost/task data)."""
        return data.replace(ctrl=action), task_state

    def after_substeps(self, model: Model, data: Data, task_state):
        return data, task_state

    def observations(self, model: Model, data: Data, task_state,
                     sensor_mean) -> dict:
        raise NotImplementedError

    def reward_term_discount(self, model: Model, data: Data, task_state,
                             sensor_mean):
        """-> (reward, terminated(bool), discount)."""
        raise NotImplementedError


class FlyEnv:
    """Pure functional environment wrapping the physics engine + a Task."""

    def __init__(self, model: Model, task: Task, mj_model=None,
                 dtype=jnp.float32):
        self.model = model
        # override timestep from the task
        self.model.opt.timestep = jnp.asarray(task.phys_dt, dtype=dtype)
        self.mj_model = mj_model  # kept for host-side rendering only
        self.task = task
        self.n_substeps = int(round(task.ctrl_dt / task.phys_dt))
        self.episode_steps = int(round(task.time_limit / task.ctrl_dt))
        self.dtype = dtype

    # -- specs ------------------------------------------------------------
    @property
    def action_size(self) -> int:
        return getattr(self.task, "action_size", self.model.nu)

    def action_spec(self):
        lo, hi = self.task.action_bounds(self.model)
        return np.asarray(lo), np.asarray(hi)

    # -- pure API ----------------------------------------------------------
    def reset(self, rng: jax.Array) -> EnvState:
        data = io_mj.make_data(self.model, dtype=self.dtype)
        rng, key = jax.random.split(rng)
        data, task_state = self.task.init_state(self.model, data, key)
        data = F.fwd_position(self.model, data)
        data = F.fwd_velocity(self.model, data)
        sensor0 = data.sensordata[None]
        obs = self.task.observations(self.model, data, task_state,
                                     jnp.mean(sensor0, axis=0))
        zero = jnp.asarray(0.0, self.dtype)
        return EnvState(
            data=data, obs=obs, reward=zero,
            done=jnp.asarray(False),
            discount=jnp.asarray(1.0, self.dtype),
            step_idx=jnp.asarray(0, jnp.int32), rng=rng,
            task_state=task_state,
            metrics={"episode_return": zero})

    def step(self, state: EnvState, action: jax.Array) -> EnvState:
        model, task = self.model, self.task
        data, task_state = task.before_step(model, state.data,
                                            state.task_state, action)

        def substep(d, _):
            d = F.step(model, d)
            return d, d.sensordata

        data, sensor_hist = jax.lax.scan(substep, data, None,
                                         length=self.n_substeps)
        sensor_mean = jnp.mean(sensor_hist, axis=0)
        data, task_state = task.after_substeps(model, data, task_state)

        obs = task.observations(model, data, task_state, sensor_mean)
        reward, terminated, discount = task.reward_term_discount(
            model, data, task_state, sensor_mean)
        step_idx = state.step_idx + 1
        truncated = step_idx >= self.episode_steps
        done = jnp.logical_or(terminated, truncated)
        return EnvState(
            data=data, obs=obs,
            reward=jnp.asarray(reward, self.dtype),
            done=done,
            discount=jnp.asarray(discount, self.dtype),
            step_idx=step_idx, rng=state.rng, task_state=task_state,
            metrics={"episode_return":
                     state.metrics["episode_return"] + reward})

    def autoreset_step(self, state: EnvState, action) -> EnvState:
        """step() with in-graph episode auto-reset on done (for batched
        lockstep rollouts; reference analog: acme EnvironmentLoop restart)."""
        state = self.step(state, action)
        rng, key = jax.random.split(state.rng)
        fresh = self.reset(key)
        fresh = dataclasses.replace(fresh, rng=rng)
        # scalar done broadcasts against every leaf
        reset_state = jax.tree.map(
            lambda new, old: jnp.where(state.done, new, old), fresh, state)
        # keep reward/done/discount of the terminal step visible
        return dataclasses.replace(
            reset_state, reward=state.reward, done=state.done,
            discount=state.discount)
