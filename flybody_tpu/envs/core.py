"""Functional environment core: natively batched, jittable RL environments.

Re-design of the reference env stack (dm_control composer.Environment +
task hooks, SURVEY.md §3.1-3.2) as a pure state machine over a BATCH of
envs:

    env = FlyEnv(model, task)
    states = env.reset(keys)                   # keys (B, 2) -> batched state
    states = env.step(states, actions)         # actions (B, act_dim)

* The physics substep loop runs on the batch-native engine (trailing env
  axis, physics/types.py) with no vmap — this is the hot path.
* Task hooks (init_state / before_step / observations / rewards) are
  written in the familiar per-env style and wrapped here with
  ``jax.vmap(..., in_axes=-1)``, which presents single-env views of the
  batched Data. Observations come out batch-leading (B, dim) for the
  agent stack.
* Auto-reset is a masked in-graph swap of the TRUE STATE ONLY
  (types.STATE_FIELDS) — derived quantities are recomputed by the next
  step, so the swap does not touch the large derived buffers.
* Episode bookkeeping (step index, discount, termination reason) lives in
  the state pytree.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from flybody_tpu.physics import forward as F
from flybody_tpu.physics import io_mj
from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Data, Model, pytree


@pytree(meta=())
class EnvState:
    data: Data            # batch-native (trailing B)
    obs: Any              # dict[str, (B, ...)]
    reward: jax.Array     # (B,)
    done: jax.Array       # (B,) bool
    discount: jax.Array   # (B,)
    step_idx: jax.Array   # (B,) int32 control steps since episode start
    rng: jax.Array        # (B, 2)
    task_state: Any       # task-specific pytree, trailing B
    metrics: Any          # dict of per-step diagnostics, (B,)


class Task:
    """Task protocol. Subclasses provide pure PER-ENV functions over
    (model, per-env data views); the env wraps them with vmap.

    This replaces the reference composer.Task hook set
    (initialize_episode / before_step / get_reward / check_termination,
    reference vnl_ray/tasks/base.py) with a functional interface.
    """

    ctrl_dt: float = 2e-3
    phys_dt: float = 2e-4
    time_limit: float = 1.0

    # True when init_state ignores rng: lets auto-reset broadcast one
    # fresh state instead of recomputing a full batched reset every step.
    deterministic_init: bool = False

    def init_state(self, model: Model, data: Data, rng) -> tuple[Data, Any]:
        """Set episode-initial qpos/qvel and task state (per env)."""
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

    def reward_step(self, model: Model, data: Data, task_state,
                    sensor_mean):
        """-> (reward, terminated, discount, new_task_state). Override for
        reward mechanisms that carry state (stale-reward timers, touch
        state machines — reference rodent_tasks_modified.py); the default
        delegates to the stateless reward_term_discount."""
        r, t, d = self.reward_term_discount(model, data, task_state,
                                            sensor_mean)
        return r, t, d, task_state

    def reward_factors(self, model: Model, data: Data, task_state,
                       sensor_mean) -> dict:
        """Named per-step reward channels for the evaluator's reward-
        decomposition plots (reference utils.py render_with_rewards /
        last_reward_channels). Default: the scalar reward."""
        r, _, _ = self.reward_term_discount(model, data, task_state,
                                            sensor_mean)
        return {"reward": r}


class FlyEnv:
    """Pure functional batched environment: physics engine + a Task."""

    def __init__(self, model: Model, task: Task, mj_model=None,
                 dtype=jnp.float32):
        self.model = model
        self.model.opt.timestep = jnp.asarray(task.phys_dt, dtype=dtype)
        self.mj_model = mj_model  # kept for host-side rendering only
        self.task = task
        self.n_substeps = int(round(task.ctrl_dt / task.phys_dt))
        self.episode_steps = int(round(task.time_limit / task.ctrl_dt))
        self.dtype = dtype
        r = int(getattr(model, "col_refresh", 1) or 1)
        if r > 1 and self.n_substeps % r != 0:
            raise ValueError(
                f"col_refresh={r} must divide substeps-per-control-step "
                f"({self.n_substeps}) so auto-reset lands on a selection "
                "refresh")

    # -- specs ------------------------------------------------------------
    @property
    def action_size(self) -> int:
        return getattr(self.task, "action_size", self.model.nu)

    def action_spec(self):
        lo, hi = self.task.action_bounds(self.model)
        return np.asarray(lo), np.asarray(hi)

    # -- pure API ----------------------------------------------------------
    def reset(self, rng: jax.Array) -> EnvState:
        """rng: (B, 2) batched PRNG keys -> batched EnvState."""
        B = rng.shape[0]
        data = io_mj.make_data(self.model, B=B, dtype=self.dtype)
        keys = jax.vmap(jax.random.split)(rng)      # (B, 2, 2)
        rng_next, init_keys = keys[:, 0], keys[:, 1]
        data, task_state = jax.vmap(
            lambda d, k: self.task.init_state(self.model, d, k),
            in_axes=(-1, 0), out_axes=-1)(data, init_keys)
        data = F.fwd_position(self.model, data)
        data = F.fwd_velocity(self.model, data)
        obs = self._obs(data, task_state, data.sensordata)
        zero = jnp.zeros((B,), self.dtype)
        return EnvState(
            data=data, obs=obs, reward=zero,
            done=jnp.zeros((B,), bool),
            discount=jnp.ones((B,), self.dtype),
            step_idx=jnp.zeros((B,), jnp.int32), rng=rng_next,
            task_state=task_state,
            metrics={"episode_return": zero})

    def _obs(self, data, task_state, sensor_mean):
        return jax.vmap(
            lambda d, ts, sm: self.task.observations(self.model, d, ts, sm),
            in_axes=(-1, -1, -1), out_axes=0)(data, task_state, sensor_mean)

    def step(self, state: EnvState, action: jax.Array) -> EnvState:
        model, task = self.model, self.task
        # NaN-action scrub before physics (reference
        # vnl_ray/tasks/walk_imitation.py:146-147 zeroes NaN actions so a
        # diverged actor cannot poison the physics state).
        action = jnp.where(jnp.isnan(action), 0.0, action)
        data, task_state = jax.vmap(
            lambda d, ts, a: task.before_step(model, d, ts, a),
            in_axes=(-1, -1, 0), out_axes=-1)(
                state.data, state.task_state, action)

        def substep(d, _):
            d = F.step(model, d)
            return d, d.sensordata

        r = int(getattr(model, "col_refresh", 1) or 1)
        if r <= 1:
            data, sensor_hist = jax.lax.scan(substep, data, None,
                                             length=self.n_substeps)
        else:
            # selection-persistent collision schedule: substep 0 of each
            # r-block runs full gated selection, the next r-1 substeps
            # refresh geometry for the same lanes (physics/collision.py
            # collision_update). r divides n_substeps (checked in
            # __init__), so auto-reset always lands on a refresh.
            def substep_cheap(d, _):
                d = F.step(model, d, col_update=True)
                return d, d.sensordata

            def block(d, _):
                d, s0 = substep(d, None)
                d, st = jax.lax.scan(substep_cheap, d, None, length=r - 1)
                return d, jnp.concatenate([s0[None], st], axis=0)

            data, sh = jax.lax.scan(block, data, None,
                                    length=self.n_substeps // r)
            sensor_hist = sh.reshape((-1,) + sh.shape[2:])
        sensor_mean = jnp.mean(sensor_hist, axis=0)
        data, task_state = jax.vmap(
            lambda d, ts: task.after_substeps(model, d, ts),
            in_axes=(-1, -1), out_axes=-1)(data, task_state)

        reward, terminated, discount, task_state = jax.vmap(
            lambda d, ts, sm: task.reward_step(model, d, ts, sm),
            in_axes=(-1, -1, -1), out_axes=(0, 0, 0, -1))(
                data, task_state, sensor_mean)
        # observations see the post-reward task state (composer hook order:
        # after_step -> get_reward -> observation assembly)
        obs = self._obs(data, task_state, sensor_mean)
        # NaN hygiene at the env boundary: a blown-up episode (f32 physics
        # can jump past the qacc guard to NaN within one control step)
        # terminates with discount 0, but its terminal observation still
        # enters n-step windows as the bootstrap obs — the critic would
        # forward NaN regardless of the zero discount. Scrub obs/reward/
        # discount so consumers never see non-finite values (reference
        # hygiene analog: walk_imitation.py:146-147 + base.py:214-217).
        # The magnitude clamp handles huge-but-FINITE terminal readings
        # (accelerometer/force near the qacc=1e14 guard): squaring
        # anything past ~1e19 overflows f32 inside LayerNorm/critic math,
        # so bound terminal garbage to a scale no live physical signal in
        # this CGS model approaches.
        scrub = lambda x: jnp.clip(
            jnp.where(jnp.isfinite(x), x, 0.0), -1e8, 1e8)
        obs = jax.tree_util.tree_map(scrub, obs)
        reward = scrub(reward)
        discount = jnp.clip(
            jnp.where(jnp.isfinite(discount), discount, 0.0), 0.0, 1.0)
        step_idx = state.step_idx + 1
        truncated = step_idx >= self.episode_steps
        done = jnp.logical_or(terminated, truncated)
        reward = jnp.asarray(reward, self.dtype)
        return EnvState(
            data=data, obs=obs,
            reward=reward,
            done=done,
            discount=jnp.asarray(discount, self.dtype),
            step_idx=step_idx, rng=state.rng, task_state=task_state,
            metrics={"episode_return":
                     state.metrics["episode_return"] + reward})

    def autoreset_step(self, state: EnvState, action) -> EnvState:
        """step() + apply_autoreset (batched lockstep rollouts; reference
        analog: acme EnvironmentLoop restart)."""
        return self.apply_autoreset(self.step(state, action))

    def apply_autoreset(self, state: EnvState) -> EnvState:
        """In-graph per-env episode reset on done. Only the true dynamical
        state (types.STATE_FIELDS) is swapped; the terminal step's
        reward/done/discount stay visible.

        Tasks with rng-independent initial states (deterministic_init)
        compute the fresh state at B=1 and broadcast — the full batched
        re-reset (an extra FK+velocity pass per control step) disappears.
        """
        keys = jax.vmap(jax.random.split)(state.rng)
        rng, reset_keys = keys[:, 0], keys[:, 1]
        B = reset_keys.shape[0]
        if getattr(self.task, "deterministic_init", False):
            fresh1 = self.reset(reset_keys[:1])

            def btail(x):
                return jnp.broadcast_to(x, x.shape[:-1] + (B,))

            def blead(x):
                return jnp.broadcast_to(x, (B,) + x.shape[1:])

            fresh = EnvState(
                data=jax.tree_util.tree_map(btail, fresh1.data),
                obs=jax.tree_util.tree_map(blead, fresh1.obs),
                reward=blead(fresh1.reward), done=blead(fresh1.done),
                discount=blead(fresh1.discount),
                step_idx=blead(fresh1.step_idx), rng=rng,
                task_state=jax.tree_util.tree_map(btail, fresh1.task_state),
                metrics=jax.tree_util.tree_map(blead, fresh1.metrics))
        else:
            fresh = self.reset(reset_keys)

        done = state.done                        # (B,)

        def swap_tail(new, old):
            # leaves with trailing batch axis
            return jnp.where(done, new, old)

        def swap_lead(new, old):
            # leaves with leading batch axis (obs, bookkeeping)
            d = done.reshape((-1,) + (1,) * (new.ndim - 1))
            return jnp.where(d, new, old)

        data = state.data
        repl = {f: swap_tail(getattr(fresh.data, f), getattr(data, f))
                for f in T.STATE_FIELDS}
        data = data.replace(**repl)
        task_state = jax.tree_util.tree_map(
            swap_tail, fresh.task_state, state.task_state)
        obs = jax.tree_util.tree_map(swap_lead, fresh.obs, state.obs)
        metrics = jax.tree_util.tree_map(
            swap_lead, fresh.metrics, state.metrics)
        return EnvState(
            data=data, obs=obs,
            reward=state.reward, done=state.done, discount=state.discount,
            step_idx=jnp.where(done, fresh.step_idx, state.step_idx),
            rng=rng, task_state=task_state, metrics=metrics)
