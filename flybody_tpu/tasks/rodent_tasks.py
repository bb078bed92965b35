"""Rodent RL task suite: escape bowl, gaps corridor, maze forage, two-touch.

Functional re-design of the reference's obs-normalized rodent tasks
(reference vnl_ray/tasks/rodent_tasks_modified.py:42-459 — EscapeSameObs,
RunThroughCorridorSameObs, ManyGoalsMazeSameObs, TwoTouchSamObs — over the
dm_control task semantics they subclass). Every stateful mechanism of the
reference (reward-stale timers, two-touch state machine, target
activation flags) becomes pure per-env DATA in the task state; per-step
reward channels are recorded into the env metrics (the reference's
``last_reward_channels``).

All tasks add the reference's obs-normalization extras: a constant
``task_logic`` observation and an ``origin`` observation (world origin in
the torso frame) so specialist policies share one observation signature
(reference rodent_tasks_modified.py:31-39 dummy_task_logic/dummy_origin).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from flybody_tpu.envs.core import Task
from flybody_tpu.envs.rodent_walker import RodentWalker
from flybody_tpu.physics.types import Data, Model
from flybody_tpu.utils import rewards as rw

_UPRIGHT_COS = float(np.cos(np.deg2rad(30.0)))


def _upright_reward(walker: RodentWalker, data: Data):
    """Linear tolerance on min(torso, pelvis) z-axis cosine, 1 within 30
    degrees of vertical, 0 upside down (dm_control escape._upright_reward)."""
    return rw.tolerance(walker.upright_zz(data),
                        bounds=(_UPRIGHT_COS, float("inf")),
                        margin=1 + _UPRIGHT_COS, sigmoid="linear",
                        value_at_margin=0.0)


def _yaw_quat(rng, dtype):
    yaw = jax.random.uniform(rng, (), minval=0.0, maxval=2 * np.pi)
    return jnp.array([jnp.cos(yaw / 2), 0.0, 0.0, jnp.sin(yaw / 2)],
                     dtype=dtype)


class RodentTaskBase(Task):
    ctrl_dt = 0.02
    phys_dt = 0.001

    def __init__(self, walker: RodentWalker, time_limit: float,
                 use_vision: bool = False, camera_size: int = 32):
        self.walker = walker
        self.time_limit = time_limit
        self.action_size = walker.action_size
        self.use_vision = use_vision
        self.camera_size = camera_size
        if use_vision:
            from flybody_tpu.ops import raycast
            model = walker.model
            # head-mounted forward camera (the reference rodent tasks'
            # walker/egocentric_camera; dm_control rodent.py) rendered by
            # the on-device raycaster over hfield + primitive geoms
            self._cam_rays = raycast.camera_rays(90.0, camera_size,
                                                 camera_size)
            gt = np.asarray(model.geom_type)
            gs = np.asarray(model.geom_size)
            gb = np.asarray(model.geom_bodyid)
            # exclude head-body geoms (the camera sits inside the skull)
            # and keep the largest remaining primitives to bound cost
            prim = np.nonzero((gt != 0) & (gt != 1)
                              & (gb != walker.head_body_id))[0]
            if len(prim):
                order = np.argsort(-gs[prim].max(axis=-1))
                prim = prim[order[:16]]
            self._scene_cast, self._has_scene = \
                raycast.make_scene_raycaster(model, prim)
            self._height_fn = None
            if model.nhfield:
                gt = np.asarray(model.geom_type)
                hgeom = int(np.nonzero(gt == 1)[0][0])   # GEOM_HFIELD
                hpos = np.asarray(model.geom_pos)[hgeom]
                self._height_fn = raycast.hfield_height_fn(
                    model.hfield_data[0], model.hfield_size[0],
                    jnp.asarray(hpos))
            # camera frame in the head frame: -z (view dir) -> +x head,
            # +y (up) -> +z head
            self._cam_fix = np.array([[0.0, 0.0, -1.0],
                                      [-1.0, 0.0, 0.0],
                                      [0.0, 1.0, 0.0]])

    def _vision_obs(self, model: Model, data: Data) -> dict:
        if not self.use_vision:
            return {}
        from flybody_tpu.ops import raycast
        head = self.walker.head_body_id
        dtype = data.qpos.dtype
        # slightly ahead of the skull along the head +x (snout) axis
        cam_pos = data.xpos[head] + data.xmat[head] @ jnp.asarray(
            [0.035, 0.0, 0.0], dtype)
        cam_mat = data.xmat[head] @ jnp.asarray(self._cam_fix, dtype)
        img = raycast.render_eye(
            cam_pos, cam_mat, self._cam_rays, self._height_fn,
            max_dist=4.0,
            scene_cast=self._scene_cast if self._has_scene else None,
            geom_xpos=data.geom_xpos, geom_xmat=data.geom_xmat)
        return {"egocentric_camera": img}

    def action_bounds(self, model: Model):
        return self.walker.action_bounds(model)

    def before_step(self, model: Model, data: Data, ts, action):
        return self.walker.apply_action(data, action), ts

    def _spawn(self, data: Data, rng, xy=(0.0, 0.0), random_yaw=True,
               z=None):
        """Place the root at xy with a random yaw (the in-graph analog of
        the reference's respawn + z-lift; the build-time spawn height is
        collision-free by construction)."""
        adr = self.walker.root_qposadr
        qpos = data.qpos
        pos = qpos[adr:adr + 3]
        xy = jnp.asarray(xy, qpos.dtype)
        pos = jnp.concatenate([xy, pos[2:3] if z is None
                               else jnp.asarray([z], qpos.dtype)])
        qpos = jax.lax.dynamic_update_slice(qpos, pos, (adr,))
        if random_yaw:
            quat = _yaw_quat(rng, qpos.dtype)
            qpos = jax.lax.dynamic_update_slice(qpos, quat, (adr + 3,))
        return data.replace(qpos=qpos)

    def _base_obs(self, model, data, sensor_mean):
        obs = self.walker.observables(model, data, sensor_mean)
        obs["origin"] = self.walker.origin_obs(data)
        obs["task_logic"] = jnp.zeros((1,), data.qpos.dtype)
        obs.update(self._vision_obs(model, data))
        return obs

    def _fatal(self, data: Data):
        return (jnp.linalg.norm(data.qacc) > 1e14) \
            | jnp.any(jnp.isnan(data.qpos))


class EscapeBowl(RodentTaskBase):
    """Escape a bowl-shaped terrain (reference EscapeSameObs,
    rodent_tasks_modified.py:42-158).

    reward = upright * (escape/2 + vel/2/6) + aliveness + escape_vel,
    with a reward-staleness failure timer (300 stale control steps)."""

    time_limit = 20.0

    def __init__(self, walker: RodentWalker, terrain_size: float = 20.0,
                 target_velocity: float = 2.0, aliveness_reward: float = 0.1,
                 reward_termination: bool = True,
                 reward_threshold: float = 0.1, reward_margin: float = 0.01,
                 reward_stale_timestep: int = 300, time_limit: float = 20.0,
                 **base_kwargs):
        super().__init__(walker, time_limit, **base_kwargs)
        self.terrain_size = terrain_size
        self.vel = target_velocity
        self.aliveness_reward = aliveness_reward
        self.reward_termination = reward_termination
        self.reward_threshold = reward_threshold
        self.reward_margin = reward_margin
        self.reward_stale = reward_stale_timestep

    def init_state(self, model: Model, data: Data, rng):
        data = self._spawn(data, rng, xy=(0.0, 0.0))
        z = data.qpos.dtype
        ts = dict(prev_escape=jnp.zeros((), z),
                  prev_reward=jnp.zeros((), z),
                  timer=jnp.asarray(-1, jnp.int32))
        return data, ts

    def observations(self, model, data, ts, sensor_mean):
        return self._base_obs(model, data, sensor_mean)

    def reward_step(self, model, data, ts, sensor_mean):
        ts = dict(ts)
        w = self.walker
        escape = rw.tolerance(jnp.linalg.norm(w.head_pos(data)),
                              bounds=(self.terrain_size, float("inf")),
                              margin=self.terrain_size,
                              value_at_margin=0.0, sigmoid="linear")
        upright = _upright_reward(w, data)
        v = w.subtree_linvel(sensor_mean)
        vel = rw.tolerance(jnp.sqrt(v[0] ** 2 + v[1] ** 2),
                           bounds=(self.vel, self.vel), margin=self.vel,
                           sigmoid="linear", value_at_margin=0.0)
        escape_vel = (escape - ts["prev_escape"]) / self.ctrl_dt / 5.0
        reward = (upright * (escape / 2 + vel / 2 / 6)
                  + self.aliveness_reward + escape_vel)
        stale = (reward < self.reward_threshold) | (
            jnp.abs(reward - ts["prev_reward"]) < self.reward_margin)
        timer = jnp.where(stale, ts["timer"] + 1, 0)
        ts["prev_escape"] = escape
        ts["prev_reward"] = reward
        ts["timer"] = timer
        terminated = ((timer >= self.reward_stale)
                      if self.reward_termination else jnp.zeros((), bool))
        terminated = terminated | self._fatal(data)
        # reference Escape get_discount == 1 even on failure termination
        return reward, terminated, jnp.ones((), data.qpos.dtype), ts


class RunThroughCorridor(RodentTaskBase):
    """Run down a gapped corridor at a target velocity (reference
    RunThroughCorridorSameObs, rodent_tasks_modified.py:161-266).

    reward = tolerance(xvel; target, linear) * upright; termination when a
    torso/pelvis/cervical geom touches the ground or the feet fall below
    ``terminate_at_height``."""

    time_limit = 30.0

    def __init__(self, walker: RodentWalker, spawn_position=(5.0, 0.0),
                 target_velocity: float = 1.0,
                 contact_termination: bool = True,
                 terminate_at_height: float = -0.3,
                 reward_termination: bool = False,
                 reward_threshold: float = 0.5,
                 reward_stale_timestep: int = 150,
                 time_limit: float = 30.0, **base_kwargs):
        super().__init__(walker, time_limit, **base_kwargs)
        self.spawn_position = spawn_position
        self.vel = target_velocity
        self.contact_termination = contact_termination
        self.terminate_at_height = terminate_at_height
        self.reward_termination = reward_termination
        self.reward_threshold = reward_threshold
        self.reward_stale = reward_stale_timestep

    def init_state(self, model: Model, data: Data, rng):
        # reference walker_spawn_rotation=0: face +x, no yaw randomization
        data = self._spawn(data, rng, xy=self.spawn_position,
                           random_yaw=False)
        ts = dict(timer=jnp.asarray(-1, jnp.int32))
        return data, ts

    def observations(self, model, data, ts, sensor_mean):
        return self._base_obs(model, data, sensor_mean)

    def reward_step(self, model, data, ts, sensor_mean):
        ts = dict(ts)
        w = self.walker
        xvel = w.subtree_linvel(sensor_mean)[0]
        xterm = rw.tolerance(xvel, bounds=(self.vel, self.vel),
                             margin=self.vel, sigmoid="linear",
                             value_at_margin=0.0)
        upright = _upright_reward(w, data)
        reward = xterm * upright
        fail = self._fatal(data)
        if self.contact_termination and len(w.nonfoot_geoms):
            fail = fail | (w.contact_flag(model, data, w.nonfoot_geoms,
                                          w.ground_geoms) > 0)
        if self.terminate_at_height is not None:
            # dm_control checks the end-effector BODY heights
            if len(getattr(w, "end_effector_bodies", ())):
                feet_z = data.xpos[w.end_effector_bodies][:, 2]
            else:
                feet_z = data.site_xpos[w.end_effector_sites][:, 2]
            fail = fail | jnp.any(feet_z < self.terminate_at_height)
        timer = jnp.where(reward < self.reward_threshold, ts["timer"] + 1, 0)
        ts["timer"] = timer
        if self.reward_termination:
            fail = fail | (timer >= self.reward_stale)
        discount = jnp.where(fail, 0.0, 1.0).astype(data.qpos.dtype)
        return reward, fail, discount, ts


class ManyGoalsMaze(RodentTaskBase):
    """Collect all targets in a maze (reference ManyGoalsMazeSameObs,
    rodent_tasks_modified.py:275-372).

    reward = aliveness + target_reward_scale per newly reached target;
    when every target is collected the flags reset (dm_control respawn).
    Failure when aliveness < threshold (discount 0) or the reward goes
    stale for 300 control steps."""

    time_limit = 30.0

    def __init__(self, walker: RodentWalker, spawn_positions,
                 target_positions, target_reward_scale: float = 50.0,
                 target_radius: float = 0.05,
                 target_height: float = 0.125,
                 aliveness_reward: float = 0.1,
                 aliveness_threshold: float = -0.5,
                 reward_termination: bool = True,
                 reward_threshold: float = 0.0,
                 reward_margin: float = 0.01,
                 reward_stale_timestep: int = 300,
                 time_limit: float = 30.0, **base_kwargs):
        super().__init__(walker, time_limit, **base_kwargs)
        self.spawn_positions = np.asarray(spawn_positions, np.float32)
        self.target_positions = np.asarray(target_positions, np.float32)
        self.target_reward_scale = target_reward_scale
        self.target_radius = target_radius
        self.target_height = target_height
        self.aliveness_reward = aliveness_reward
        self.aliveness_threshold = aliveness_threshold
        self.reward_termination = reward_termination
        self.reward_threshold = reward_threshold
        self.reward_margin = reward_margin
        self.reward_stale = reward_stale_timestep

    def init_state(self, model: Model, data: Data, rng):
        ks, ky = jax.random.split(rng)
        i = jax.random.randint(ks, (), 0, len(self.spawn_positions))
        xy = jnp.asarray(self.spawn_positions)[i]
        data = self._spawn(data, ky, xy=xy)
        G = len(self.target_positions)
        ts = dict(rewarded=jnp.zeros((G,), bool),
                  prev_reward=jnp.zeros((), data.qpos.dtype),
                  timer=jnp.asarray(-1, jnp.int32))
        return data, ts

    def observations(self, model, data, ts, sensor_mean):
        return self._base_obs(model, data, sensor_mean)

    def reward_step(self, model, data, ts, sensor_mean):
        ts = dict(ts)
        w = self.walker
        head = w.head_pos(data)
        tpos = jnp.asarray(self.target_positions, head.dtype)
        tz = jnp.full((len(self.target_positions), 1), self.target_height,
                      head.dtype)
        centers = jnp.concatenate([tpos, tz], axis=-1)
        near = jnp.linalg.norm(centers - head, axis=-1) \
            < (self.target_radius + 0.06)
        fresh = near & ~ts["rewarded"]
        reward = (self.aliveness_reward
                  + self.target_reward_scale * jnp.sum(fresh))
        rewarded = ts["rewarded"] | near
        # all collected -> targets respawn (flags reset)
        rewarded = jnp.where(jnp.all(rewarded), jnp.zeros_like(rewarded),
                             rewarded)
        stale = (reward < self.reward_threshold) | (
            jnp.abs(reward - ts["prev_reward"]) < self.reward_margin)
        timer = jnp.where(stale, ts["timer"] + 1, 0)
        ts["rewarded"] = rewarded
        ts["prev_reward"] = reward
        ts["timer"] = timer
        dead = w.aliveness(data) < self.aliveness_threshold
        fail = dead | self._fatal(data)
        terminated = fail
        if self.reward_termination:
            terminated = terminated | (timer >= self.reward_stale)
        discount = jnp.where(dead, 0.0, 1.0).astype(data.qpos.dtype)
        return reward, terminated, discount, ts


# Two-touch state machine codes (dm_control reach.TwoTouchState)
PRE_TOUCH, TOUCHED_ONCE, TOUCHED_TWICE, TOUCHED_TOO_SOON, NO_SECOND_TOUCH \
    = 0, 1, 2, 3, 4


class TwoTouch(RodentTaskBase):
    """Tap an orb, wait ``touch_interval``, tap it again (reference
    TwoTouchSamObs, rodent_tasks_modified.py:375-459 over
    dm_control reach.TwoTouch).

    Pure state machine in the task state: state_logic, touch times, and
    per-phase timers; touches are rising edges of hand-orb proximity."""

    time_limit = 30.0

    def __init__(self, walker: RodentWalker, target_area=(1.5, 1.5),
                 target_type_reward: float = 25.0,
                 z_height: float = 0.14, target_radius: float = 0.025,
                 touch_interval: float = 0.8,
                 interval_tolerance: float = 0.1,
                 failure_timeout: float = 1.2, reset_delay: float = 0.0,
                 aliveness_reward: float = 0.1,
                 reward_termination: bool = True,
                 reward_threshold: float = 1.0,
                 reward_stale_timestep: int = 300,
                 time_limit: float = 30.0, **base_kwargs):
        super().__init__(walker, time_limit, **base_kwargs)
        self.target_area = target_area
        self.target_reward = target_type_reward
        self.z_height = z_height
        self.target_radius = target_radius
        self.touch_interval = touch_interval
        self.interval_tolerance = interval_tolerance
        self.failure_timeout = failure_timeout
        self.reset_delay = reset_delay
        self.aliveness_reward = aliveness_reward
        self.reward_termination = reward_termination
        self.reward_threshold = reward_threshold
        self.reward_stale = reward_stale_timestep

    def _sample_target(self, rng, dtype):
        u = jax.random.uniform(rng, (2,), minval=-1.0, maxval=1.0)
        xy = u * jnp.asarray(self.target_area, u.dtype)
        return jnp.concatenate([xy, jnp.asarray([self.z_height], u.dtype)]
                               ).astype(dtype)

    def init_state(self, model: Model, data: Data, rng):
        kt, ky = jax.random.split(rng)
        data = self._spawn(data, ky, xy=(0.0, 0.0))
        z = data.qpos.dtype
        ts = dict(target=self._sample_target(kt, z),
                  state=jnp.asarray(PRE_TOUCH, jnp.int32),
                  first_t=jnp.zeros((), z), second_t=jnp.zeros((), z),
                  touching_prev=jnp.zeros((), bool),
                  do_time_out=jnp.zeros((), bool),
                  rng=jax.random.split(rng)[0],
                  timer=jnp.asarray(-1, jnp.int32))
        return data, ts

    def observations(self, model, data, ts, sensor_mean):
        obs = self._base_obs(model, data, sensor_mean)
        obs["task_logic"] = ts["state"].astype(data.qpos.dtype)[None]
        # egocentric target position (stands in for the orb pixels of the
        # reference's egocentric camera)
        from flybody_tpu.math import quaternions as mq
        w = self.walker
        rel = ts["target"] - data.xpos[w.root_body_id]
        obs["target_pos"] = mq.rotate_vec_with_quat(
            rel, mq.conj_quat(data.xquat[w.root_body_id]))
        return obs

    def reward_step(self, model, data, ts, sensor_mean):
        ts = dict(ts)
        w = self.walker
        z = data.qpos.dtype
        t = data.time
        lhand = data.xpos[w.lhand_body]
        rhand = data.xpos[w.rhand_body]
        target = ts["target"]
        lrew = jnp.exp(-3.0 * jnp.sum(jnp.abs(lhand - target)))
        rrew = jnp.exp(-3.0 * jnp.sum(jnp.abs(rhand - target)))
        closeness = jnp.maximum(lrew, rrew)
        reward = self.aliveness_reward \
            + 0.01 * closeness * self.target_reward

        touch_d = jnp.minimum(jnp.linalg.norm(lhand - target),
                              jnp.linalg.norm(rhand - target))
        touching = touch_d < (self.target_radius + 0.015)
        touch_event = touching & ~ts["touching_prev"]

        state = ts["state"]
        # PRE_TOUCH -> TOUCHED_ONCE on first touch (+reward)
        first = (state == PRE_TOUCH) & touch_event
        reward = reward + jnp.where(first, self.target_reward, 0.0)
        first_t = jnp.where(first, t, ts["first_t"])
        state = jnp.where(first, TOUCHED_ONCE, state)

        # TOUCHED_ONCE: second touch or timeout
        second = (state == TOUCHED_ONCE) & touch_event & ~first
        dt2 = t - first_t
        too_soon = dt2 < (self.touch_interval - self.interval_tolerance)
        in_time = dt2 <= (self.touch_interval + self.interval_tolerance)
        reward = reward + jnp.where(second & ~too_soon & in_time,
                                    self.target_reward, 0.0)
        second_t = jnp.where(second, t, ts["second_t"])
        state = jnp.where(second,
                          jnp.where(too_soon, TOUCHED_TOO_SOON,
                                    TOUCHED_TWICE), state)
        do_time_out = ts["do_time_out"] | (second & too_soon)
        # no second touch within the window
        late = (state == TOUCHED_ONCE) & ~second & (
            (t - first_t) > (self.touch_interval + self.interval_tolerance))
        state = jnp.where(late, NO_SECOND_TOUCH, state)
        second_t = jnp.where(late, t, second_t)
        do_time_out = do_time_out | late

        # terminal phases: wait out the timeout, then re-randomize target
        in_final = (state == TOUCHED_TWICE) | (state == TOUCHED_TOO_SOON) \
            | (state == NO_SECOND_TOUCH)
        timeout_over = do_time_out & (t > second_t + self.failure_timeout)
        do_time_out = do_time_out & ~timeout_over
        respawn = in_final & ~do_time_out & (
            t > second_t + self.reset_delay) & ~timeout_over
        k1, k2 = jax.random.split(ts["rng"])
        new_target = self._sample_target(k1, z)
        target = jnp.where(respawn, new_target, target)
        state = jnp.where(respawn, PRE_TOUCH, state)

        stale = reward < self.reward_threshold
        timer = jnp.where(stale, ts["timer"] + 1, 0)
        ts.update(target=target, state=state, first_t=first_t,
                  second_t=second_t, touching_prev=touching,
                  do_time_out=do_time_out, rng=k2, timer=timer)
        terminated = self._fatal(data)
        if self.reward_termination:
            terminated = terminated | (timer >= self.reward_stale)
        return reward, terminated, jnp.ones((), z), ts
