"""Vision-guided flight over procedural terrain.

Functional re-design of the reference task (reference
vnl_ray/tasks/vision_flight.py): WBPG-driven flight over a sine-bumps or
sine-trench heightfield, 32x32 eye observables rendered ON DEVICE by the
JAX raycaster (flybody_tpu/ops/raycast.py — the reference's EGL cameras
can't live in a TPU step), ``task_input`` = (target height, target speed),
reward = product of height / x-speed / speed / side-speed / world-zaxis /
center-of-trench tolerance factors (reference :155-214), fatal floor
contact termination (reference :216-228).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import mujoco

from flybody_tpu.envs.core import FlyEnv, Task
from flybody_tpu.envs.walker import FlyWalker
from flybody_tpu.math import quaternions as mq
from flybody_tpu.models import fruitfly as ff
from flybody_tpu.ops import raycast
from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Data, Model, pytree
from flybody_tpu.tasks import arenas
from flybody_tpu.tasks import constants as C
from flybody_tpu.tasks.pattern_generators import (WBPGState,
                                                  WingBeatPatternGenerator)
from flybody_tpu.utils import rewards as rwu


@pytree(meta=())
class VisionFlightState:
    wbpg: WBPGState
    target_height: jax.Array
    target_speed: jax.Array


class VisionFlightWBPG(Task):
    ctrl_dt = C.FLY_CONTROL_TIMESTEP
    phys_dt = C.FLY_PHYSICS_TIMESTEP

    def __init__(self, walker: FlyWalker, wbpg: WingBeatPatternGenerator,
                 hfield_pos, trench: arenas.TrenchSpecs | None,
                 time_limit: float = 0.4,
                 target_height_range=(0.4, 0.6),
                 target_speed_range=(20.0, 40.0),
                 init_pos_x_range=(-1.0, -0.5),
                 init_pos_y_range=(-0.2, 0.2),
                 eye_size: int = 32):
        self.walker = walker
        self.wbpg = wbpg
        self.time_limit = time_limit
        self.action_size = walker.action_size
        self.target_height_range = target_height_range
        self.target_speed_range = target_speed_range
        self.init_pos_x_range = init_pos_x_range
        self.init_pos_y_range = init_pos_y_range
        self.trench = trench
        model = walker.model
        names = model.names
        self.hfield_pos = np.asarray(hfield_pos, np.float32)
        self.wing_joint_ids = np.array(
            [names["joint"][f"wing_{axis}_{side}"]
             for side in ("left", "right")
             for axis in ("yaw", "roll", "pitch")], np.int32)
        self.wing_qposadr = np.asarray(model.jnt_qposadr)[self.wing_joint_ids]
        self.wing_dofadr = np.asarray(model.jnt_dofadr)[self.wing_joint_ids]
        amap = walker.action_maps
        self.wing_action_idx = np.asarray(amap["action"]["wings"], np.int32)
        self.user_action_idx = int(amap["action"]["user"][0])
        self.root_qposadr = int(np.asarray(model.jnt_qposadr)[0])
        self.eye_ids = [names["camera"].get("eye_left"),
                        names["camera"].get("eye_right")]
        theta = np.deg2rad(C.BODY_PITCH_ANGLE)
        self.target_zaxis = jnp.asarray(
            [np.sin(theta), 0.0, np.cos(theta)], jnp.float32)
        self.rays = raycast.camera_rays(150.0, eye_size, eye_size)
        # primitive geoms the eyes see (SURVEY §7 delta 5: self-occlusion
        # by the fly's own body + any obstacle geoms, not terrain only):
        # the largest non-terrain geoms bound the per-pixel cost.
        gt = np.asarray(model.geom_type)
        gs = np.asarray(model.geom_size)
        prim = np.nonzero((gt != T.GEOM_PLANE) & (gt != T.GEOM_HFIELD))[0]
        if len(prim):
            order = np.argsort(-gs[prim].max(axis=-1))
            prim = prim[order[:16]]
        self.scene_cast, self._has_scene = raycast.make_scene_raycaster(
            model, prim)
        # hover orientation: identity-yaw body pitched at BODY_PITCH_ANGLE
        self.init_quat = np.array(
            [np.cos(-theta / 2), 0.0, np.sin(-theta / 2), 0.0], np.float32)

    def action_bounds(self, model: Model):
        return self.walker.action_bounds(model)

    def _height_fn(self, model: Model):
        return raycast.hfield_height_fn(
            model.hfield_data[0], model.hfield_size[0],
            jnp.asarray(self.hfield_pos))

    def init_state(self, model: Model, data: Data, rng):
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        th = jax.random.uniform(k1, (), minval=self.target_height_range[0],
                                maxval=self.target_height_range[1])
        tv = jax.random.uniform(k2, (), minval=self.target_speed_range[0],
                                maxval=self.target_speed_range[1])
        x0 = jax.random.uniform(k3, (), minval=self.init_pos_x_range[0],
                                maxval=self.init_pos_x_range[1])
        y0 = jax.random.uniform(k4, (), minval=self.init_pos_y_range[0],
                                maxval=self.init_pos_y_range[1])
        z0 = self._height_fn(model)(x0, y0) + th
        angles, wing_qvel, wbpg_state = self.wbpg.reset(
            initial_phase=jax.random.uniform(k5))
        a = self.root_qposadr
        qpos = data.qpos.at[a:a + 3].set(jnp.stack([x0, y0, z0]))
        qpos = qpos.at[a + 3:a + 7].set(jnp.asarray(self.init_quat))
        qpos = qpos.at[self.wing_qposadr].set(angles)
        qvel = data.qvel.at[0].set(tv)
        qvel = qvel.at[self.wing_dofadr].set(wing_qvel)
        ts = VisionFlightState(wbpg=wbpg_state, target_height=th,
                               target_speed=tv)
        return data.replace(qpos=qpos, qvel=qvel), ts

    def before_step(self, model: Model, data: Data, ts, action):
        act = jnp.clip(action[self.user_action_idx], -1.0, 1.0)
        rel_range = float(self.wbpg.beat_freqs[-1]
                          / self.wbpg.base_beat_freq - 1.0)
        target, wbpg_state = self.wbpg.step(
            ts.wbpg, self.wbpg.base_beat_freq * (1.0 + rel_range * act))
        wing_qpos = data.qpos[self.wing_qposadr]
        action = action.at[self.wing_action_idx].add(target - wing_qpos)
        data = self.walker.apply_action(data, action)
        return data, VisionFlightState(wbpg=wbpg_state,
                                       target_height=ts.target_height,
                                       target_speed=ts.target_speed)

    def observations(self, model: Model, data: Data, ts,
                     sensor_mean) -> dict:
        obs = self.walker.observables(model, data, sensor_mean)
        obs["world_zaxis_hover"] = self.walker.world_zaxis_hover(model, data)
        obs["task_input"] = jnp.stack([ts.target_height, ts.target_speed])
        del obs["joints_pos"], obs["joints_vel"]
        obs["joints_pos"] = data.qpos[self.wing_qposadr]
        obs["joints_vel"] = data.qvel[self.wing_dofadr]
        hfn = self._height_fn(model)
        for name, cam in (("left_eye", self.eye_ids[0]),
                          ("right_eye", self.eye_ids[1])):
            if cam is None:
                continue
            # camera world pose from its body (head) frame
            cam_pos, cam_mat = self._camera_pose(model, data, cam)
            obs[name] = raycast.render_eye(
                cam_pos, cam_mat, self.rays, hfn,
                scene_cast=self.scene_cast if self._has_scene else None,
                geom_xpos=data.geom_xpos, geom_xmat=data.geom_xmat)
        return obs

    def _camera_pose(self, model: Model, data: Data, cam_id: int):
        # cameras ride on the head body; Model doesn't carry cam tables as
        # pytree fields, so the walker caches them at build (names dict).
        bodyid, pos, quat = self.walker.model.names["cam_pose"][cam_id]
        base_pos = data.xpos[bodyid]
        base_mat = data.xmat[bodyid]
        world_pos = base_pos + base_mat @ jnp.asarray(pos)
        world_mat = base_mat @ jnp.asarray(mq.quat_to_mat(jnp.asarray(quat)))
        return world_pos, world_mat

    def reward_term_discount(self, model: Model, data: Data, ts,
                             sensor_mean):
        a = self.root_qposadr
        xpos = data.qpos[a:a + 3]
        hfn = self._height_fn(model)
        terrain = hfn(xpos[0], xpos[1])
        height = rwu.tolerance(xpos[2] - terrain,
                               bounds=(ts.target_height, ts.target_height),
                               sigmoid="linear", margin=0.15,
                               value_at_margin=0.0)
        vel_world = data.qvel[:3]
        x_speed = rwu.tolerance(vel_world[0],
                                bounds=(ts.target_speed, jnp.inf),
                                sigmoid="linear",
                                margin=1.1 * ts.target_speed,
                                value_at_margin=0.0)
        speed = rwu.tolerance(jnp.linalg.norm(vel_world),
                              bounds=(ts.target_speed, ts.target_speed),
                              sigmoid="linear",
                              margin=1.1 * ts.target_speed,
                              value_at_margin=0.0)
        vel_ego = self.walker.sensor_obs(sensor_mean, "velocimeter")
        side_speed = rwu.tolerance(vel_ego[1], bounds=(0.0, 0.0),
                                   sigmoid="linear", margin=10.0,
                                   value_at_margin=0.0)
        zaxis = data.xmat[self.walker.thorax_id][2, :]
        angle = jnp.arccos(jnp.clip(
            jnp.dot(self.target_zaxis, zaxis), -1.0, 1.0))
        world_zaxis = rwu.tolerance(angle, bounds=(0.0, 0.0),
                                    sigmoid="linear", margin=jnp.pi,
                                    value_at_margin=0.0)
        center = jnp.asarray(1.0, data.qpos.dtype)
        if self.trench is not None:
            xs = jnp.linspace(self.hfield_pos[0] - 12.0,
                              self.hfield_pos[0] + 12.0,
                              len(self.trench.center_y))
            idx = jnp.argmin(jnp.abs(xs - xpos[0]))
            cy = jnp.asarray(self.trench.center_y)[idx] * 3.0 \
                + self.hfield_pos[1]
            center = rwu.tolerance(xpos[1], bounds=(cy, cy),
                                   sigmoid="linear", margin=0.15,
                                   value_at_margin=0.0)
        reward = height * x_speed * speed * side_speed * world_zaxis * center

        # fatal floor contact: any active contact involving the world body
        floor_hit = jnp.asarray(False)
        if model.ncon_max:
            con = data.contact
            world_slot = (con.b1 == 0) | (con.b2 == 0)
            active = con.dist < con.margin
            floor_hit = jnp.any(active & world_slot)
        qacc = jnp.linalg.norm(data.qacc)
        terminated = (floor_hit
                      | (xpos[2] - terrain < C.TERMINAL_HEIGHT)
                      | (qacc > C.TERMINAL_QACC)
                      | jnp.any(jnp.isnan(data.qpos)))
        return reward, terminated, jnp.where(terminated, 0.0, 1.0)


def make_vision_flight(bumps_or_trench: str = "trench",
                       time_limit: float = 0.4, joint_filter: float = 0.0002,
                       eye_size: int = 32, dtype=jnp.float32) -> FlyEnv:
    """Factory (reference fly_envs.vision_guided_flight:160-206)."""
    wp = C.WING_PARAMS
    cfg = ff.FlyConfig(
        use_legs=False, use_wings=True, joint_filter=joint_filter,
        root_joint="free", body_pitch_angle=C.BODY_PITCH_ANGLE,
        physics_timestep=C.FLY_PHYSICS_TIMESTEP,
        control_timestep=C.FLY_CONTROL_TIMESTEP,
        num_user_actions=1, eye_camera_size=eye_size, wing_fluid=True)
    morph = ff.apply_surgery(ff.load_morphology(), cfg)
    wing_jnames = [f"wing_{ax}_{side}" for side in ("left", "right")
                   for ax in ("yaw", "roll", "pitch")]
    for b in morph.bodies:
        for j in b.joints:
            if j.name in wing_jnames:
                j.stiffness = wp["stiffness"]
                j.damping = wp["damping"]
        for g in b.geoms:
            if g.fluidshape:
                g.fluidcoef = wp["fluidcoef"]
    for a in morph.actuators:
        if a.name.startswith("wing_"):
            a.gainprm = a.gainprm.copy()
            a.gainprm[0] = wp["gainprm"][0]

    hfield_pos = (8.0, 0.0, 0.0)
    trench = None
    if bumps_or_trench == "trench":
        data_hf, trench = arenas.sine_trench()
    else:
        data_hf = arenas.sine_bumps()

    def arena_fn(spec: mujoco.MjSpec):
        arenas.add_heightfield(spec, data_hf, pos=hfield_pos)

    spec = ff.to_spec(morph, cfg, arena_fn=arena_fn)
    mj_model = spec.compile()
    amap = ff.action_indices(morph, cfg)
    from flybody_tpu.physics import io_mj
    # fused production solver. Terrain (hfield) contacts are fatal for
    # the task, so only grazing-depth accuracy matters; self-collision
    # lanes as in flight_imitation.
    model = io_mj.put_model(mj_model, dtype=dtype,
                            con_sel={1: 8, 3: 16}, ccd_budget=32,
                            contact_solver="fused", fused_sel=(8, 24),
                            col_refresh=4)
    # cache camera poses for the eye renderer
    cam_pose = {}
    for c in range(mj_model.ncam):
        cam_pose[c] = (int(mj_model.cam_bodyid[c]),
                       np.asarray(mj_model.cam_pos[c], np.float32),
                       np.asarray(mj_model.cam_quat[c], np.float32))
    model.names["cam_pose"] = cam_pose
    walker = FlyWalker(model, amap)
    wbpg = WingBeatPatternGenerator()
    task = VisionFlightWBPG(walker, wbpg, hfield_pos, trench,
                            time_limit=time_limit, eye_size=eye_size)
    return FlyEnv(model, task, mj_model=mj_model, dtype=dtype)
