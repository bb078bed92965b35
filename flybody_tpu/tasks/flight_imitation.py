"""Flight imitation with wing-beat pattern generator.

Functional re-design of the reference task (reference
vnl_ray/tasks/flight_imitation.py): the agent's wing actions ride on top of
a WBPG base pattern (position-control converted to force offsets,
reference :157-159), one extra user action modulates beat frequency within
base*(1 +/- rel_range), and the reward is the product of CoM-displacement
and root-quaternion tolerance factors. Fatal termination: below terminal
height or too far from the reference; end-of-trajectory keeps discount 1.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from flybody_tpu.envs.core import FlyEnv, Task
from flybody_tpu.envs.walker import FlyWalker
from flybody_tpu.io.trajectories import (TrajectoryDataset,
                                         load_hdf5_flight,
                                         synthetic_flight_dataset)
from flybody_tpu.math import quaternions as mq
from flybody_tpu.models import fruitfly as ff
from flybody_tpu.physics.types import Data, Model, pytree
from flybody_tpu.tasks import constants as C
from flybody_tpu.tasks.pattern_generators import (WBPGState,
                                                  WingBeatPatternGenerator)
from flybody_tpu.tasks.task_utils import com2root, root2com
from flybody_tpu.utils import rewards as rwu


@pytree(meta=())
class FlightState:
    traj_idx: jax.Array
    step: jax.Array
    snippet_len: jax.Array
    wbpg: WBPGState


class FlightImitationWBPG(Task):
    ctrl_dt = C.FLY_CONTROL_TIMESTEP
    phys_dt = C.FLY_PHYSICS_TIMESTEP

    def __init__(self, walker: FlyWalker, dataset: TrajectoryDataset,
                 wbpg: WingBeatPatternGenerator, time_limit: float = 0.6,
                 future_steps: int = 5, terminal_com_dist: float = 0.3):
        self.walker = walker
        self.dataset = dataset
        self.wbpg = wbpg
        self.time_limit = time_limit
        self.future_steps = future_steps
        self.terminal_com_dist = terminal_com_dist
        self.action_size = walker.action_size  # includes 1 user action
        model = walker.model
        names = model.names
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
        self._max_steps = round(time_limit / self.ctrl_dt)

    def action_bounds(self, model: Model):
        return self.walker.action_bounds(model)

    def _ref_root(self, name):
        return self.dataset.fields[name]

    def init_state(self, model: Model, data: Data, rng):
        k1, k2 = jax.random.split(rng)
        traj_idx = jax.random.randint(
            k1, (), 0, self.dataset.num_trajectories).astype(jnp.int32)
        snippet_len = jnp.minimum(
            self.dataset.lengths[traj_idx] - self.future_steps - 1,
            self._max_steps).astype(jnp.int32)
        com0 = self._ref_root("com_qpos")[traj_idx, 0]
        root_pos = com2root(com0[:3], com0[3:7])
        a = self.root_qposadr
        qpos = data.qpos.at[a:a + 3].set(root_pos)
        qpos = qpos.at[a + 3:a + 7].set(com0[3:7])
        # wing pattern init at random phase
        angles, wing_qvel, wbpg_state = self.wbpg.reset(
            initial_phase=jax.random.uniform(k2))
        qpos = qpos.at[self.wing_qposadr].set(angles)
        qvel = data.qvel.at[self.wing_dofadr].set(wing_qvel)
        qvel = qvel.at[:3].set(self._ref_root("com_qvel")[traj_idx, 0, :3])
        ts = FlightState(traj_idx=traj_idx, step=jnp.zeros((), jnp.int32),
                         snippet_len=snippet_len, wbpg=wbpg_state)
        return data.replace(qpos=qpos, qvel=qvel), ts

    def before_step(self, model: Model, data: Data, ts, action):
        # user action in [-1, 1] modulates beat frequency within the WBPG
        # range base*(1 +/- rel_freq_range) (reference :149-155)
        act = jnp.clip(action[self.user_action_idx], -1.0, 1.0)
        rel_range = float(self.wbpg.beat_freqs[-1]
                          / self.wbpg.base_beat_freq - 1.0)
        ctrl_freq = self.wbpg.base_beat_freq * (1.0 + rel_range * act)
        target, wbpg_state = self.wbpg.step(ts.wbpg, ctrl_freq)
        # position -> force control conversion (reference :157-159)
        wing_qpos = data.qpos[self.wing_qposadr]
        action = action.at[self.wing_action_idx].add(target - wing_qpos)
        data = self.walker.apply_action(data, action)
        return data, FlightState(traj_idx=ts.traj_idx, step=ts.step,
                                 snippet_len=ts.snippet_len,
                                 wbpg=wbpg_state)

    def after_substeps(self, model: Model, data: Data, ts):
        return data, FlightState(traj_idx=ts.traj_idx, step=ts.step + 1,
                                 snippet_len=ts.snippet_len, wbpg=ts.wbpg)

    # ------------------------------------------------------------------
    def _ref_window(self, ts):
        idx = ts.step + jnp.arange(self.future_steps + 1)
        idx = jnp.minimum(idx, self.dataset.lengths[ts.traj_idx] - 1)
        com = self._ref_root("com_qpos")[ts.traj_idx][idx]
        root_pos = com2root(com[:, :3], com[:, 3:7])
        return root_pos, com[:, 3:7]

    def observations(self, model: Model, data: Data, ts,
                     sensor_mean) -> dict:
        obs = self.walker.observables(model, data, sensor_mean)
        obs["world_zaxis_hover"] = self.walker.world_zaxis_hover(model, data)
        a = self.root_qposadr
        fly_pos = data.qpos[a:a + 3]
        fly_quat = data.qpos[a + 3:a + 7]
        ref_pos, ref_quat = self._ref_window(ts)
        obs["ref_displacement"] = mq.rotate_vec_with_quat(
            ref_pos - fly_pos, mq.conj_quat(fly_quat)).reshape(-1)
        obs["ref_root_quat"] = mq.get_dquat_local(
            fly_quat, ref_quat).reshape(-1)
        del obs["joints_pos"], obs["joints_vel"]
        obs["joints_pos"] = data.qpos[self.wing_qposadr]
        obs["joints_vel"] = data.qvel[self.wing_dofadr]
        return obs

    def reward_term_discount(self, model: Model, data: Data, ts,
                             sensor_mean):
        a = self.root_qposadr
        fly_pos = data.qpos[a:a + 3]
        fly_quat = data.qpos[a + 3:a + 7]
        step = jnp.minimum(ts.step, self.dataset.lengths[ts.traj_idx] - 1)
        com_ref = self._ref_root("com_qpos")[ts.traj_idx, step]
        model_com = root2com(fly_pos, fly_quat)
        displacement = jnp.linalg.norm(com_ref[:3] - model_com)
        disp_r = rwu.tolerance(displacement, bounds=(0.0, 0.0),
                               sigmoid="linear", margin=0.4,
                               value_at_margin=0.0)
        dquat = mq.get_dquat_local(fly_quat, com_ref[3:7])
        qdist = mq.quat_dist_short_arc(
            jnp.asarray([1.0, 0, 0, 0], fly_quat.dtype), dquat)
        quat_r = rwu.tolerance(qdist, bounds=(0.0, 0.0), sigmoid="linear",
                               margin=jnp.pi, value_at_margin=0.0)
        reward = disp_r * quat_r

        height = data.xpos[self.walker.thorax_id][2]
        qacc = jnp.linalg.norm(data.qacc)
        reached_end = ts.step >= ts.snippet_len
        root_pos_ref = com2root(com_ref[:3], com_ref[3:7])
        com_dist = jnp.linalg.norm(root_pos_ref - fly_pos)
        fatal = ((height < C.TERMINAL_HEIGHT)
                 | (com_dist > self.terminal_com_dist)
                 | (qacc > C.TERMINAL_QACC)
                 | jnp.any(jnp.isnan(data.qpos)))
        terminated = fatal | reached_end
        discount = jnp.where(fatal & ~reached_end, 0.0, 1.0)
        return reward, terminated, discount


def make_flight_imitation(ref_path: str | None = None,
                          wpg_pattern_path: str | None = None,
                          time_limit: float = 0.6, future_steps: int = 5,
                          terminal_com_dist: float = 0.3,
                          joint_filter: float = 0.0002,
                          dtype=jnp.float32) -> FlyEnv:
    """Factory (reference fly_envs.flight_imitation:29-72). With no
    ref_path/wpg path, synthetic data is used (standalone mode)."""
    wp = C.WING_PARAMS
    cfg = ff.FlyConfig(
        use_legs=False, use_wings=True, use_mouth=False, use_antennae=False,
        joint_filter=joint_filter, root_joint="free",
        body_pitch_angle=C.BODY_PITCH_ANGLE,
        physics_timestep=C.FLY_PHYSICS_TIMESTEP,
        control_timestep=C.FLY_CONTROL_TIMESTEP,
        num_user_actions=1, wing_fluid=True)
    morph = ff.apply_surgery(ff.load_morphology(), cfg)
    # Flying-base model config (reference tasks/base.py:264-330):
    # wing actuator gain, wing joint stiffness/damping, wing fluid coefs.
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
    spec = ff.to_spec(morph, cfg, arena_fn=None)  # no floor contacts
    mj_model = spec.compile()
    amap = ff.action_indices(morph, cfg)
    from flybody_tpu.physics import io_mj
    # fused production solver. Flight config has no floor and no analytic
    # condim-3 pairs at all (only condim-1 self-contact sensing + convex
    # self-collision lanes); tiny budgets cover it.
    model = io_mj.put_model(mj_model, dtype=dtype,
                            con_sel={1: 8}, ccd_budget=32,
                            contact_solver="fused", fused_sel=(8, 16),
                            col_refresh=4)
    walker = FlyWalker(model, amap)

    if ref_path is not None:
        dataset = load_hdf5_flight(ref_path)
    else:
        dataset = synthetic_flight_dataset(timestep=C.FLY_CONTROL_TIMESTEP)

    base = None
    if wpg_pattern_path is not None:
        base = np.load(wpg_pattern_path)
    wbpg = WingBeatPatternGenerator(base_pattern=base)
    task = FlightImitationWBPG(walker, dataset, wbpg,
                               time_limit=time_limit,
                               future_steps=future_steps,
                               terminal_com_dist=terminal_com_dist)
    return FlyEnv(model, task, mj_model=mj_model, dtype=dtype)
