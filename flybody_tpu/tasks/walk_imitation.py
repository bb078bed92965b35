"""Walking imitation: DeepMimic-style tracking of reference trajectories.

Functional re-design of the reference task (reference
vnl_ray/tasks/walk_imitation.py): per-episode snippet selection is a traced
index into a padded device dataset (never a model recompile), the tracked
"ghost" is pure data (its pose feeds the ref_displacement / ref_root_quat
observables with future-step previews; reference base.py:237-261), reward
is the product of DeepMimic factors with weights (20, 1, 1, 1), and
termination distinguishes fatal (discount 0) from end-of-snippet (discount
1) outcomes (reference walk_imitation.py:165-191).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from flybody_tpu.envs.core import FlyEnv, Task
from flybody_tpu.envs.walker import FlyWalker
from flybody_tpu.io.trajectories import (TrajectoryDataset,
                                         load_hdf5_walking,
                                         synthetic_walking_dataset)
from flybody_tpu.math import quaternions as mq
from flybody_tpu.models import fruitfly as ff
from flybody_tpu.physics.types import Data, Model, pytree
from flybody_tpu.tasks import constants as C
from flybody_tpu.tasks import rewards as rw
from flybody_tpu.tasks.template_task import floor_arena


@pytree(meta=())
class ImitationState:
    traj_idx: jax.Array     # int32 snippet index
    step: jax.Array         # int32 control step within snippet
    snippet_len: jax.Array  # int32


class WalkImitation(Task):
    ctrl_dt = C.WALK_CONTROL_TIMESTEP
    phys_dt = C.WALK_PHYSICS_TIMESTEP

    def __init__(self, walker: FlyWalker, dataset: TrajectoryDataset,
                 time_limit: float = 10.0, future_steps: int = 64,
                 terminal_com_dist: float = 2.0,
                 mocap_joints: np.ndarray | None = None,
                 mocap_sites: np.ndarray | None = None):
        self.walker = walker
        self.dataset = dataset
        self.time_limit = time_limit
        self.future_steps = future_steps
        self.terminal_com_dist = terminal_com_dist
        self.action_size = walker.action_size
        model = walker.model
        names = model.names
        # mocap joints: the fly's scalar joints in model order (the datasets
        # follow the same ordering); sites: claw sites (end effectors).
        if mocap_joints is None:
            from flybody_tpu.physics import types as T
            jt = np.asarray(model.jnt_type)
            mocap_joints = np.nonzero((jt == T.HINGE) | (jt == T.SLIDE))[0]
        self.mocap_joints = mocap_joints
        self.joint_dofadr = np.asarray(model.jnt_dofadr)[mocap_joints]
        if mocap_sites is None:
            mocap_sites = np.asarray(walker.claw_sites, dtype=np.int32)
        self.mocap_sites = mocap_sites
        self.root_qposadr = int(np.asarray(model.jnt_qposadr)[0])
        # max usable episode steps per snippet
        self._max_steps = round(time_limit / self.ctrl_dt) + 1

    def action_bounds(self, model: Model):
        return self.walker.action_bounds(model)

    # ------------------------------------------------------------------
    def _ref(self, name):
        return self.dataset.fields[name]

    def init_state(self, model: Model, data: Data, rng):
        traj_idx = jax.random.randint(
            rng, (), 0, self.dataset.num_trajectories).astype(jnp.int32)
        snippet_len = jnp.minimum(
            self.dataset.lengths[traj_idx] - self.future_steps - 1,
            self._max_steps).astype(jnp.int32)
        ts = ImitationState(traj_idx=traj_idx,
                            step=jnp.zeros((), jnp.int32),
                            snippet_len=snippet_len)
        # set initial pose from reference frame 0
        qpos0_ref = self._ref("qpos")[traj_idx, 0]
        qvel0_ref = self._ref("qvel")[traj_idx, 0]
        a = self.root_qposadr
        qpos = data.qpos.at[a:a + 7].set(qpos0_ref[:7])
        qpos = qpos.at[np.asarray(
            self.walker.model.jnt_qposadr)[self.mocap_joints]].set(
            qpos0_ref[7:7 + len(self.mocap_joints)])
        qvel = data.qvel.at[:6].set(qvel0_ref[:6])
        qvel = qvel.at[self.joint_dofadr].set(
            qvel0_ref[6:6 + len(self.mocap_joints)])
        return data.replace(qpos=qpos, qvel=qvel), ts

    def before_step(self, model: Model, data: Data, ts, action):
        return self.walker.apply_action(data, action), ts

    def after_substeps(self, model: Model, data: Data, ts):
        return data, ImitationState(traj_idx=ts.traj_idx, step=ts.step + 1,
                                    snippet_len=ts.snippet_len)

    # ------------------------------------------------------------------
    def _ref_window(self, ts, field, k):
        """(future_steps+1, dim) slice [step, step+future] of the ref."""
        idx = ts.step + jnp.arange(self.future_steps + 1)
        idx = jnp.minimum(idx, self.dataset.lengths[ts.traj_idx] - 1)
        return self._ref(field)[ts.traj_idx][idx][..., :k]

    def observations(self, model: Model, data: Data, ts,
                     sensor_mean) -> dict:
        obs = self.walker.observables(model, data, sensor_mean)
        obs["appendages_pos"] = self.walker.appendages_pos(data)
        obs.update(self.walker.force_touch_obs(sensor_mean))
        a = self.root_qposadr
        fly_pos = data.qpos[a:a + 3]
        fly_quat = data.qpos[a + 3:a + 7]
        ref_pos = self._ref_window(ts, "qpos", 3)     # (F+1, 3)
        ref_quat = self._ref_window(ts, "qpos", 7)[:, 3:7]
        obs["ref_displacement"] = mq.rotate_vec_with_quat(
            ref_pos - fly_pos, mq.conj_quat(fly_quat)).reshape(-1)
        obs["ref_root_quat"] = mq.get_dquat_local(
            fly_quat, ref_quat).reshape(-1)
        return obs

    def _deep_mimic_factors(self, model: Model, data: Data, ts):
        walker_ft = rw.get_walker_features(
            model, data, self.joint_dofadr, self.mocap_joints,
            self.mocap_sites, self.root_qposadr)
        step = jnp.minimum(ts.step, self.dataset.lengths[ts.traj_idx] - 1)
        ref = {k: self._ref(k)[ts.traj_idx] for k in
               ("qpos", "qvel", "root2site", "joint_quat")}
        ref_ft = rw.get_reference_features(ref, step)
        factors = rw.reward_factors_deep_mimic(
            walker_ft, ref_ft, weights=(20.0, 1.0, 1.0, 1.0))
        return factors, walker_ft, ref_ft

    def reward_factors(self, model: Model, data: Data, ts, sensor_mean):
        factors, _, _ = self._deep_mimic_factors(model, data, ts)
        return {"com": factors[0], "qvel": factors[1],
                "end_effectors": factors[2], "joints": factors[3]}

    def reward_term_discount(self, model: Model, data: Data, ts,
                             sensor_mean):
        factors, walker_ft, ref_ft = self._deep_mimic_factors(
            model, data, ts)
        reward = jnp.prod(factors)

        linvel = jnp.linalg.norm(
            self.walker.sensor_obs(sensor_mean, "velocimeter"))
        angvel = jnp.linalg.norm(self.walker.sensor_obs(sensor_mean, "gyro"))
        com_dist = jnp.linalg.norm(ref_ft["com"] - walker_ft["com"])
        qacc = jnp.linalg.norm(data.qacc)
        reached_end = ts.step >= ts.snippet_len
        fatal = ((linvel > C.TERMINAL_LINVEL)
                 | (angvel > C.TERMINAL_ANGVEL)
                 | (com_dist > self.terminal_com_dist)
                 | (qacc > C.TERMINAL_QACC)
                 | jnp.any(jnp.isnan(data.qpos)))
        terminated = fatal | reached_end
        discount = jnp.where(fatal & ~reached_end, 0.0, 1.0)
        return reward, terminated, discount


def make_walk_imitation(ref_path: str | None = None,
                        time_limit: float = 10.0, future_steps: int = 64,
                        terminal_com_dist: float = 2.0,
                        joint_filter: float = 0.01,
                        adhesion_filter: float = 0.007,
                        claw_friction: float = 1.0,
                        dtype=jnp.float32) -> FlyEnv:
    """Factory (reference fly_envs.walk_imitation:75-122). With no
    ref_path, a synthetic dataset is used (standalone/testing mode,
    mirroring InferenceWalkingTrajectoryLoader)."""
    cfg = ff.FlyConfig(
        use_legs=True, use_wings=False, joint_filter=joint_filter,
        adhesion_filter=adhesion_filter, root_joint="free",
        spawn_pos=(0.0, 0.0, 0.1278),
        physics_timestep=C.WALK_PHYSICS_TIMESTEP,
        control_timestep=C.WALK_CONTROL_TIMESTEP)
    morph = ff.apply_surgery(ff.load_morphology(), cfg)
    for b in morph.bodies:
        for g in b.geoms:
            if (g.name.startswith("claw") or "labrum" in g.name) and g.gap > 0:
                g.friction = np.array([claw_friction, 0.005, 0.0001])
    spec = ff.to_spec(morph, cfg, arena_fn=floor_arena())
    mj_model = spec.compile()
    amap = ff.action_indices(morph, cfg)
    from flybody_tpu.physics import io_mj
    # fused production solver (round 4: fast path for ALL envs, not just
    # the bench). Budgets sized by tools/measure_active_contacts.py on a
    # free fly over flat floor: analytic condim-3 (floor) contacts and
    # the self-collision ccd lanes stay below these caps with margin.
    model = io_mj.put_model(mj_model, dtype=dtype,
                            con_sel={1: 8, 3: 24}, ccd_budget=96,
                            contact_solver="fused", fused_sel=(24, 48),
                            col_refresh=10)
    walker = FlyWalker(model, amap)

    if ref_path is not None:
        dataset = load_hdf5_walking(ref_path)
    else:
        from flybody_tpu.physics import types as T
        jt = np.asarray(model.jnt_type)
        n_joints = int(((jt == T.HINGE) | (jt == T.SLIDE)).sum())
        qpos0 = np.zeros(7 + n_joints, np.float32)
        qpos0[2] = 0.1278
        qpos0[3] = 1.0
        dataset = synthetic_walking_dataset(
            qpos0, n_joints=n_joints, n_sites=len(walker.claw_sites),
            timestep=C.WALK_CONTROL_TIMESTEP)

    task = WalkImitation(walker, dataset, time_limit=time_limit,
                         future_steps=future_steps,
                         terminal_com_dist=terminal_com_dist)
    return FlyEnv(model, task, mj_model=mj_model, dtype=dtype)
