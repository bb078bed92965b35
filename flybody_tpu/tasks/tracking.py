"""Multi-clip mocap tracking (reference-pose imitation), TPU-first.

Re-design of the reference's vendored dm_control tracking task
(reference vnl_ray/tasks/tracking_old.py:102-930 and the thin wrapper
vnl_ray/tasks/tracking.py:73-127) as a pure functional Task over the
batch-native engine:

* The clip collection is loaded ONCE into padded device arrays of
  reference FEATURES (joints, body positions/quaternions, root pos/quat,
  joint velocities, appendages). Episode variation — clip choice and
  start step — is pure data in the task state; there is no per-episode
  model recompilation and no per-clip Python caching (the reference's
  per-clip ego-quat cache, tracking_old.py:614-626, becomes a plain
  precomputed array).
* Possible starts are every step with at least ``min_steps + max(ref_steps)``
  frames remaining (reference tracking_old.py:302-319 enumeration).
* Reference observations mirror the reference set: rel joints, rel body
  positions (egocentric), rel root quat, reference ego body quats, and
  appendage positions, each over the ``ref_steps`` future preview
  (reference tracking_old.py:570-732).
* Termination error = 0.5 * body_error_multiplier * mean|body pos diff|
  + 0.5 * mean|joints diff| (reference tracking_old.py:523-534); episodes
  truncate when it exceeds ``termination_error_threshold`` (discount 0)
  or end with the clip (discount 1, "good" termination).
* Reward = the vendored family (tracking_rewards.py): comic by default,
  with per-channel recording into the env metrics (the reference's
  ``last_reward_channels``).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from flybody_tpu.math import quaternions as mq
from flybody_tpu.envs.core import Task
from flybody_tpu.physics.types import Data, Model
from flybody_tpu.tasks import tracking_rewards as tr


@dataclasses.dataclass
class ClipCollection:
    """Padded per-clip reference features, device-resident.

    fields:
      qpos (N, T, nq), qvel (N, T, nv), joints (N, T, nj),
      joints_velocity (N, T, nj), body_positions (N, T, nb, 3),
      body_quaternions (N, T, nb, 4), position (N, T, 3),
      quaternion (N, T, 4), appendages (N, T, ne, 3)
    """
    fields: dict
    lengths: jnp.ndarray
    timestep: float

    @property
    def num_clips(self):
        return int(self.lengths.shape[0])


def build_clip_features(model: Model, walker, qpos: np.ndarray,
                        qvel: np.ndarray, lengths: np.ndarray,
                        timestep: float) -> ClipCollection:
    """Precompute reference features from raw (N, T, nq/nv) clips by
    running the engine's FK over every frame (host-side, once).

    This plays the role of dm_control's precomputed mocap feature protos;
    with the pure-JAX FK the features always match the compiled model.
    """
    from flybody_tpu.physics import io_mj
    from flybody_tpu.physics import kinematics as K

    N, Tlen, nq = qpos.shape
    flat_q = jnp.asarray(qpos.reshape(N * Tlen, nq).T)   # (nq, N*T)
    d = io_mj.make_data(model, B=N * Tlen)
    d = d.replace(qpos=flat_q.astype(d.qpos.dtype))
    d = K.kinematics(model, d)

    def unflat(x, comp):
        # (nb, comp, N*T) -> (N, T, nb, comp)
        return np.asarray(x).transpose(2, 0, 1).reshape(
            N, Tlen, -1, comp)

    body_pos = unflat(d.xpos, 3)
    body_quat = unflat(d.xquat, 4)
    root_pos = body_pos[:, :, walker.root_body_id]
    root_quat = body_quat[:, :, walker.root_body_id]
    # egocentric appendages via the walker's own observable (handles both
    # site- and body-defined end effectors)
    app = jax.vmap(walker.appendages_pos, in_axes=-1, out_axes=0)(d)
    app = np.asarray(app).reshape(N, Tlen, -1, 3)
    jq = qpos[..., walker.joint_qposadr]
    jv = qvel[..., walker.joint_dofadr]
    fields = dict(
        qpos=jnp.asarray(qpos, jnp.float32),
        qvel=jnp.asarray(qvel, jnp.float32),
        joints=jnp.asarray(jq, jnp.float32),
        joints_velocity=jnp.asarray(jv, jnp.float32),
        body_positions=jnp.asarray(body_pos, jnp.float32),
        body_quaternions=jnp.asarray(body_quat, jnp.float32),
        position=jnp.asarray(root_pos, jnp.float32),
        quaternion=jnp.asarray(root_quat, jnp.float32),
        appendages=jnp.asarray(np.asarray(app), jnp.float32),
    )
    return ClipCollection(fields=fields, lengths=jnp.asarray(lengths),
                          timestep=timestep)


class MultiClipTracking(Task):
    """Functional analog of MultiClipMocapTracking (tracking_old.py:788)."""

    def __init__(self, walker, clips: ClipCollection,
                 ref_steps=(1, 2, 3, 4, 5),
                 termination_error_threshold: float = 0.3,
                 body_error_multiplier: float = 1.0,
                 reward_key: str = "comic", tuning: str = "rodent",
                 min_steps: int = 10, time_limit: float = 10.0,
                 ctrl_dt: float = 0.02, phys_dt: float = 0.002,
                 ghost_offset=(0.0, 0.0, 0.0)):
        self.walker = walker
        self.clips = clips
        self.ref_steps = tuple(int(r) for r in ref_steps)
        self.termination_error_threshold = termination_error_threshold
        self.body_error_multiplier = body_error_multiplier
        self.reward_key = reward_key
        self.tuning = tuning
        self.min_steps = min_steps
        self.time_limit = time_limit
        self.ctrl_dt = ctrl_dt
        self.phys_dt = phys_dt
        self.ghost_offset = jnp.asarray(ghost_offset)
        self.action_size = walker.action_size
        # body subset used for the termination error / rel-body obs
        self.body_idxs = np.asarray(getattr(
            walker, "mocap_tracking_bodies",
            np.arange(1, walker.model.nbody)), dtype=int)

    def action_bounds(self, model: Model):
        return self.walker.action_bounds(model)

    # -- episode init ------------------------------------------------------
    def init_state(self, model: Model, data: Data, rng):
        kc, ks = jax.random.split(rng)
        n = self.clips.num_clips
        clip = jax.random.randint(kc, (), 0, n)
        horizon = self.min_steps + max(self.ref_steps)
        max_start = jnp.maximum(self.clips.lengths[clip] - horizon, 1)
        start = jax.random.randint(ks, (), 0, max_start)
        qpos0 = self.clips.fields["qpos"][clip, start]
        qvel0 = self.clips.fields["qvel"][clip, start]
        data = data.replace(qpos=qpos0.astype(data.qpos.dtype),
                            qvel=qvel0.astype(data.qvel.dtype))
        ts = dict(clip=clip, start=start,
                  step=jnp.asarray(0, jnp.int32))
        return data, ts

    def before_step(self, model: Model, data: Data, ts, action):
        return self.walker.apply_action(data, action), ts

    def after_substeps(self, model: Model, data: Data, ts):
        return data, dict(ts, step=ts["step"] + 1)

    # -- features ----------------------------------------------------------
    def _ref(self, key, ts, offset=0):
        t = jnp.minimum(ts["start"] + ts["step"] + offset,
                        self.clips.lengths[ts["clip"]] - 1)
        return self.clips.fields[key][ts["clip"], t]

    def _walker_features(self, model, data):
        w = self.walker
        root_pos = data.xpos[w.root_body_id]
        root_quat = data.xquat[w.root_body_id]
        return dict(
            position=root_pos, quaternion=root_quat,
            joints=data.qpos[w.joint_qposadr],
            joints_velocity=data.qvel[w.joint_dofadr],
            body_positions=data.xpos,
            body_quaternions=data.xquat,
            appendages=w.appendages_pos(data).reshape(-1, 3),
            center_of_mass=data.subtree_com[w.root_body_id],
        )

    def observations(self, model: Model, data: Data, ts, sensor_mean):
        w = self.walker
        obs = w.observables(model, data, sensor_mean)
        wf = self._walker_features(model, data)
        root_quat = wf["quaternion"]
        conj = mq.conj_quat(root_quat)
        rel_joints, rel_bodies, rel_root_quat, ego_quats, app = \
            [], [], [], [], []
        for r in self.ref_steps:
            joints_r = self._ref("joints", ts, r)
            rel_joints.append(joints_r - wf["joints"])
            bp_r = self._ref("body_positions", ts, r)[self.body_idxs]
            diff = bp_r - wf["body_positions"][self.body_idxs]
            rel_bodies.append(
                mq.rotate_vec_with_quat(diff, conj).reshape(-1))
            rq_r = self._ref("quaternion", ts, r)
            rel_root_quat.append(mq.mult_quat(conj, rq_r))
            bq_r = self._ref("body_quaternions", ts, r)[self.body_idxs]
            ego_quats.append(mq.mult_quat(
                mq.conj_quat(rq_r), bq_r).reshape(-1))
            app.append(self._ref("appendages", ts, r).reshape(-1))
        obs.update({
            "ref_rel_joints": jnp.concatenate(rel_joints),
            "ref_rel_bodies_pos_local": jnp.concatenate(rel_bodies),
            "ref_rel_root_quat": jnp.concatenate(rel_root_quat),
            "ref_ego_bodies_quats": jnp.concatenate(ego_quats),
            "ref_appendages_pos": jnp.concatenate(app),
            "clip_id": ts["clip"].astype(jnp.float32)[None],
        })
        return obs

    def _termination_error(self, wf, ts):
        tj = self._ref("joints", ts)
        err_j = jnp.mean(jnp.abs(tj - wf["joints"]))
        tb = self._ref("body_positions", ts)[self.body_idxs]
        err_b = jnp.mean(jnp.abs(
            tb - wf["body_positions"][self.body_idxs]))
        return (0.5 * self.body_error_multiplier * err_b + 0.5 * err_j)

    def reward_term_discount(self, model: Model, data: Data, ts,
                             sensor_mean):
        wf = self._walker_features(model, data)
        ref = dict(
            joints=self._ref("joints", ts),
            joints_velocity=self._ref("joints_velocity", ts),
            body_quaternions=self._ref("body_quaternions", ts),
            appendages=self._ref("appendages", ts),
            center_of_mass=self._ref("position", ts),
        )
        walker = dict(
            joints=wf["joints"], joints_velocity=wf["joints_velocity"],
            body_quaternions=wf["body_quaternions"],
            appendages=wf["appendages"],
            center_of_mass=wf["center_of_mass"],
        )
        err = self._termination_error(wf, ts)
        reward, channels = tr.get_reward(self.reward_key)(
            termination_error=err,
            termination_error_threshold=self.termination_error_threshold,
            walker_features=walker, reference_features=ref,
            tuning=self.tuning)
        fatal = (err > self.termination_error_threshold) \
            | (jnp.linalg.norm(data.qacc) > 1e14) \
            | jnp.any(jnp.isnan(data.qpos))
        end_clip = (ts["start"] + ts["step"] + max(self.ref_steps)
                    >= self.clips.lengths[ts["clip"]])
        terminated = fatal | end_clip
        discount = jnp.where(fatal, 0.0, 1.0)
        return reward, terminated, discount

    def reward_channels_spec(self):
        return tr.get_reward_channels(self.reward_key)


def load_hdf5_clips(model: Model, walker, path: str,
                    timestep: float = 0.02) -> ClipCollection:
    """Load mocap clips from an HDF5 file into a ClipCollection.

    Accepts either flat per-clip groups with ``qpos``/``qvel`` datasets or
    the dm_control reference-pose layout (``<clip>/walkers/walker_0``;
    reference tracking_old.py ref_path + trajectory_loaders.py:34-80).
    Clips are padded to the longest length; real lengths are kept.
    """
    import h5py

    qps, qvs = [], []
    with h5py.File(path, "r") as f:
        for key in f.keys():
            g = f[key]
            if not isinstance(g, h5py.Group) or key == "id2name":
                continue
            if "qpos" in g:
                qp, qv = np.asarray(g["qpos"]), np.asarray(g["qvel"])
            elif "walkers" in g:
                w0 = g["walkers"]["walker_0"]
                pos = np.asarray(w0["position"]).T
                quat = np.asarray(w0["quaternion"]).T
                joints = np.asarray(w0["joints"]).T
                vel = np.asarray(w0["velocity"]).T
                angvel = np.asarray(w0["angular_velocity"]).T
                jvel = np.asarray(w0["joints_velocity"]).T
                qp = np.concatenate([pos, quat, joints], axis=-1)
                qv = np.concatenate([vel, angvel, jvel], axis=-1)
            else:
                continue
            qps.append(qp.astype(np.float32))
            qvs.append(qv.astype(np.float32))
    if not qps:
        raise ValueError(f"no clips found in {path}")
    lengths = np.asarray([len(q) for q in qps], np.int32)
    Tmax = int(lengths.max())
    N = len(qps)
    qpos = np.zeros((N, Tmax, model.nq), np.float32)
    qvel = np.zeros((N, Tmax, model.nv), np.float32)
    for i, (qp, qv) in enumerate(zip(qps, qvs)):
        n = min(qp.shape[-1], model.nq)
        qpos[i, :len(qp), :n] = qp[:, :n]
        qpos[i, len(qp):] = qpos[i, len(qp) - 1]
        nv = min(qv.shape[-1], model.nv)
        qvel[i, :len(qv), :nv] = qv[:, :nv]
    return build_clip_features(model, walker, qpos, qvel, lengths, timestep)


def synthetic_clips(model: Model, walker, num_clips: int = 3,
                    length: int = 120, timestep: float = 0.02,
                    seed: int = 0) -> ClipCollection:
    """Standing/slow-walking synthetic clips for standalone operation and
    tests (the reference snapshot ships no mocap data; analog of its
    test-injection loader, trajectory_loaders.py:226)."""
    rng = np.random.RandomState(seed)
    nq, nv = model.nq, model.nv
    qpos0 = np.asarray(model.qpos0)
    qpos = np.tile(qpos0[None, None], (num_clips, length, 1)).astype(
        np.float32)
    qvel = np.zeros((num_clips, length, nv), np.float32)
    t = np.arange(length) * timestep
    for i in range(num_clips):
        v = 0.1 + 0.1 * i
        qpos[i, :, 0] += v * t
        qvel[i, :, 0] = v
        jadr = np.asarray(walker.joint_qposadr)
        phase = 2 * np.pi * 2.0 * t[:, None] + rng.uniform(
            0, 2 * np.pi, (1, len(jadr)))
        qpos[i][:, jadr] = qpos[i][:, jadr] + 0.03 * np.sin(phase)
        dadr = np.asarray(walker.joint_dofadr)
        qvel[i][:, dadr] = 0.03 * 2 * np.pi * 2.0 * np.cos(phase)
    lengths = np.full(num_clips, length, np.int32)
    return build_clip_features(model, walker, qpos, qvel, lengths, timestep)
