"""STAC -> clip-dataset conversion (reference trajectory_rodent.py:174-249).

STAC (simultaneous tracking and calibration) output stores per-clip walker
kinematics as transposed feature arrays under ``<clip>/walkers/walker_0``:
position (3, T), quaternion (4, T), joints (nj, T), velocity (3, T),
angular_velocity (3, T), joints_velocity (nj, T).

``convert_stac`` rewrites those into the framework's clip HDF5 layout —
one group per clip with row-major ``qpos`` (T, nq) = [pos, quat, joints]
and ``qvel`` (T, nv) = [vel, angvel, joints_velocity] — which
``tasks.tracking.load_hdf5_clips`` loads directly, plus the reference's
``id2name`` joint/site name tables, ``timestep_seconds``, and
``trajectory_lengths`` datasets. Engine-side features (body positions/
quaternions, egocentric appendages — the reference's precomputed
``root2site``) are recomputed exactly by tracking.build_clip_features via
the pure-JAX FK, so they always match the compiled model.

Unlike the reference converter (which hstacks quaternion+joints and drops
the root position from qpos, storing it separately as root_qpos), the
emitted qpos here is the full MuJoCo layout.
"""

from __future__ import annotations

import numpy as np


def _walker_group(f, clip_key):
    g = f[clip_key]
    if "walkers" in g:
        return g["walkers"]["walker_0"]
    return g


def convert_stac(input_path: str, output_path: str,
                 timestep_seconds: float = 0.02,
                 joint_names=(), site_names=()) -> int:
    """Convert a STAC HDF5 to the clip-dataset layout. Returns #clips."""
    import h5py

    n = 0
    with h5py.File(input_path, "r") as fin, \
            h5py.File(output_path, "w") as fout:
        id2name = fout.create_group("id2name")
        id2name.create_dataset(
            "joints", data=np.array(list(joint_names), dtype="S"))
        id2name.create_dataset(
            "sites", data=np.array(list(site_names), dtype="S"))
        fout.create_dataset("timestep_seconds", data=timestep_seconds)
        lengths = []
        for clip_key in fin.keys():
            w0 = _walker_group(fin, clip_key)
            if "position" not in w0:
                continue
            pos = np.asarray(w0["position"])          # (3, T)
            quat = np.asarray(w0["quaternion"])       # (4, T)
            joints = np.asarray(w0["joints"])         # (nj, T)
            vel = np.asarray(w0["velocity"])
            angvel = np.asarray(w0["angular_velocity"])
            jvel = np.asarray(w0["joints_velocity"])
            qpos = np.concatenate([pos.T, quat.T, joints.T], axis=-1)
            qvel = np.concatenate([vel.T, angvel.T, jvel.T], axis=-1)
            key = clip_key[5:] if clip_key.startswith("clip_") else clip_key
            g = fout.create_group(key)
            g.create_dataset("qpos", data=qpos.astype(np.float32))
            g.create_dataset("qvel", data=qvel.astype(np.float32))
            lengths.append(qpos.shape[0])
            n += 1
        fout.create_dataset("trajectory_lengths",
                            data=np.asarray(lengths, np.int64))
    return n


def write_stac_fixture(path: str, num_clips: int = 2, length: int = 50,
                       nj: int = 67, seed: int = 0):
    """Synthetic STAC-layout file for tests / standalone demos."""
    import h5py

    rng = np.random.RandomState(seed)
    with h5py.File(path, "w") as f:
        for i in range(num_clips):
            w = f.create_group(f"clip_{i}/walkers/walker_0")
            t = np.arange(length) * 0.02
            pos = np.stack([0.1 * t, 0 * t, 0.06 + 0 * t])
            quat = np.tile(np.array([1.0, 0, 0, 0])[:, None], (1, length))
            w.create_dataset("position", data=pos)
            w.create_dataset("quaternion", data=quat)
            w.create_dataset("joints",
                             data=0.05 * rng.randn(nj, length))
            w.create_dataset("velocity",
                             data=np.stack([0.1 + 0 * t, 0 * t, 0 * t]))
            w.create_dataset("angular_velocity", data=np.zeros((3, length)))
            w.create_dataset("joints_velocity",
                             data=0.01 * rng.randn(nj, length))
