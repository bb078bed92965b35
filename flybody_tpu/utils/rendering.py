"""Host-side rendering of rollouts via the native C++ rasterizer.

Replaces the reference's EGL/GL rendering for evaluation videos (reference
vnl_ray/utils.py:15-33 rollout_and_render + ray_distributed_dmpo evaluator
mp4 uploads) with a dependency-free software raycaster
(flybody_tpu/native/rasterizer.cpp) driven through ctypes. The library is
built on first use with the in-tree Makefile.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "native")
_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(_NATIVE_DIR, "librasterizer.so")
    if not os.path.exists(so):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(so)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
    lib.render_rgb.argtypes = [f32p, f32p, ctypes.c_float, ctypes.c_int,
                               ctypes.c_int, ctypes.c_int, i32p, f32p, f32p,
                               f32p, f32p, u8p]
    lib.render_rgb.restype = None
    lib.render_depth.argtypes = [f32p, f32p, ctypes.c_float, ctypes.c_int,
                                 ctypes.c_int, ctypes.c_int, i32p, f32p,
                                 f32p, f32p, f32p]
    lib.render_depth.restype = None
    return _LIB_set(lib)


def _LIB_set(lib):
    global _LIB
    _LIB = lib
    return lib


def _scene_arrays(model, data, visible_groups=(0, 1, 2, 4)):
    """Extract renderable geom arrays from (Model, Data)."""
    gt = np.asarray(model.geom_type, np.int32)
    keep = np.array([t in (0, 2, 3, 4, 5, 6) for t in gt])
    idx = np.nonzero(keep)[0].astype(np.int32)
    types = gt[idx]
    pos = np.asarray(data.geom_xpos, np.float32)[idx]
    mat = np.asarray(data.geom_xmat, np.float32)[idx].reshape(-1, 9)
    size = np.asarray(model.geom_size, np.float32)[idx]
    rgba = np.full((len(idx), 4), 0.65, np.float32)
    return types.copy(), pos.copy(), mat.copy(), size.copy(), rgba


def render_frame(model, data, cam_pos, cam_mat, fovy=45.0, width=320,
                 height=240):
    """Render one RGB frame (H, W, 3) uint8 from engine state."""
    lib = _load()
    types, pos, mat, size, rgba = _scene_arrays(model, data)
    out = np.zeros((height, width, 3), np.uint8)
    lib.render_rgb(np.asarray(cam_pos, np.float32).copy(),
                   np.asarray(cam_mat, np.float32).reshape(9).copy(),
                   float(fovy), width, height, len(types), types,
                   pos.reshape(-1), mat.reshape(-1), size.reshape(-1),
                   rgba.reshape(-1), out.reshape(-1))
    return out


def render_depth(model, data, cam_pos, cam_mat, fovy=45.0, width=32,
                 height=32):
    """Depth frame (H, W) float32 (for eye-camera validation)."""
    lib = _load()
    types, pos, mat, size, _ = _scene_arrays(model, data)
    out = np.zeros((height, width), np.float32)
    lib.render_depth(np.asarray(cam_pos, np.float32).copy(),
                     np.asarray(cam_mat, np.float32).reshape(9).copy(),
                     float(fovy), width, height, len(types), types,
                     pos.reshape(-1), mat.reshape(-1), size.reshape(-1),
                     out.reshape(-1))
    return out


def rollout_and_render(env, policy_fn, rng, n_steps=100, camera="track",
                       width=320, height=240):
    """Roll out a policy and render frames (reference rollout_and_render).

    policy_fn: obs dict -> action array. Returns list of (H, W, 3) frames.
    """
    import jax

    state = jax.jit(env.reset)(rng[None] if rng.ndim == 1 else rng)
    step = jax.jit(env.autoreset_step)
    frames = []
    thorax = env.task.walker.thorax_id
    for _ in range(n_steps):
        action = policy_fn(state.obs)
        state = step(state, action)
        target = np.asarray(state.data.xpos[thorax, :, 0])
        cam_pos = target + np.array([0.6, 0.6, 0.35])
        fwd = target - cam_pos
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, [0.0, 0.0, 1.0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        cam_mat = np.stack([right, up, -fwd], axis=1)
        frames.append(render_frame(env.model, state.data, cam_pos, cam_mat,
                                   width=width, height=height))
    return frames


def _plot_reward_strip(history: dict, idx: int, width: int, height: int,
                       terminated: bool = False):
    """Reward-channel line plot as an (height, width, 3) uint8 array
    (reference vnl_ray/utils.py plot_reward :200-244, Agg backend)."""
    import matplotlib
    orig = matplotlib.get_backend()
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    try:
        fig = plt.figure(figsize=(width / 100.0, height / 100.0), dpi=100)
        ax = fig.add_subplot(111)
        for key, vals in history.items():
            ax.plot(vals[: idx + 1], label=key)
            ax.scatter([idx], [vals[idx]])
        if terminated:
            ax.axvline(x=idx, color="r", linestyle="-")
        ax.set_ylim(-0.05, 1.1)
        ax.set_xlim(0, max(len(next(iter(history.values()))) - 1, 1))
        ax.legend(loc="upper right", fontsize=6)
        fig.tight_layout()
        fig.canvas.draw()
        buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
        w, h = fig.canvas.get_width_height()
        img = buf.reshape(h, w, 4)[..., :3].copy()
        plt.close(fig)
        return img
    finally:
        matplotlib.use(orig)


def render_with_rewards_info(env, policy_fn, rng, n_steps=100,
                             width=320, height=240):
    """Policy rollout collecting frames + per-step reward channels
    (reference utils.render_with_rewards_info :139-165)."""
    import jax

    state = jax.jit(env.reset)(rng[None] if rng.ndim == 1 else rng)
    step = jax.jit(env.autoreset_step)
    model, task = env.model, env.task

    def _factors(data, ts, sm):
        return jax.vmap(
            lambda d, t, s: task.reward_factors(model, d, t, s),
            in_axes=(-1, -1, -1), out_axes=0)(data, ts, sm)

    factors_fn = jax.jit(_factors)
    frames, channels, reset_idx = [], [], []
    thorax = env.task.walker.thorax_id
    for i in range(n_steps):
        action = policy_fn(state.obs)
        state = step(state, action)
        fac = factors_fn(state.data, state.task_state,
                         state.data.sensordata)
        channels.append({k: float(np.asarray(v)[0])
                         for k, v in fac.items()})
        if bool(np.asarray(state.done)[0]):
            reset_idx.append(i)
        target = np.asarray(state.data.xpos[thorax, :, 0])
        cam_pos = target + np.array([0.6, 0.6, 0.35])
        fwd = target - cam_pos
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, [0.0, 0.0, 1.0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        cam_mat = np.stack([right, up, -fwd], axis=1)
        frames.append(render_frame(env.model, state.data, cam_pos, cam_mat,
                                   width=width, height=height))
    return frames, reset_idx, channels


def render_with_rewards(env, policy_fn, rng, n_steps=100,
                        width=320, height=240):
    """Frames with a reward-decomposition plot composited alongside
    (reference utils.render_with_rewards :168-197)."""
    frames, reset_idx, channels = render_with_rewards_info(
        env, policy_fn, rng, n_steps=n_steps, width=width, height=height)
    keys = channels[0].keys()
    history = {k: np.array([c[k] for c in channels]) for k in keys}
    out = []
    resets = set(reset_idx)
    for i, frame in enumerate(frames):
        strip = _plot_reward_strip(history, i, width=width, height=height,
                                   terminated=i in resets)
        out.append(np.concatenate([frame, strip], axis=1))
    return out
