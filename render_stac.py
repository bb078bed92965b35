"""Render STAC/mocap clips as playback videos (reference
render_stac.py:23-92).

Loads a clip dataset (STAC-converted or the framework clip layout),
plays each clip back kinematically on the rodent walker — qpos driven
frame-by-frame, zero actions, the reference PlaybackTask semantics — and
renders each frame with the native C++ rasterizer.

    python render_stac.py [--ref-path clips.h5] [--out-dir renders]
                          [--num-clips 2] [--width 320] [--height 240]

Without --ref-path, synthetic clips are rendered (the snapshot ships no
mocap data).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax

# the axon sitecustomize force-sets jax_platforms at interpreter start,
# overriding the JAX_PLATFORMS env var; re-assert the user's choice
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp


def playback_frames(env, qpos_clip, n_steps, width, height):
    """Kinematic playback: FK per frame + host-side rasterization."""
    from flybody_tpu.physics import forward as F
    from flybody_tpu.physics import io_mj
    from flybody_tpu.utils import rendering

    model = env.model
    data = io_mj.make_data(model, B=1)
    fk = jax.jit(lambda d: F.fwd_position(model, d))
    frames = []
    for t in range(n_steps):
        q = jnp.asarray(qpos_clip[t], data.qpos.dtype)[:, None]
        d = fk(data.replace(qpos=q))
        root = np.asarray(d.xpos[:, :, 0])[1]
        cam_pos = root + np.array([0.8, -0.8, 0.5])
        fwd = root - cam_pos
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, [0.0, 0.0, 1.0])
        right /= max(np.linalg.norm(right), 1e-9)
        up = np.cross(right, fwd)
        cam_mat = np.stack([right, up, -fwd], axis=0).T
        frame = rendering.render_frame(
            model, jax.tree.map(lambda x: np.asarray(x)[..., 0], d),
            cam_pos, cam_mat, width=width, height=height)
        frames.append(frame)
    return frames


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ref-path", default="")
    p.add_argument("--out-dir", default="stac_renders")
    p.add_argument("--num-clips", type=int, default=2)
    p.add_argument("--n-steps", type=int, default=100)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=240)
    args = p.parse_args()

    from flybody_tpu.agents.evaluator import save_video
    from flybody_tpu.rodent_envs import rodent_walk_imitation

    env = rodent_walk_imitation(ref_path=args.ref_path or None)
    clips = env.task.clips
    os.makedirs(args.out_dir, exist_ok=True)
    n = min(args.num_clips, clips.num_clips)
    qpos_all = np.asarray(clips.fields["qpos"])
    lengths = np.asarray(clips.lengths)
    for i in range(n):
        steps = min(args.n_steps, int(lengths[i]))
        print(f"rendering clip {i + 1}/{n} ({steps} frames)...",
              flush=True)
        frames = playback_frames(env, qpos_all[i], steps,
                                 args.width, args.height)
        out = os.path.join(args.out_dir, f"clip_{i}.mp4")
        save_video(np.asarray(frames), out, fps=30)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
