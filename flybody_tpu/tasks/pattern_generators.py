"""Wing-beat pattern generator (WBPG) as device tables + index arithmetic.

JAX re-design of the reference WingBeatPatternGenerator (reference
vnl_ray/tasks/pattern_generators.py:77-191): 201 frequency variants of a
cyclic wing-beat sequence are precomputed host-side (repeat counts chosen
to minimize cycle-boundary phase error, identical algorithm), padded into
one (num_freqs, max_len, 6) device table. ``reset``/``step`` are pure
functions over a small WBPGState pytree — fully jittable, vmappable over
thousands of flies.

A synthetic one-cycle drosophila-like base pattern ships with the framework
(the reference's .npy data file is external); real data can be passed in.
"""

from __future__ import annotations


import numpy as np

import jax
import jax.numpy as jnp

from flybody_tpu.physics.types import pytree
from flybody_tpu.tasks import constants as C


def synthetic_base_pattern(n: int = 100) -> np.ndarray:
    """One wing-beat cycle (n, 3): yaw (stroke), roll (deviation),
    pitch (rotation). Amplitudes/phases approximate published drosophila
    kinematics about the model's wing springrefs."""
    t = np.linspace(0.0, 1.0, n, endpoint=False)
    yaw = 1.25 * np.cos(2 * np.pi * t)
    roll = 0.25 * np.sin(4 * np.pi * t) + 0.1
    pitch = -0.45 + 1.0 * np.sin(2 * np.pi * t + 0.65)
    return np.stack([yaw, roll, pitch], axis=-1).astype(np.float32)


@pytree(meta=())
class WBPGState:
    freq_idx: jax.Array   # int32
    step: jax.Array       # int32 position in current sequence
    ctrl_freq: jax.Array  # filtered requested frequency, Hz


class WingBeatPatternGenerator:
    """Host-precomputed tables + pure reset/step functions."""

    def __init__(self, base_pattern: np.ndarray | None = None,
                 base_beat_freq: float = C.WING_PARAMS["base_freq"],
                 rel_freq_range: float = C.WING_PARAMS["rel_freq_range"],
                 num_freqs: int = C.WING_PARAMS["num_freqs"],
                 min_repeats: int = 10, max_repeats: int = 20,
                 dt_ctrl: float = C.FLY_CONTROL_TIMESTEP,
                 ctrl_filter: float = 0.5 / C.WING_PARAMS["base_freq"]):
        if base_pattern is None:
            base_pattern = synthetic_base_pattern()
        base_pattern = np.tile(base_pattern, (1, 2))  # both wings
        self.base_beat_freq = base_beat_freq
        self.dt_ctrl = dt_ctrl
        self.ctrl_filter = ctrl_filter
        self.rate = np.exp(-dt_ctrl / ctrl_filter) if ctrl_filter else 0.0
        self.beat_freqs = np.linspace((1 - rel_freq_range) * base_beat_freq,
                                      (1 + rel_freq_range) * base_beat_freq,
                                      num_freqs)

        trajs, phases, lens = [], [], []
        for beat_freq in self.beat_freqs:
            beat_time = 1.0 / beat_freq
            reps = np.arange(min_repeats, max_repeats + 1)
            rel_error = ((reps * beat_time) % dt_ctrl) / dt_ctrl
            a1 = int(np.argmin(rel_error))
            a2 = int(np.argmin(np.abs(1 - rel_error)))
            if rel_error[a1] < np.abs(1 - rel_error[a2]):
                n_reps, shift = int(reps[a1]), dt_ctrl
            else:
                n_reps, shift = int(reps[a2]), 0.0
            repeated = np.tile(base_pattern, (n_reps, 1))
            phase = np.linspace(0, n_reps, repeated.shape[0], endpoint=False)
            dt_data = beat_time / base_pattern.shape[0]
            duration = repeated.shape[0] * dt_data
            t_data = np.linspace(0, duration, repeated.shape[0])
            t_ctrl = np.arange(0, duration - shift, dt_ctrl)
            traj = np.stack([np.interp(t_ctrl, t_data, repeated[:, i])
                             for i in range(repeated.shape[1])], axis=-1)
            trajs.append(traj.astype(np.float32))
            phases.append(np.interp(t_ctrl, t_data, phase).astype(np.float32))
            lens.append(traj.shape[0])

        max_len = max(lens)
        self.n_angles = trajs[0].shape[1]
        table = np.zeros((num_freqs, max_len, self.n_angles), np.float32)
        ptable = np.full((num_freqs, max_len), 1e9, np.float32)
        for i, (tr, ph) in enumerate(zip(trajs, phases)):
            table[i, :len(tr)] = tr
            if len(tr) < max_len:
                # cyclic fill keeps padded reads on-pattern (never indexed
                # in steady state: step wraps at cycle_len)
                idx = np.arange(len(tr), max_len) % len(tr)
                table[i, len(tr):] = tr[idx]
            ptable[i, :len(ph)] = ph
        self.table = jnp.asarray(table)
        self.phase_table = jnp.asarray(ptable)
        self.cycle_len = jnp.asarray(np.asarray(lens, np.int32))
        self.beat_freqs_j = jnp.asarray(self.beat_freqs.astype(np.float32))

    def reset(self, ctrl_freq=None, initial_phase=0.0):
        """-> (angles (6,), qvel (6,), WBPGState). Pure."""
        f = jnp.asarray(self.base_beat_freq if ctrl_freq is None
                        else ctrl_freq, jnp.float32)
        idx = jnp.argmin(jnp.abs(self.beat_freqs_j - f))
        step = jnp.argmin(jnp.abs(jnp.asarray(initial_phase)
                                  - self.phase_table[idx]))
        angles = self.table[idx, step]
        nxt = self.table[idx, (step + 1) % self.cycle_len[idx]]
        qvel = (nxt - angles) / self.dt_ctrl
        return angles, qvel, WBPGState(
            freq_idx=idx.astype(jnp.int32), step=step.astype(jnp.int32),
            ctrl_freq=f)

    def step(self, state: WBPGState, ctrl_freq):
        """-> (angles (6,), new state). Pure; phase-continuous freq switch."""
        step = (state.step + 1) % self.cycle_len[state.freq_idx]
        f = jnp.where(self.ctrl_filter == 0.0, ctrl_freq,
                      state.ctrl_freq * self.rate
                      + ctrl_freq * (1.0 - self.rate)
                      ).astype(state.ctrl_freq.dtype)
        idx_new = jnp.argmin(jnp.abs(self.beat_freqs_j - f)).astype(jnp.int32)
        changed = idx_new != state.freq_idx
        cur_phase = self.phase_table[state.freq_idx, step] % 1.0
        step_new = jnp.argmin(
            jnp.abs(cur_phase - self.phase_table[idx_new] % 1.0)
        ).astype(jnp.int32)
        step = jnp.where(changed, step_new, step)
        idx = jnp.where(changed, idx_new, state.freq_idx)
        angles = self.table[idx, step]
        return angles, WBPGState(freq_idx=idx, step=step, ctrl_freq=f)
