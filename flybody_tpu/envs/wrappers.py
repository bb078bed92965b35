"""Thin functional env wrappers.

The reference wraps dm_env environments for precision casting and vision
removal (reference vnl_ray/wrapper.py, single_precision.py). Precision is
a build-time dtype knob here (the engine is natively float32 with float64
reserved for oracle tests), so only the observation-filtering wrapper has
a runtime analog.
"""

from __future__ import annotations


class DropObservations:
    """Remove observation keys from an env (reference RemoveVisionWrapper,
    vnl_ray/wrapper.py:92-108 — used to train blind policies on vision
    tasks). Delegates everything else to the wrapped env."""

    def __init__(self, env, keys):
        self._env = env
        self._drop = tuple(keys)

    def __getattr__(self, name):
        return getattr(self._env, name)

    def _filter(self, state):
        obs = {k: v for k, v in state.obs.items() if k not in self._drop}
        return state.replace(obs=obs)

    def reset(self, rng):
        return self._filter(self._env.reset(rng))

    def step(self, state, action):
        return self._filter(self._env.step(state, action))

    def autoreset_step(self, state, action):
        return self._filter(self._env.autoreset_step(state, action))


def remove_vision(env):
    """Drop eye/camera observations (fly stereo eyes or the rodent
    egocentric camera)."""
    return DropObservations(env, ("left_eye", "right_eye",
                                  "egocentric_camera"))
