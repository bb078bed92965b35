"""Rodent model: dm_control rat walker compiled into the TPU engine.

The reference's rodent tasks use the dm_control rodent walker (reference
vnl_ray/tasks/basic_rodent_2020.py, rodent_tasks_modified.py); the walker
MJCF ships with the installed dm_control package. We compile it host-side
(composer attach to a simple arena), strip visual meshes from the collision
surface (the rat's collision geoms are primitives), and convert with
put_model — the same one-compile-then-pure-JAX pipeline as the fly.

Round-1 scope: flat-floor locomotion ("run" family). The bowl / gaps /
maze / two-touch arenas land with the full rodent task suite.
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp


def build_rodent_mj_model(floor_size=(10.0, 10.0)):
    """Compile the dm_control rat over a flat floor -> mjModel."""
    os.environ.setdefault("MUJOCO_GL", "disabled")
    from dm_control import mjcf
    from dm_control.locomotion.walkers import rodent

    walker = rodent.Rat()
    root = mjcf.RootElement(model="rodent_arena")
    root.worldbody.add("geom", name="floor", type="plane",
                       size=list(floor_size) + [0.1],
                       friction=[1.0, 0.005, 0.0001])
    spawn = root.worldbody.add("site", pos=[0, 0, 0.05])
    spawn_frame = root.attach(walker.mjcf_model)
    spawn_frame.add("freejoint")
    del spawn
    physics = mjcf.Physics.from_mjcf_model(root)
    return physics.model._model


def make_rodent_model(dtype=jnp.float32):
    """-> (engine Model, mjModel). Drops unsupported collision pairs
    (mesh/ellipsoid convex pairs) like the fly pipeline does."""
    from flybody_tpu.physics import io_mj

    mj_model = build_rodent_mj_model()
    return io_mj.put_model(mj_model, dtype=dtype), mj_model
