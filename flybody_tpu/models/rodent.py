"""Rodent and humanoid models: dm_control walkers compiled into the engine.

The reference's rodent tasks use the dm_control rodent walker and the
CMU humanoid (reference vnl_ray/tasks/basic_rodent_2020.py:63-120,
:286-320); the walker MJCFs ship with the installed dm_control package.
We compile them host-side over a TPU-native arena (tasks/rodent_arenas.py
— one static heightfield, no per-episode regeneration) and convert with
put_model: the same one-compile-then-pure-JAX pipeline as the fly.
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from flybody_tpu.tasks.rodent_arenas import ArenaMeta, floor_arena


def _attach_arena(root, arena: ArenaMeta):
    """Add the arena geometry (plane or heightfield) to an mjcf root."""
    if arena.hfield_data is None:
        root.worldbody.add("geom", name="floor", type="plane",
                           size=list(arena.size) + [0.1],
                           friction=[1.0, 0.005, 0.0001])
        return None
    nrow, ncol = arena.hfield_data.shape
    hf = root.asset.add("hfield", name="terrain",
                        size=list(arena.hfield_size),
                        nrow=nrow, ncol=ncol)
    root.worldbody.add("geom", name="terrain", type="hfield",
                       hfield=hf, pos=list(arena.hfield_pos))
    # safety plane far below (gap falls land somewhere)
    root.worldbody.add("geom", name="floor", type="plane",
                       pos=[0, 0, -float(arena.hfield_size[2]) - 0.5],
                       size=[100.0, 100.0, 0.1])
    return hf


def _bake_hfield(physics, arena: ArenaMeta):
    if arena.hfield_data is None:
        return
    m = physics.model._model
    nrow, ncol = arena.hfield_data.shape
    adr = m.hfield_adr[0]
    m.hfield_data[adr:adr + nrow * ncol] = \
        arena.hfield_data.reshape(-1).astype(np.float64)


def build_rodent_mj_model(arena: ArenaMeta | None = None,
                          spawn_pos=(0.0, 0.0, 0.06),
                          foot_mods: bool = False):
    """Compile the dm_control rat over an arena -> mjModel."""
    os.environ.setdefault("MUJOCO_GL", "disabled")
    from dm_control import mjcf
    from dm_control.locomotion.walkers import rodent

    arena = arena or floor_arena()
    walker = rodent.Rat(foot_mods=foot_mods)
    root = mjcf.RootElement(model="rodent_arena")
    _attach_arena(root, arena)
    spawn_frame = root.attach(walker.mjcf_model)
    spawn_frame.pos = list(spawn_pos)
    spawn_frame.add("freejoint")
    physics = mjcf.Physics.from_mjcf_model(root)
    _bake_hfield(physics, arena)
    return physics.model._model


def build_humanoid_mj_model(arena: ArenaMeta | None = None,
                            spawn_pos=(0.0, 0.0, 1.2)):
    """Compile the CMU humanoid (position-controlled 2020 variant) over an
    arena -> mjModel (reference walk_humanoid, basic_rodent_2020.py:286)."""
    os.environ.setdefault("MUJOCO_GL", "disabled")
    from dm_control import mjcf
    from dm_control.locomotion import walkers

    arena = arena or floor_arena()
    walker = walkers.CMUHumanoidPositionControlledV2020()
    root = mjcf.RootElement(model="humanoid_arena")
    _attach_arena(root, arena)
    spawn_frame = root.attach(walker.mjcf_model)
    spawn_frame.pos = list(spawn_pos)
    spawn_frame.add("freejoint")
    physics = mjcf.Physics.from_mjcf_model(root)
    _bake_hfield(physics, arena)
    return physics.model._model


def make_rodent_model(arena: ArenaMeta | None = None, dtype=jnp.float32,
                      spawn_pos=(0.0, 0.0, 0.06), foot_mods: bool = False,
                      con_sel: dict | None = None, **put_kwargs):
    """-> (engine Model, mjModel). Drops unsupported collision pairs
    (mesh/cylinder convex pairs) like the fly pipeline does. Extra
    kwargs (contact_solver, fused_sel, ccd_budget) pass to put_model."""
    from flybody_tpu.physics import io_mj

    mj_model = build_rodent_mj_model(arena, spawn_pos=spawn_pos,
                                     foot_mods=foot_mods)
    return io_mj.put_model(mj_model, dtype=dtype, con_sel=con_sel,
                           **put_kwargs), mj_model


def make_humanoid_model(arena: ArenaMeta | None = None, dtype=jnp.float32,
                        con_sel: dict | None = None, **put_kwargs):
    from flybody_tpu.physics import io_mj

    mj_model = build_humanoid_mj_model(arena)
    return io_mj.put_model(mj_model, dtype=dtype, con_sel=con_sel,
                           **put_kwargs), mj_model
