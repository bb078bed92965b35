"""Rodent & humanoid environment factories (reference
vnl_ray/tasks/basic_rodent_2020.py parity).

Each factory returns a functional ``FlyEnv`` (the engine's batched env
shell) over the dm_control rat or CMU humanoid compiled into the pure-JAX
physics engine:

    env = rodent_run_gaps()
    states = env.reset(jax.random.split(key, B))
    states = jax.jit(env.autoreset_step)(states, actions)
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from flybody_tpu.envs.core import FlyEnv
from flybody_tpu.envs.rodent_walker import RodentWalker
from flybody_tpu.models import rodent as rm
from flybody_tpu.tasks import rodent_arenas as ra
from flybody_tpu.tasks import rodent_tasks as rt

# active contact islands: the rat stands on <=8 ground contacts with a
# handful of condim-1 self contacts; K bounds the solver rows per env.
_CON_SEL = {1: 8, 3: 24}
# fused production solver for all rodent envs (round 4): top-16 limit
# rows (67 limited joints, few near violation at once) + top-24 cones
# across the floor/self-collision groups; the rat's 1515 convex
# candidate pairs gate to 64 ccd lanes per env.
_FUSED = dict(contact_solver="fused", fused_sel=(16, 24), ccd_budget=64,
              col_refresh=10)


def rodent_escape_bowl(time_limit: float = 20.0, dtype=jnp.float32,
                       seed: int = 0, use_vision: bool = False):
    """Climb out of a bowl-shaped terrain (reference
    basic_rodent_2020.py:60-83)."""
    arena = ra.bowl_arena(size=20.0, seed=seed)
    model, mj = rm.make_rodent_model(arena, dtype=dtype,
                                     spawn_pos=(0.0, 0.0, 0.06),
                                     con_sel=_CON_SEL, **_FUSED)
    walker = RodentWalker(model)
    task = rt.EscapeBowl(walker, terrain_size=20.0, time_limit=time_limit,
                         use_vision=use_vision)
    return FlyEnv(model, task, mj_model=mj, dtype=dtype)


def rodent_run_gaps(time_limit: float = 30.0, contact_termination=True,
                    dtype=jnp.float32, seed: int = 0,
                    use_vision: bool = False):
    """Run down a corridor with gaps (reference
    basic_rodent_2020.py:86-121)."""
    arena = ra.gaps_corridor(seed=seed)
    model, mj = rm.make_rodent_model(arena, dtype=dtype,
                                     spawn_pos=(5.0, 0.0, 0.06),
                                     con_sel=_CON_SEL, **_FUSED)
    walker = RodentWalker(model)
    task = rt.RunThroughCorridor(
        walker, spawn_position=(5.0, 0.0), target_velocity=1.0,
        contact_termination=contact_termination,
        terminate_at_height=-0.3, time_limit=time_limit,
        use_vision=use_vision)
    return FlyEnv(model, task, mj_model=mj, dtype=dtype)


def rodent_maze_forage(time_limit: float = 30.0, dtype=jnp.float32,
                       seed: int = 0, use_vision: bool = False):
    """Find all targets in a maze (reference
    basic_rodent_2020.py:124-185)."""
    arena = ra.random_maze(seed=seed)
    model, mj = rm.make_rodent_model(arena, dtype=dtype,
                                     spawn_pos=(0.0, 0.0, 0.06),
                                     con_sel=_CON_SEL, **_FUSED)
    walker = RodentWalker(model)
    task = rt.ManyGoalsMaze(
        walker, spawn_positions=arena.spawn_positions,
        target_positions=arena.target_positions,
        target_reward_scale=50.0, time_limit=time_limit,
        use_vision=use_vision)
    return FlyEnv(model, task, mj_model=mj, dtype=dtype)


def rodent_two_touch(time_limit: float = 30.0, dtype=jnp.float32,
                     use_vision: bool = False):
    """Tap an orb, wait an interval, tap it again (reference
    basic_rodent_2020.py:188-222)."""
    arena = ra.floor_arena(size=(10.0, 10.0))
    model, mj = rm.make_rodent_model(arena, dtype=dtype,
                                     spawn_pos=(0.0, 0.0, 0.06),
                                     con_sel=_CON_SEL, **_FUSED)
    walker = RodentWalker(model)
    task = rt.TwoTouch(walker, target_area=(1.5, 1.5),
                       target_type_reward=25.0, time_limit=time_limit,
                       use_vision=use_vision)
    return FlyEnv(model, task, mj_model=mj, dtype=dtype)


def rodent_walk_imitation(ref_path: str | None = None,
                          termination_error_threshold: float = 0.12,
                          time_limit: float = 10.0, dtype=jnp.float32):
    """Multi-clip rodent mocap tracking (reference
    basic_rodent_2020.py:225-283 + tracking_old.py MultiClipMocapTracking).

    With ref_path=None, synthetic walking clips stand in for the STAC
    dataset (the reference snapshot ships no mocap data)."""
    from flybody_tpu.tasks import tracking as trk

    arena = ra.floor_arena()
    model, mj = rm.make_rodent_model(arena, dtype=dtype, foot_mods=True,
                                     spawn_pos=(0.0, 0.0, 0.06),
                                     con_sel=_CON_SEL, **_FUSED)
    walker = RodentWalker(model)
    if ref_path is None:
        clips = trk.synthetic_clips(model, walker, num_clips=3, length=120)
    else:
        clips = trk.load_hdf5_clips(model, walker, ref_path)
    task = trk.MultiClipTracking(
        walker, clips, ref_steps=(1, 2, 3, 4, 5),
        termination_error_threshold=termination_error_threshold,
        reward_key="comic", tuning="rodent", min_steps=1,
        time_limit=time_limit, ctrl_dt=0.02, phys_dt=0.001)
    return FlyEnv(model, task, mj_model=mj, dtype=dtype)


def walk_humanoid(ref_path: str | None = None,
                  termination_error_threshold: float = 0.3,
                  time_limit: float = 10.0, dtype=jnp.float32):
    """CMU humanoid multi-clip mocap tracking (reference
    basic_rodent_2020.py:286-337)."""
    from flybody_tpu.envs.humanoid_walker import HumanoidWalker
    from flybody_tpu.tasks import tracking as trk

    arena = ra.floor_arena()
    model, mj = rm.make_humanoid_model(arena, dtype=dtype,
                                       con_sel={1: 8, 3: 24},
                                       **{**_FUSED, "col_refresh": 3})
    walker = HumanoidWalker(model)
    if ref_path is None:
        clips = trk.synthetic_clips(model, walker, num_clips=2, length=120)
    else:
        clips = trk.load_hdf5_clips(model, walker, ref_path)
    task = trk.MultiClipTracking(
        walker, clips, ref_steps=(1, 2, 3, 4, 5),
        termination_error_threshold=termination_error_threshold,
        reward_key="comic", tuning="fly", min_steps=1,
        time_limit=time_limit, ctrl_dt=0.03, phys_dt=0.005)
    return FlyEnv(model, task, mj_model=mj, dtype=dtype)
