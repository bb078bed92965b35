"""Public environment factories (reference vnl_ray/fly_envs.py parity).

Each factory returns a functional ``FlyEnv`` whose ``reset``/``step``/
``autoreset_step`` are pure, jit-able, and NATIVELY BATCHED (trailing
env axis through the physics engine, batch-leading observations):

    env = walk_on_ball()
    step = jax.jit(env.autoreset_step)
    states = env.reset(jax.random.split(key, 4096))
    states = step(states, actions)
"""

from __future__ import annotations

import jax.numpy as jnp

from flybody_tpu.tasks.walk_on_ball import make_walk_on_ball


def walk_on_ball(claw_friction: float = 1.0, time_limit: float = 2.0,
                 dtype=jnp.float32):
    """Tethered fly walking on a floating ball
    (reference fly_envs.walk_on_ball:125-157)."""
    return make_walk_on_ball(claw_friction=claw_friction,
                             time_limit=time_limit, dtype=dtype)


def template_task(time_limit: float = 1.0, dtype=jnp.float32):
    """No-op walking task for testing (reference fly_envs.template_task)."""
    from flybody_tpu.tasks.template_task import make_template_task
    return make_template_task(time_limit=time_limit, dtype=dtype)


def walk_imitation(ref_path: str | None = None, time_limit: float = 10.0,
                   dtype=jnp.float32):
    """Walking imitation of reference trajectories
    (reference fly_envs.walk_imitation:75-122)."""
    from flybody_tpu.tasks.walk_imitation import make_walk_imitation
    return make_walk_imitation(ref_path=ref_path, time_limit=time_limit,
                               dtype=dtype)


def flight_imitation(ref_path: str | None = None, wpg_pattern_path=None,
                     time_limit: float = 0.6, dtype=jnp.float32):
    """Flight imitation with wing-beat pattern generator
    (reference fly_envs.flight_imitation:29-72)."""
    from flybody_tpu.tasks.flight_imitation import make_flight_imitation
    return make_flight_imitation(ref_path=ref_path,
                                 wpg_pattern_path=wpg_pattern_path,
                                 time_limit=time_limit, dtype=dtype)


def vision_guided_flight(bumps_or_trench: str = "trench",
                         time_limit: float = 0.4, dtype=jnp.float32):
    """Vision-guided flight over procedural terrain
    (reference fly_envs.vision_guided_flight:160-206)."""
    from flybody_tpu.tasks.vision_flight import make_vision_flight
    return make_vision_flight(bumps_or_trench=bumps_or_trench,
                              time_limit=time_limit, dtype=dtype)
