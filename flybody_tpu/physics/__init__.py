"""TPU-native rigid-body physics engine (MuJoCo-semantics, pure JAX).

Public API:
    Model, Data       — pytree types
    put_model         — compile host-side (mujoco C compiler) -> Model
    make_data         — fresh state
    step, forward     — pure stepping functions (jit/vmap/scan-able)
"""

from flybody_tpu.physics.types import Model, Data, Contact, Option
from flybody_tpu.physics.io_mj import put_model, make_data
from flybody_tpu.physics import forward as _forward_mod
from flybody_tpu.physics.forward import step

forward_dynamics = _forward_mod.forward
