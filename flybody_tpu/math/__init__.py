"""Math core: batched quaternion / spatial algebra in JAX."""

from flybody_tpu.math import quaternions
