"""Test configuration.

Tests run on CPU with a virtual 8-device mesh (for sharding tests) and with
x64 enabled so the physics engine can be validated against the float64 MuJoCo
oracle. The TPU runtime itself uses f32/bf16; dtype is a build-time knob.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Virtual 8-device CPU mesh for multi-chip sharding tests.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start, overriding the JAX_PLATFORMS env var — without this explicit config
# update every eager test op becomes a ~100 ms round trip through the TPU
# tunnel (the round-1 "unrunnable test suite").
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: oracle tests jit sizable programs; caching
# makes repeated test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
