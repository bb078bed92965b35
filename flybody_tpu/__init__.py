"""flybody_tpu: TPU-native fruit-fly / rodent RL framework.

A from-scratch JAX/XLA re-design of the capabilities of talmolab/flybody
(vnl-ray): batched pure-JAX rigid-body physics for the anatomically detailed
fruit-fly model, a jittable task layer, and an on-device distributional-MPO
actor-learner sharded over TPU pod slices.
"""

__version__ = "0.1.0"
