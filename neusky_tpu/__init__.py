"""neusky_tpu — a TPU-native (JAX/XLA/Pallas) inverse-rendering framework.

A from-scratch reimplementation of the capabilities of JADGardner/neusky
("The Sky's the Limit": relightable outdoor scenes via a sky-pixel constrained
illumination prior and outside-in visibility), designed TPU-first:

- fixed-shape, jit-compiled ray marching (no dynamic-shape rejection loops)
- multi-resolution hash-grid encoding as an XLA gather / Pallas kernel
- RENI++ illumination prior as batched vmapped decoding
- DDF (directional distance field) visibility fused into the shading pass
- pjit/shard_map data-parallel ray batching over a `jax.sharding.Mesh`

Reference behavioral contracts are cited throughout as
``/root/reference/neusky/<file>:<line>``.
"""

__version__ = "0.1.0"
