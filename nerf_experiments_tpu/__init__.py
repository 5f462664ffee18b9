"""TPU-native NeRF experiments framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
sarphiv/nerf-experiments research monorepo (PyTorch/Lightning/nerfacc):
NeRF training with joint camera-pose self-calibration (BARF), integrated
"Mip" encodings, alternative activations (GARF/GaborF/SARF/SIREN), and
multiresolution hash grids (Instant-NGP) — rebuilt as pure jittable
functions over pytrees, shard_map data parallelism over ray batches, and
Pallas kernels for the volume-rendering hot path.

Unlike the reference (14 copy-evolved experiment directories), this is a
single shared library with thin per-experiment configs/entry points.
"""

__version__ = "0.1.0"
