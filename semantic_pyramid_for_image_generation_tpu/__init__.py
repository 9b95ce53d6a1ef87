"""TPU-native JAX framework with the capabilities of *Semantic Pyramid for Image
Generation* (arXiv:2003.06221; reference PyTorch implementation by Christoph Reich).

The package is a ground-up JAX/XLA/Pallas redesign, NOT a port:

- NHWC layouts everywhere (TPU-native), bfloat16 compute with float32 params.
- Spectral norm, (conditional) batch norm, and RNG are *functional state* threaded
  through pure jitted train steps (reference mutates buffers in-place).
- Bilinear/adaptive resampling is expressed as dense interpolation matmuls that map
  onto the MXU instead of gather loops.
- Data parallelism is a `jax.sharding.Mesh` + jit/GSPMD sharding (reference uses
  single-process `nn.DataParallel`, /root/reference/main.py:91-94).
- The SAGAN pooled-KV self-attention has a fused Pallas TPU kernel.

Subpackages:
    ops       -- core numerical ops (spectral norm, resize, pooling, attention, Pallas)
    models    -- Generator / Discriminator / VGG16 / InceptionV3 (Flax)
    data      -- Places365 pipeline + semantic mask schedules
    train     -- losses, train state, fused G/D train step, training loop
    eval      -- FID and sample-grid inference
    parallel  -- mesh / sharding helpers
    utils     -- logging, torch `.pt` interop
    cli       -- reference-flag-compatible entry points
"""

__version__ = "0.1.0"

from semantic_pyramid_for_image_generation_tpu.config import (  # noqa: F401
    PyramidGANConfig,
)
