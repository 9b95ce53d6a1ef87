"""SAGAN-style projection discriminator (/root/reference/models.py:102-155), NHWC.

Input residual block 3->64, six downsampling residual blocks
64->128->256->[SelfAttention]->256->256->512->768, lrelu, global average pool,
SN-Linear 768->128, lrelu; then SN-Linear 128->1 head plus spectrally-normalized
class embedding projection.

`compat_projection=True` (default) reproduces the reference's broadcast quirk
where the output is (B, B, 128) instead of a (B, 1) score
(/root/reference/models.py:151-155; SURVEY.md 2.8.1 — the LSGAN losses mean
over all elements, so training is well-defined either way).
`compat_projection=False` computes the canonical summed inner product.

Parameter count parity with the reference: 16,820,994 (verified by test).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
from semantic_pyramid_for_image_generation_tpu.models.layers import (
    DiscriminatorInputResidualBlock,
    DiscriminatorResidualBlock,
    SelfAttention,
    SNDense,
    SNEmbedding,
    lrelu,
)
from semantic_pyramid_for_image_generation_tpu.ops.pool import global_avg_pool


class Discriminator(nn.Module):
    config: PyramidGANConfig = PyramidGANConfig()
    use_pallas_attention: bool = False

    @property
    def dtype(self):
        return jnp.dtype(self.config.compute_dtype)

    @nn.compact
    def __call__(self, images: jax.Array, class_onehot: jax.Array,
                 train: bool = True) -> jax.Array:
        cfg = self.config
        dtype = self.dtype
        x = images.astype(dtype)
        blocks = cfg.discriminator_block_channels
        input_cls = DiscriminatorInputResidualBlock
        block_cls = DiscriminatorResidualBlock
        if cfg.remat_blocks:
            input_cls = nn.remat(input_cls, static_argnums=(2,))
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        x = input_cls(blocks[0][1], dtype=dtype, name="block_0")(x, train)
        attn_after = 2  # SelfAttention after the 256-channel block (models.py:120)
        for i, (_cin, cout) in enumerate(blocks[1:], start=1):
            x = block_cls(cout, dtype=dtype, name=f"block_{i}")(x, train)
            if i == attn_after:
                x = SelfAttention(
                    cout, use_pallas=self.use_pallas_attention, dtype=dtype,
                    name="self_attention")(x, train)
        x = lrelu(x)
        x = global_avg_pool(x)
        x = SNDense(128, dtype=dtype, name="linear")(x, train)
        x = lrelu(x)

        idx = jnp.argmax(class_onehot, axis=-1, keepdims=True)  # (B, 1)
        emb = SNEmbedding(cfg.num_classes, 128, dtype=dtype, name="embedding")(
            idx, train)  # (B, 1, 128)
        score = SNDense(1, dtype=dtype, name="classification")(x, train)  # (B, 1)
        if cfg.compat_projection:
            # torch broadcast: (B,128)*(B,1,128) -> (B,B,128); + (B,1) -> (B,B,128)
            return score + x * emb
        proj = jnp.sum(x * emb[:, 0, :], axis=-1, keepdims=True)
        return score + proj
