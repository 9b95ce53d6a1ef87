"""Semantic-pyramid generator (/root/reference/models.py:10-99), NHWC.

Pipeline: SN-Linear latent->latent; LinearBlock injecting masked fc8; LinearBlock
injecting masked fc7 (-> 2048); reshape to 4x4x128; lrelu + SN-1x1 to 512ch;
five upsampling GeneratorResidualBlocks consuming masked pool5..pool1 (with the
1-channel mask concatenated, models.py:94) and one SelfAttention at 32x32/256ch;
final block (up2x -> BN -> lrelu -> SN3x3 -> lrelu -> SN1x1) and tanh.

Parameter count parity with the reference: 29,967,047 (verified by test).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
from flax import linen as nn

from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
from semantic_pyramid_for_image_generation_tpu.models.layers import (
    BatchNorm,
    GeneratorResidualBlock,
    LinearBlock,
    SelfAttention,
    SNConv,
    SNDense,
    lrelu,
)


class Generator(nn.Module):
    config: PyramidGANConfig = PyramidGANConfig()
    use_pallas_attention: bool = False

    @property
    def dtype(self):
        return jnp.dtype(self.config.compute_dtype)

    @nn.compact
    def __call__(
        self,
        latent: jax.Array,
        features: List[jax.Array],
        masks: List[jax.Array],
        class_onehot: jax.Array,
        train: bool = True,
    ) -> jax.Array:
        cfg = self.config
        dtype = self.dtype
        assert len(features) == 7 and len(masks) == 7
        depth = 6  # walk deep (fc8) -> shallow (pool1), models.py:74

        x = SNDense(cfg.latent_dim, dtype=dtype, name="linear_layer")(
            latent.astype(dtype), train)
        x = LinearBlock(cfg.num_classes, dtype=dtype, name="linear_block_1")(
            x, (features[depth] * masks[depth]).astype(dtype), train)
        depth -= 1
        x = LinearBlock(2048, dtype=dtype, name="linear_block_2")(
            x, (features[depth] * masks[depth]).astype(dtype), train)
        depth -= 1
        b = x.shape[0]
        # torch view (B, 128, 4, 4) from the 2048-vector, then to NHWC with the
        # same element correspondence (models.py:83).
        x = x.reshape(b, 128, 4, 4).transpose(0, 2, 3, 1)
        x = SNConv(cfg.generator_block_channels[0][0], kernel_size=(1, 1),
                   padding=0, dtype=dtype, name="convolution_layer")(lrelu(x), train)

        attn_after = 2  # SelfAttention sits after the third block (models.py:44)
        block_cls = GeneratorResidualBlock
        if cfg.remat_blocks:
            block_cls = nn.remat(block_cls, static_argnums=(4,))
        for i, (_cin, cout) in enumerate(cfg.generator_block_channels):
            feat = features[depth].astype(dtype)
            mask = masks[depth].astype(dtype)
            # channel groups of the reference's cat([feat*mask, mask], dim=1)
            # (models.py:94); SNConv sums per-group convs — same math, no
            # (C+1)-channel concat materialized, MXU-clean channel counts
            masked = (feat * mask, mask)
            x = block_cls(
                in_channels=x.shape[-1], out_channels=cout,
                num_classes=cfg.num_classes, dtype=dtype,
                name=f"block_{i}")(x, masked, class_onehot, train)
            depth -= 1
            if i == attn_after:
                x = SelfAttention(
                    cout, use_pallas=self.use_pallas_attention, dtype=dtype,
                    name="self_attention")(x, train)

        from semantic_pyramid_for_image_generation_tpu.ops.resize import (
            upsample_bilinear_align_corners,
        )
        x = upsample_bilinear_align_corners(x, 2)
        x = BatchNorm(x.shape[-1], dtype=dtype, name="final_bn")(x, train)
        x = lrelu(x)
        x = SNConv(x.shape[-1], dtype=dtype, name="final_conv_1")(x, train)
        x = lrelu(x)
        x = SNConv(cfg.out_channels, kernel_size=(1, 1), padding=0, dtype=dtype,
                   name="final_conv_2")(x, train)
        return jnp.tanh(x)

    def sample_latent(self, key: jax.Array, batch: int) -> jax.Array:
        return jax.random.normal(key, (batch, self.config.latent_dim), jnp.float32)
