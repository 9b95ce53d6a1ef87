"""VGG-16 feature-pyramid extractor (/root/reference/models.py:158-216), NHWC.

Returns the 7-level semantic pyramid: activations after each of the 5 max pools
(shallow->deep), the fc7 output (classifier index 3, pre-ReLU) and the fc8
logits (classifier index 6) — or just the logits when `return_output=True`
(used by the VGG fine-tune/inference scripts, /root/reference/vgg_16_train.py).

Input contract matches the reference exactly, including the documented
normalization quirk (SURVEY.md 2.8.3): inputs arrive per-image min-max
normalized to [-1, 1] and are then ImageNet-standardized (models.py:195-197).

Module names mirror torchvision indices (features_0 ... classifier_6) so `.pt`
checkpoints (main.py:61) convert mechanically; see utils/pt_interop.py.
"""

from __future__ import annotations

from typing import List, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
from semantic_pyramid_for_image_generation_tpu.models.layers import matmul_precision
from semantic_pyramid_for_image_generation_tpu.ops.pool import (
    adaptive_avg_pool_2d,
    max_pool_2d,
)

# torchvision vgg16 feature plan: (layer index, out channels) for convs, 'M' pools.
_VGG16_PLAN = [
    (0, 64), (2, 64), "M",
    (5, 128), (7, 128), "M",
    (10, 256), (12, 256), (14, 256), "M",
    (17, 512), (19, 512), (21, 512), "M",
    (24, 512), (26, 512), (28, 512), "M",
]

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


class _InputConv(nn.Module):
    """First VGG conv with the RGB input zero-padded to 8 channels.

    Identical math (zero channels contribute nothing; the padded kernel rows
    are zeros), same param pytree as nn.Conv ({kernel, bias}, so `.pt`
    conversion is unchanged), but the backward-to-input conv — the gradient
    into the generated images — tiles far better than a 3-channel one (the
    single largest op waste in the step profile, ~7 ms at batch 128)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, in_ch, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        grow = max(0, 8 - in_ch)
        kp = kernel.astype(self.dtype)
        if grow:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, grow)))
            kp = jnp.pad(kp, ((0, 0), (0, 0), (0, grow), (0, 0)))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kp, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=matmul_precision(self.dtype))
        return y + bias.astype(self.dtype)


class VGG16(nn.Module):
    config: PyramidGANConfig = PyramidGANConfig()
    return_output: bool = False

    @property
    def dtype(self):
        return jnp.dtype(self.config.compute_dtype)

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False
                 ) -> Union[jax.Array, List[jax.Array]]:
        cfg = self.config
        f = cfg.vgg_width_factor
        dtype = self.dtype
        x = images
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        mean = jnp.asarray(_IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(_IMAGENET_STD, jnp.float32)
        x = ((x.astype(jnp.float32) - mean) / std).astype(dtype)

        features: List[jax.Array] = []
        for item in _VGG16_PLAN:
            if item == "M":
                x = max_pool_2d(x, 2)
                features.append(x)
            else:
                idx, ch = item
                if idx == 0:
                    x = _InputConv(ch // f, dtype=dtype,
                                   name="features_0")(x)
                else:
                    x = nn.Conv(
                        ch // f, (3, 3), padding=1, dtype=dtype,
                        precision=matmul_precision(dtype),
                        name=f"features_{idx}")(x)
                x = nn.relu(x)

        x = adaptive_avg_pool_2d(x, 7, 7)
        # torch flattens (B, C, 7, 7) channel-major; match for fc-weight interop.
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        x = nn.Dense(4096 // f, dtype=dtype, precision=matmul_precision(dtype), name="classifier_0")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(4096 // f, dtype=dtype, precision=matmul_precision(dtype), name="classifier_3")(x)
        x = nn.relu(x)
        # fc7 tap: the reference appends classifier[3]'s output, but the next
        # torchvision ReLU is inplace=True and mutates the tapped tensor —
        # the pyramid's fc7 level is effectively ReLU(fc7) (verified against
        # the live reference; models.py:210-213).
        features.append(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(cfg.num_classes, dtype=dtype, precision=matmul_precision(dtype), name="classifier_6")(x)
        features.append(x)  # fc8 logits
        if self.return_output:
            return x
        return features
