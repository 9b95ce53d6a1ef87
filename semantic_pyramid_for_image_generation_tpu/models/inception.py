"""InceptionV3 (torchvision architecture) in Flax/NHWC for FID.

The reference computes FID from the Mixed_7c activation of a pretrained
torchvision inception_v3, global-average-pooled to 2048 features
(/root/reference/frechet_inception_distance.py:12-42). This is a faithful
architectural rebuild; weights convert from a torchvision state dict via
`utils.pt_interop`-style mapping (`convert_inception_state_dict` below), since
the TPU host has no torchvision and no network egress.

Structure (torchvision `Inception3`, transform_input=False):
  Conv2d_1a..Conv2d_4a + 2 max pools -> Mixed_5b,5c,5d (InceptionA)
  -> Mixed_6a (B) -> Mixed_6b..6e (C) -> Mixed_7a (D) -> Mixed_7b,7c (E)
BasicConv2d = conv(bias-free) + BatchNorm(eps=1e-3, eval) + relu.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from semantic_pyramid_for_image_generation_tpu.ops.pool import global_avg_pool


def _max_pool_3x3_s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _avg_pool_3x3_s1_p1(x):
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, 3, 3, 1), (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    # torch AvgPool2d(3, 1, 1) divides by 9 everywhere (count_include_pad=True)
    return summed / jnp.array(9, x.dtype)


class BasicConv2d(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = [(self.padding[0],) * 2, (self.padding[1],) * 2]
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=pad, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        # eval-mode BN folded to scale/shift with running stats, eps 1e-3
        c = self.features
        scale = self.param("bn_scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bn_bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((c,), jnp.float32))
        inv = jax.lax.rsqrt(var.value + 1e-3) * scale
        x = (x.astype(jnp.float32) - mean.value) * inv + bias
        return nn.relu(x).astype(self.dtype)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(64, (1, 1), dtype=d, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=d, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), dtype=d,
                         name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d,
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d,
                         name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_s1_p1(x)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=d,
                         name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), dtype=d,
                         name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d,
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), dtype=d,
                         name="branch3x3dbl_3")(bd)
        bp = _max_pool_3x3_s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d, c7 = self.dtype, self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=d, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_s1_p1(x)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(192, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), dtype=d,
                         name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=d, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), dtype=d,
                         name="branch7x7x3_4")(b7)
        bp = _max_pool_3x3_s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(320, (1, 1), dtype=d, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d,
                          name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d,
                          name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), dtype=d,
                         name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d,
                          name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d,
                          name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _avg_pool_3x3_s1_p1(x)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Runs the backbone through Mixed_7c and returns pooled 2048-d FID
    activations (the reference hook + adaptive pool, fid.py:26-42)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = self.dtype
        x = x.astype(d)
        x = BasicConv2d(32, (3, 3), strides=(2, 2), dtype=d,
                        name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), dtype=d,
                        name="Conv2d_2b_3x3")(x)
        x = _max_pool_3x3_s2(x)
        x = BasicConv2d(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x)
        x = _max_pool_3x3_s2(x)
        x = InceptionA(32, dtype=d, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5d")(x)
        x = InceptionB(dtype=d, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=d, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=d, name="Mixed_6e")(x)
        x = InceptionD(dtype=d, name="Mixed_7a")(x)
        x = InceptionE(dtype=d, name="Mixed_7b")(x)
        x = InceptionE(dtype=d, name="Mixed_7c")(x)
        return global_avg_pool(x).astype(jnp.float32)  # (B, 2048)


def convert_inception_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """torchvision inception_v3 state dict -> flax variables for
    InceptionV3Features. Ignores AuxLogits / fc (not used for FID)."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def to_np(t):
        return np.array(t.detach().cpu().numpy(), dtype=np.float32, copy=True)

    names = {k for k in sd if k.endswith("conv.weight")}
    for key in names:
        prefix = key[: -len("conv.weight")].rstrip(".")  # e.g. Mixed_5b.branch1x1
        if prefix.startswith("AuxLogits"):
            continue
        parts = prefix.split(".")
        node_p, node_b = params, batch_stats
        for p in parts:
            node_p = node_p.setdefault(p, {})
            node_b = node_b.setdefault(p, {})
        w = to_np(sd[f"{prefix}.conv.weight"])
        node_p["conv"] = {"kernel": w.transpose(2, 3, 1, 0)}
        node_p["bn_scale"] = to_np(sd[f"{prefix}.bn.weight"])
        node_p["bn_bias"] = to_np(sd[f"{prefix}.bn.bias"])
        node_b["mean"] = to_np(sd[f"{prefix}.bn.running_mean"])
        node_b["var"] = to_np(sd[f"{prefix}.bn.running_var"])
    return {"params": params, "batch_stats": batch_stats}
