"""Pooling ops (NHWC) with torch semantics.

Used by: VGG16 max pools (/root/reference/models.py:201-204), discriminator
avg-pool downsampling (:406, :451) and global AdaptiveAvgPool2d (:126), the
self-attention KV pooling (:245, :259-260), the semantic-reconstruction loss
max pools (/root/reference/lossfunction.py:20-21, :44-59), and the VGG
classifier's AdaptiveAvgPool2d((7,7)) (:206).

Fixed-window pools lower to `lax.reduce_window` (XLA fuses these well on TPU);
adaptive average pooling is a separable dense matmul onto the MXU like
ops/resize.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# Route large bf16 2x2 max pools through the fused Pallas kernel
# (ops/pallas/pool.py). Measured at batch 128: 200.1 vs 209.4 img/s — the
# kernel is elementwise-exact but a fusion barrier (same failure mode as the
# Pallas resize), so it is OFF by default and ships as a tested standalone op.
_PALLAS_MAXPOOL = int(os.environ.get("SPIG_PALLAS_MAXPOOL", "0") or 0)

# A/B experiment: express the 2x2 pairwise max via strided slices (all 4-d
# shapes, fusible) instead of the 6-d reshape chain. Measured 149.7 img/s at
# batch 128 (minor-dim strided slices are expensive on TPU) — keep 0.
_STRIDED_MAXPOOL = int(os.environ.get("SPIG_STRIDED_MAXPOOL", "0") or 0)

# Keep the XLA reshape/pairwise forward (fuses into its neighbors — no
# Pallas barrier) but replace the autodiff backward (6-d eq/select chains)
# with a custom VJP of 4-d ops: broadcast-up the output and cotangent (the
# proven _avg_pool_2x2_bwd pattern), route g to every window position that
# attained the max, split equally among ties. Measured 211.6 vs 209.4 img/s
# at batch 128 — ON by default for the bf16 TPU perf path.
_MAXPOOL_CUSTOM_VJP = int(os.environ.get("SPIG_MAXPOOL_VJP", "1") or 0)


def _on_tpu() -> bool:
    """Backend gate for the bf16 TPU-only pool paths — a seam so the CPU test
    suite can exercise the eqsplit VJP in the composed bf16 step
    (tests/test_bf16_rewrites.py monkeypatches it)."""
    return jax.default_backend() == "tpu"


def _up2(t: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, 2H, 2W, C) by repeating each cell over its 2x2
    window (exact transpose pattern of _avg_pool_2x2_bwd)."""
    b, h, w, c = t.shape
    t = jnp.broadcast_to(t[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return t.reshape(b, 2 * h, 2 * w, c)


@jax.custom_vjp
def _max_pool_2x2_eqsplit(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.maximum(x[:, :, 0], x[:, :, 1])
    return jnp.maximum(x[:, :, :, 0], x[:, :, :, 1])


def _max_pool_2x2_eqsplit_fwd(x):
    out = _max_pool_2x2_eqsplit(x)
    return out, (x, out)


def _max_pool_2x2_eqsplit_bwd(saved, g):
    # Valid subgradient: cotangent split equally over all positions attaining
    # the window max. Differs from JAX's pairwise-balanced rule only on ties
    # (bf16 perf path only; the fp32 parity path keeps JAX's rule).
    x, out = saved
    eq = (x == _up2(out)).astype(g.dtype)
    cnt = jax.lax.reduce_window(
        eq, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return (eq * _up2(g / cnt),)


_max_pool_2x2_eqsplit.defvjp(_max_pool_2x2_eqsplit_fwd, _max_pool_2x2_eqsplit_bwd)


def max_pool_2d(x: jax.Array, window: int = 2, stride: int | None = None) -> jax.Array:
    """nn.MaxPool2d(window, stride) on NHWC.

    The ubiquitous 2x2/stride-2 case lowers to reshape + pairwise `maximum`
    instead of reduce_window: its gradient is a select (TPU-native) rather
    than select-and-scatter, which TPU cannot lower when a windowed dim lands
    minor-most. Large bf16 pools take the fused Pallas kernel (elementwise
    identical fwd and bwd; see ops/pallas/pool.py)."""
    stride = window if stride is None else stride
    b, h, w, c = x.shape
    if window == 2 and stride == 2 and h % 2 == 0 and w % 2 == 0:
        if (_PALLAS_MAXPOOL
                and x.dtype == jnp.bfloat16
                and _on_tpu()):
            from semantic_pyramid_for_image_generation_tpu.ops.pallas.pool import (
                max_pool_2x2_pallas,
                supported_shape,
            )

            if supported_shape(h, w, c):
                return max_pool_2x2_pallas(x)
        if (_MAXPOOL_CUSTOM_VJP
                and x.dtype == jnp.bfloat16
                and _on_tpu()):
            return _max_pool_2x2_eqsplit(x)
        if _STRIDED_MAXPOOL:
            x = jnp.maximum(x[:, 0::2], x[:, 1::2])      # (b, h/2, w, c)
            return jnp.maximum(x[:, :, 0::2], x[:, :, 1::2])
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = jnp.maximum(x[:, :, 0], x[:, :, 1])      # (b, h/2, w/2, 2, c)
        return jnp.maximum(x[:, :, :, 0], x[:, :, :, 1])
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1), "VALID")


@jax.custom_vjp
def _avg_pool_2x2(x: jax.Array) -> jax.Array:
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return summed * jnp.array(0.25, x.dtype)


def _avg_pool_2x2_fwd(x):
    return _avg_pool_2x2(x), None


def _avg_pool_2x2_bwd(_, g):
    # exact transpose: broadcast each output cotangent over its 2x2 window.
    # XLA's default transpose (pad + reduce_window) materialized 2GB
    # badly-laid-out temps in the discriminator backward at large batch.
    b, h, w, c = g.shape
    g = g * jnp.array(0.25, g.dtype)
    g = jnp.broadcast_to(g[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return (g.reshape(b, 2 * h, 2 * w, c),)


_avg_pool_2x2.defvjp(_avg_pool_2x2_fwd, _avg_pool_2x2_bwd)


def avg_pool_2d(x: jax.Array, window: int = 2, stride: int | None = None) -> jax.Array:
    """nn.AvgPool2d(window, stride) on NHWC. The 2x2/stride-2 case (every
    discriminator downsample) keeps the fast reduce_window forward but uses a
    broadcast custom transpose (see _avg_pool_2x2_bwd)."""
    stride = window if stride is None else stride
    _, h, w, _ = x.shape
    if window == 2 and stride == 2 and h % 2 == 0 and w % 2 == 0:
        return _avg_pool_2x2(x)
    # NOTE: init value must be a Python scalar — an Array init selects the
    # generic variadic reduce_window primitive, which has no transpose rule.
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, window, window, 1), (1, stride, stride, 1), "VALID")
    return summed / jnp.array(window * window, x.dtype)


def max_pool_1d(x: jax.Array, window: int = 2) -> jax.Array:
    """nn.MaxPool1d(window) over the last axis of a (..., L) array.

    Pairwise-maximum form (window 2): reduce_window's gradient would need a
    select-and-scatter with the window on the minor-most dim — unimplemented
    on TPU."""
    length = x.shape[-1]
    if window == 2:
        # torch MaxPool1d 'VALID': odd trailing element is dropped
        even = 2 * (length // 2)
        x = x[..., :even].reshape(x.shape[:-1] + (even // 2, 2))
        return jnp.maximum(x[..., 0], x[..., 1])
    return jax.lax.reduce_window(
        x, -jnp.inf,
        jax.lax.max,
        (1,) * (x.ndim - 1) + (window,), (1,) * (x.ndim - 1) + (window,), "VALID")


@functools.lru_cache(maxsize=None)
def _adaptive_avg_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) averaging matrix with torch AdaptiveAvgPool bin edges:
    bin i covers [floor(i*in/out), ceil((i+1)*in/out))."""
    a = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -((-(i + 1) * in_size) // out_size)  # ceil
        a[i, lo:hi] = 1.0 / (hi - lo)
    return a


def adaptive_avg_pool_2d(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """nn.AdaptiveAvgPool2d((out_h, out_w)) on NHWC."""
    _, h, w, _ = x.shape
    a_h = jnp.asarray(_adaptive_avg_matrix(h, out_h), x.dtype)
    a_w = jnp.asarray(_adaptive_avg_matrix(w, out_w), x.dtype)
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    x = jnp.einsum("oh,bhwc->bowc", a_h, x, precision=prec)
    x = jnp.einsum("ow,bhwc->bhoc", a_w, x, precision=prec)
    return x


def global_avg_pool(x: jax.Array) -> jax.Array:
    """nn.AdaptiveAvgPool2d((1,1)) + flatten on NHWC -> (B, C)."""
    return jnp.mean(x, axis=(1, 2))
