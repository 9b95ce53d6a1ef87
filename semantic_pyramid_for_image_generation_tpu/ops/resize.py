"""Resampling ops with exact torch semantics, expressed TPU-first.

The reference uses three interpolation flavors:
  - `nn.UpsamplingBilinear2d(scale_factor=2)` == bilinear, align_corners=True
    (generator upsampling, /root/reference/models.py:52, :298, :308)
  - `F.interpolate(..., mode='bilinear', align_corners=False)` (FID 299x299
    resize, /root/reference/frechet_inception_distance.py:73-77)
  - `F.interpolate(..., mode='nearest')` (mask pyramid broadcast,
    /root/reference/misc.py:55)

TPU-native design: separable interpolation is a pair of small dense matmuls
(out = A_h @ x @ A_w^T per channel) which XLA tiles straight onto the MXU —
no gathers, no dynamic shapes. The interpolation matrices are compile-time
constants cached per (in, out) pair.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# Targeted fused-kernel dispatch (OPTIM.md round-3 experiment): route
# upsamples whose OUTPUT height >= this threshold through the Pallas kernel
# (ops/pallas/resize.py). 0 = einsum everywhere. The round-2 measurement
# replaced ALL eleven sites and lost ~5% to fusion barriers; the round-3
# profile showed the layout copies concentrate at the 256^2-output sites,
# so the threshold targets only those.
_PALLAS_UPSAMPLE_MIN_OUT = int(
    os.environ.get("SPIG_PALLAS_UPSAMPLE_MIN_OUT", "0") or 0)


@functools.lru_cache(maxsize=None)
def _bilinear_matrix_align_corners(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) row-stochastic linear-interpolation matrix, align_corners=True:
    source coordinate of output i is i * (in-1)/(out-1)."""
    a = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        a[:, 0] = 1.0
        return a
    scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
    for i in range(out_size):
        x = i * scale
        x0 = int(np.floor(x))
        x1 = min(x0 + 1, in_size - 1)
        w1 = x - x0
        a[i, x0] += 1.0 - w1
        a[i, x1] += w1
    return a


@functools.lru_cache(maxsize=None)
def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) one-hot matrix for torch 'nearest': src = floor(i * in/out)."""
    a = np.zeros((out_size, in_size), dtype=np.float32)
    src = np.minimum((np.arange(out_size) * in_size // out_size), in_size - 1)
    a[np.arange(out_size), src] = 1.0
    return a


def _apply_separable(x: jax.Array, a_h: np.ndarray, a_w: np.ndarray) -> jax.Array:
    """Apply per-axis (out, in) matrices to NHWC input via einsum/matmul.

    fp32 inputs pin HIGHEST precision (torch-parity mode must be exact
    regardless of the session default); bf16 inputs use the native bf16 MXU
    pass — interpolation weights are short dyadic-ish fractions and the
    surrounding network is bf16 anyway."""
    dtype = x.dtype
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    a_h = jnp.asarray(a_h, dtype)
    a_w = jnp.asarray(a_w, dtype)
    # (B, Hin, Win, C) -> (B, Hout, Win, C) -> (B, Hout, Wout, C).
    # (Measured on TPU: contracting W via swapaxes so both passes share the
    # H-pass form is throughput-neutral at batch 128 — XLA materializes the
    # same layout copies either way; keep the direct form.)
    x = jnp.einsum("oh,bhwc->bowc", a_h, x, precision=prec)
    x = jnp.einsum("ow,bhwc->bhoc", a_w, x, precision=prec)
    return x


def upsample_bilinear_align_corners(x: jax.Array, scale: int = 2) -> jax.Array:
    """`nn.UpsamplingBilinear2d(scale_factor=scale)` on NHWC input.

    Stays on the einsum pair: the fused Pallas kernel
    (ops/pallas/resize.py) is ~17% faster fwd+bwd in ISOLATION at
    128-multiple-channel generator shapes, but inside the full train step it
    is a fusion barrier (XLA can no longer fuse the surrounding CBN/lrelu
    elementwise work into the interp matmuls) and costs ~5% end-to-end
    (207 -> 196 img/s measured at batch 128). Kept as a standalone op.
    """
    _, h, w, _ = x.shape
    if (_PALLAS_UPSAMPLE_MIN_OUT
            and h * scale >= _PALLAS_UPSAMPLE_MIN_OUT
            and x.dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"):
        from semantic_pyramid_for_image_generation_tpu.ops.pallas.resize import (
            upsample_align_corners_pallas,
        )

        return upsample_align_corners_pallas(x, scale)
    return _apply_separable(
        x,
        _bilinear_matrix_align_corners(h, h * scale),
        _bilinear_matrix_align_corners(w, w * scale),
    )


def resize_bilinear_align_corners(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    _, h, w, _ = x.shape
    return _apply_separable(
        x,
        _bilinear_matrix_align_corners(h, out_h),
        _bilinear_matrix_align_corners(w, out_w),
    )


def resize_bilinear_half_pixel(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """torch `align_corners=False` bilinear == jax.image.resize 'linear'
    (both use half-pixel centers). NHWC input.

    antialias=False: torch F.interpolate does not antialias by default, and
    jax.image.resize's default antialias=True widens the kernel when
    downscaling, which would silently break FID parity for inputs > 299.
    """
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, out_h, out_w, c), method="linear",
                            antialias=False)


def interpolate_nearest(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """torch `F.interpolate(mode='nearest')` on NHWC input."""
    _, h, w, _ = x.shape
    return _apply_separable(x, _nearest_matrix(h, out_h), _nearest_matrix(w, out_w))


def interpolate_nearest_np(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Host-side numpy variant for the mask pipeline. x: (H, W)."""
    h, w = x.shape
    rows = np.minimum(np.arange(out_h) * h // out_h, h - 1)
    cols = np.minimum(np.arange(out_w) * w // out_w, w - 1)
    return x[rows][:, cols]
