"""Fused Pallas TPU kernel for separable (bilinear) resampling.

The XLA formulation of the generator's 2x align-corners upsample
(ops/resize.py::_apply_separable) is a pair of einsums; profiling the full
train step showed XLA materializing (B, H, C, W) layout copies around the
W-axis contraction — ~8% of step time at batch 128 across the generator's
eleven upsample sites and their backwards.

This kernel keeps one (H, W, cb) channel slab resident in VMEM and applies
both interpolation matrices as clean 2D MXU matmuls, blocking over OUTPUT
rows (each output-row block reads the rows of `a_h` it needs — no halos,
since the H contraction happens against the full resident input):

    t  = a_h[rows] @ (H, W*cb)          (MXU)  -> (hb, W, cb)
    tt = swap(t)                        (hb, cb, W)   in-VMEM transpose
    y  = (hb*cb, W) @ a_w^T             (MXU)  -> (hb, cb, Wo)
    out = swap(y)                       (hb, Wo, cb)

HBM traffic is read-input (once per row-block) + write-output. The backward
is the same kernel with transposed matrices (custom_vjp):
d/dx [A_h x A_w^T](g) = A_h^T g A_w.

Used by ops/resize.py for the align-corners upsample on TPU in bf16 perf
mode; the einsum path remains the fp32 torch-parity reference and the
non-TPU fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _resize_kernel(ah_ref, awt_ref, x_ref, o_ref):
    x = x_ref[0]                                    # (H, W, cb)
    h, w, cb = x.shape
    hb = ah_ref.shape[0]
    wo = awt_ref.shape[1]
    t = jnp.dot(ah_ref[...], x.reshape(h, w * cb),
                preferred_element_type=jnp.float32)   # (hb, W*cb)
    t = t.astype(x.dtype).reshape(hb, w, cb)
    tt = jnp.swapaxes(t, 1, 2)                      # (hb, cb, W)
    y = jnp.dot(tt.reshape(hb * cb, w), awt_ref[...],
                preferred_element_type=jnp.float32)   # (hb*cb, Wo)
    y = y.astype(o_ref.dtype).reshape(hb, cb, wo)
    o_ref[0] = jnp.swapaxes(y, 1, 2)                # (hb, Wo, cb)


def _resize_kernel_small_c(ah_ref, awt_ref, x_ref, o_ref):
    """cb < 128 variant. The direct (H, W, cb) -> (H, W*cb) collapse mixes a
    PARTIAL lane dim (cb) into sublanes, which Mosaic rejects ('unsupported
    shape cast', hit on the generator's 64-channel final-block upsample).
    Transposing W into lanes first makes every fold land on a full 128-lane
    minor dim — the same legal pattern the 128-slab kernel uses."""
    x = x_ref[0]                                    # (H, W, cb)
    h, w, cb = x.shape
    hb = ah_ref.shape[0]
    wo = awt_ref.shape[1]
    xt = jnp.swapaxes(x, 1, 2)                      # (H, cb, W)  lanes = W
    t = jnp.dot(ah_ref[...], xt.reshape(h, cb * w),
                preferred_element_type=jnp.float32)   # (hb, cb*W)
    t = t.astype(x.dtype).reshape(hb * cb, w)
    y = jnp.dot(t, awt_ref[...],
                preferred_element_type=jnp.float32)   # (hb*cb, Wo)
    y = y.astype(o_ref.dtype).reshape(hb, cb, wo)
    o_ref[0] = jnp.swapaxes(y, 1, 2)                # (hb, Wo, cb)


def _pick_blocks(h: int, w: int, ho: int, wo: int, c: int):
    """(cb, hb): channel slab (== C, or 128-divisible per Mosaic block rules)
    and output-row block keeping the VMEM working set ~<= 8 MB.

    cb: 128-lane slabs for >=128-channel tensors (the direct reshape form);
    smaller tensors keep cb == C and use the transpose-first small-c kernel
    (the direct (H, W, cb) collapse is only legal when cb fills the lanes)."""
    cb = c if c <= 128 else 128
    # small-c kernel holds an extra in-VMEM transpose of the input slab, and
    # the 16 MB scoped-vmem ceiling bit at 16.04 MB — budget conservatively.
    # hb only sets the per-iteration tile: the input block index is constant
    # across the row-block grid dim, so Mosaic re-uses it without re-DMAing.
    x_copies = 1 if cb == 128 else 2
    budget = (8 if cb == 128 else 5) * 1024 * 1024
    hb = ho
    while hb > 8 and 2 * cb * (x_copies * h * w + 2 * hb * w
                               + 2 * hb * wo) > budget:
        hb //= 2
    if 2 * cb * (x_copies * h * w + 2 * hb * w + 2 * hb * wo) > budget:
        # resident input slab alone exceeds VMEM (e.g. the 256^2 x 64
        # DOWNSAMPLE backward of the final-block upsample: 8 MB slab x2
        # copies) — signal the caller to take the einsum path.
        return cb, 0
    return cb, hb


def _forward(x: jax.Array, a_h, a_w) -> jax.Array:
    b, h, w, c = x.shape
    ho, wo = a_h.shape[0], a_w.shape[0]
    cb, hb = _pick_blocks(h, w, ho, wo, c)
    if not hb or c % cb or ho % hb:
        from semantic_pyramid_for_image_generation_tpu.ops.resize import (
            _apply_separable,
        )

        return _apply_separable(x, a_h, a_w)
    ah = jnp.asarray(a_h, x.dtype)
    awt = jnp.asarray(a_w, x.dtype).T
    return pl.pallas_call(
        _resize_kernel if cb == 128 else _resize_kernel_small_c,
        grid=(b, ho // hb, c // cb),
        in_specs=[
            pl.BlockSpec((hb, h), lambda i, j, k: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, wo), lambda i, j, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, cb), lambda i, j, k: (i, 0, 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, wo, cb), lambda i, j, k: (i, j, 0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, c), x.dtype),
        interpret=jax.default_backend() != "tpu",
        cost_estimate=pl.CostEstimate(
            flops=2 * b * c * (ho * h * w + ho * wo * w),
            bytes_accessed=2 * b * c * (h * w * (ho // hb) + ho * wo),
            transcendentals=0,
        ),
    )(ah, awt, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def upsample_align_corners_pallas(x: jax.Array, scale: int = 2) -> jax.Array:
    """nn.UpsamplingBilinear2d(scale_factor=scale) on NHWC via the fused
    kernel; same values as ops/resize.py::upsample_bilinear_align_corners."""
    from semantic_pyramid_for_image_generation_tpu.ops.resize import (
        _bilinear_matrix_align_corners,
    )

    _, h, w, _ = x.shape
    return _forward(x, _bilinear_matrix_align_corners(h, h * scale),
                    _bilinear_matrix_align_corners(w, w * scale))


def _up_fwd(x, scale):
    return upsample_align_corners_pallas(x, scale), None


def _up_bwd(scale, _, g):
    from semantic_pyramid_for_image_generation_tpu.ops.resize import (
        _bilinear_matrix_align_corners,
    )

    _, ho, wo, _ = g.shape
    a_h = _bilinear_matrix_align_corners(ho // scale, ho)
    a_w = _bilinear_matrix_align_corners(wo // scale, wo)
    return (_forward(g, a_h.T, a_w.T),)


upsample_align_corners_pallas.defvjp(_up_fwd, _up_bwd)
