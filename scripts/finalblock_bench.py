"""Microbench: G final-block chain (up2 -> BN -> lrelu -> 3x3 conv) fwd+bwd.

profile_step (round 3, post-folds) shows ~4.5% of the step in layout copies
+ reduces around this chain: the BN stats reduce over the 1.07 GB upsampled
tensor makes XLA relayout it twice ({3,1,2,0} <-> {0,2,3,1}) per G forward.
Hypothesis: computing the BN statistics of up2(x) FROM x (exact algebra —
mean via interp-matrix column sums, E[y^2] via the tridiagonal Gram matrices
G = A^T A) removes the big-tensor reduce and with it the layout conflict.

Usage: python scripts/finalblock_bench.py [--batch 128] [--iters 5]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from semantic_pyramid_for_image_generation_tpu.ops.resize import (
    _bilinear_matrix_align_corners,
    upsample_bilinear_align_corners,
)


def sync(x):
    jax.device_get(jax.tree.leaves(x)[0].ravel()[0])


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


@functools.lru_cache(maxsize=None)
def _stats_weights(size: int):
    a = _bilinear_matrix_align_corners(size, 2 * size)  # (2H, H)
    s = a.sum(0)  # column sums, (H,)
    g = a.T @ a   # Gram, tridiagonal (H, H)
    return s, g


def upsample2_stats(x):
    """(mean_c, meansq_c) of upsample_bilinear_align_corners(x, 2), computed
    from x: sum(up(x)) = s_h^T x s_w; sum(up(x)^2) = <x, G_h x G_w>."""
    b, h, w, c = x.shape
    s_h, g_h = _stats_weights(h)
    s_w, g_w = _stats_weights(w)
    n = b * (2 * h) * (2 * w)
    s_h = jnp.asarray(s_h, x.dtype)
    s_w = jnp.asarray(s_w, x.dtype)
    g_h = jnp.asarray(g_h, x.dtype)
    g_w = jnp.asarray(g_w, x.dtype)
    xs = jnp.einsum("h,bhwc->bwc", s_h, x,
                    preferred_element_type=jnp.float32)
    mean = jnp.einsum("w,bwc->c", s_w, xs.astype(x.dtype),
                      preferred_element_type=jnp.float32) / n
    gx = jnp.einsum("ih,bhwc->biwc", g_h, x,
                    preferred_element_type=jnp.float32).astype(x.dtype)
    gxw = jnp.einsum("jw,biwc->bijc", g_w, gx,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    meansq = jnp.einsum("bijc,bijc->c", x, gxw,
                        preferred_element_type=jnp.float32) / n
    return mean, meansq


def chain_current(x, kernel, scale, bias):
    y = upsample_bilinear_align_corners(x, 2)
    y32 = y.astype(jnp.float32)
    mean = jnp.mean(y32, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(y32), axis=(0, 1, 2)) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + 1e-5) * scale
    y = ((y.astype(jnp.float32) - mean) * inv + bias).astype(y.dtype)
    y = jnp.where(y > 0, y, 0.2 * y)
    y = jax.lax.conv_general_dilated(
        y, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.mean(y.astype(jnp.float32) ** 2)


def chain_folded(x, kernel, scale, bias):
    mean, meansq = upsample2_stats(x)
    var = meansq - jnp.square(mean)
    y = upsample_bilinear_align_corners(x, 2)
    inv = jax.lax.rsqrt(var + 1e-5) * scale
    y = ((y.astype(jnp.float32) - mean) * inv + bias).astype(y.dtype)
    y = jnp.where(y > 0, y, 0.2 * y)
    y = jax.lax.conv_general_dilated(
        y, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.mean(y.astype(jnp.float32) ** 2)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--dtype", type=str, default="bfloat16")
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)

    x = jax.random.normal(jax.random.key(0), (args.batch, 128, 128, 64), dtype)
    kernel = jax.random.normal(jax.random.key(1), (3, 3, 64, 64), dtype) * 0.05
    scale = jnp.ones((64,), jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)

    # numerics: fold vs direct stats (bf16 rounding of the upsample is the
    # only difference; fold accumulates in f32 on the MXU)
    y = upsample_bilinear_align_corners(x, 2).astype(jnp.float32)
    m_direct = jnp.mean(y, axis=(0, 1, 2))
    s_direct = jnp.mean(jnp.square(y), axis=(0, 1, 2))
    m_fold, s_fold = upsample2_stats(x)
    m_err = float(jnp.max(jnp.abs(m_fold - m_direct)))
    s_err = float(jnp.max(jnp.abs(s_fold - s_direct) / jnp.maximum(s_direct, 1e-6)))
    print(f"stats agreement: |mean err| {m_err:.3e}  rel meansq err {s_err:.3e}")

    for name, fn in (("current", chain_current), ("folded", chain_folded)):
        g = jax.jit(jax.grad(fn, argnums=(0, 1)))
        dt = timeit(g, x, kernel, scale, bias, iters=args.iters)
        print(f"{name:10s} {dt * 1e3:8.2f} ms/iter (fwd+bwd)")


if __name__ == "__main__":
    main()
