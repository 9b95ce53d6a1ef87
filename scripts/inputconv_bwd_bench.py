"""Microbench: variants of the image-input conv backward (grad into fakes).

profile_step found the VGG _InputConv backward-to-input at 4.03% of the step
(18.7 ms, ~224 GB/s, ~18% MXU) — the single worst op vs its roofline. The
8-channel grad output underfills MXU lanes; this script times exact-math
alternatives in isolation (fwd+bwd of a conv1_1-shaped subgraph feeding a
scalar loss) to pick a formulation before integrating.

Usage: python scripts/inputconv_bwd_bench.py [--batch 128] [--iters 5]
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


def conv_nhwc(x, k, prec=None):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)


def make_variants(batch, dtype):
    B, H, W = batch, 256, 256
    key = jax.random.key(0)
    x3 = jax.random.normal(key, (B, H, W, 3), dtype)
    k3 = jax.random.normal(jax.random.key(1), (3, 3, 3, 64), dtype)
    gy_shape = (B, H, W, 64)

    # each variant: loss(x) = sum(conv(x)) * dummy; we time grad wrt x.
    def v_current(x, k):
        # pad inside (today's _InputConv): slice-to-3 fuses into the bwd conv
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, 5), (0, 0)))
        return conv_nhwc(xp, kp)

    def v_pad_outside(x8, k):
        # caller keeps an 8-channel image tensor alive; bwd emits 8-ch grads
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, 5), (0, 0)))
        return conv_nhwc(x8, kp)

    def v_nopad(x, k):
        return conv_nhwc(x, k)

    @jax.custom_vjp
    def v_custom(x, k):
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, 5), (0, 0)))
        return conv_nhwc(xp, kp)

    def v_custom_fwd(x, k):
        return v_custom(x, k), (x, k)

    def v_custom_bwd(res, gy):
        x, k = res
        # grad_x: transposed conv as explicit dilated conv, 64 -> 8, then
        # slice; grad_k: standard correlation
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, 5), (0, 0)))
        kt = jnp.flip(kp, (0, 1)).swapaxes(2, 3)  # (3,3,64,8)
        gx8 = conv_nhwc(gy, kt)
        gx = gx8[..., :3]
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
        # kernel grad via conv with batch as contraction
        gk = jax.lax.conv_general_dilated(
            xp.transpose(3, 1, 2, 0), gy.transpose(1, 2, 0, 3),
            (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        gk = gk.transpose(1, 2, 0, 3)[:, :, :3, :]
        return gx, gk

    v_custom.defvjp(v_custom_fwd, v_custom_bwd)

    variants = {
        "pad_inside(current)": (v_current, x3, k3),
        "no_pad(3ch)": (v_nopad, x3, k3),
        "pad_outside(8ch weights-only slice)": (
            v_pad_outside,
            jnp.pad(x3, ((0, 0), (0, 0), (0, 0), (0, 5))), k3),
        "custom_vjp(split bwd convs)": (v_custom, x3, k3),
    }
    return variants, gy_shape


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--dtype", type=str, default="bfloat16")
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)
    variants, _ = make_variants(args.batch, dtype)

    for name, (fn, x, k) in variants.items():
        # grad wrt x AND k through a mean loss (mirrors the train step: the
        # input grad flows to G, the kernel grad exists for VGG finetune /
        # D input convs)
        def loss(x, k, fn=fn):
            return jnp.mean(fn(x, k).astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        try:
            dt = timeit(g, x, k, iters=args.iters)
            print(f"{name:42s} {dt * 1e3:8.2f} ms/iter")
        except Exception as e:  # noqa: BLE001
            print(f"{name:42s} FAILED: {e}")


if __name__ == "__main__":
    main()
