"""Microbench: space-to-depth rewrite of the 3-channel 256^2 input stems.

Round-3 re-profile (OPTIM.md): the ONE remaining >=2% op is the VGG
image-input conv backward (grad into the fakes) at 4.03% / 18.7 ms — every
formulation benched by scripts/inputconv_bwd_bench.py sits at the same
fill-limited roofline because the input/grad channel dim is 3 (padded 8).
VERDICT r4 item: build the EXACT space-to-depth rewrite and measure it.

The rewrite (exact, not an approximation): with r=2, a 3x3 stride-1 SAME conv
on (B,256,256,3)->(B,256,256,64) equals

    s2d     (B,256,256,3)  -> (B,128,128,12)      channel = (u*2+v)*3+c
    pad     spatial ((1,1),(1,1))
    conv2x2 (2,2,12,256) VALID -> (B,129,129,256)  out ch = (a*2+b)*64+o
    phase-slice + depth-to-space -> (B,256,256,64)

where the 2x2 kernel is a scatter of the original 3x3 taps:
K2[t,s,(u,v,c),(a,b,o)] = k[a+u+2t-1, b+v+2s-1, c, o] (zero out of range).
Derivation: output pixel (2i+a, 2j+b) reads input rows 2i+a+di-1 = 2(i+p)+u,
so di = a+u+2t-1 with t the 2x2 tap on the padded s2d grid.

Why it could win: the contraction widens 27->48 true (72->64 MXU-padded) and
the backward-to-input's narrow OUTPUT lane dim widens 8->16 padded at ~equal
padded FLOPs, i.e. 2x the lane fill where the profile says we are fill-bound.
FLOP inflation in TRUE terms is 16/9 (the 2x2 container carries zeros), the
cost OPTIM.md cited when declaring this out of scope in round 3.

Usage: python scripts/s2d_stem_bench.py [--batch 128] [--iters 5]
Prints per-variant fwd+bwd ms and an fp32 exactness check vs the direct conv.
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


def conv_valid(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_same(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def space_to_depth(x, r=2):
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r, r * r * c)


def scatter_kernel_s2d(k):
    """(3,3,Cin,Cout) -> (2,2,4*Cin,4*Cout) phase-scatter (see module doc)."""
    kh, kw, cin, cout = k.shape
    assert (kh, kw) == (3, 3)
    k2 = jnp.zeros((2, 2, 4 * cin, 4 * cout), k.dtype)
    for t in range(2):
        for s in range(2):
            for u in range(2):
                for v in range(2):
                    for a in range(2):
                        for b in range(2):
                            di = a + u + 2 * t - 1
                            dj = b + v + 2 * s - 1
                            if 0 <= di < 3 and 0 <= dj < 3:
                                k2 = k2.at[
                                    t, s,
                                    (u * 2 + v) * cin:(u * 2 + v + 1) * cin,
                                    (a * 2 + b) * cout:(a * 2 + b + 1) * cout,
                                ].set(k[di, dj])
    return k2


def depth_from_phases(out129, cout):
    """(B,129,129,4*Cout) phase tensor -> (B,256,256,Cout).

    Phase (a,b)'s 128^2 window starts at (a,b); assemble so that
    y[:, 2i+a, 2j+b, :] = out129[:, i+a, j+b, (a*2+b)*cout:...]."""
    b = out129.shape[0]
    rows = []
    for a in range(2):
        cols = []
        for v in range(2):
            cols.append(out129[:, a:a + 128, v:v + 128,
                               (a * 2 + v) * cout:(a * 2 + v + 1) * cout])
        rows.append(jnp.stack(cols, axis=3))   # (B,128,128,2,Cout)
    y = jnp.stack(rows, axis=3)                # (B,128,128,2,2,Cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 256, 256, cout)


def make_variants():
    def v_current(x, k):
        # today's _InputConv: pad channels 3->8 inside
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, 5), (0, 0)))
        return conv_same(xp, kp)

    def v_s2d_onec(x, k):
        # ONE 2x2 conv over the padded s2d grid; 4 shifted slices + d2s
        cout = k.shape[-1]
        xs = space_to_depth(x)
        k2 = scatter_kernel_s2d(k)
        xp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = conv_valid(xp, k2)               # (B,129,129,4*cout)
        return depth_from_phases(out, cout)

    def v_s2d_fourc(x, k):
        # 4 separate 2x2 convs (per-phase padding), no 129-grid slack
        cout = k.shape[-1]
        xs = space_to_depth(x)
        k2 = scatter_kernel_s2d(k)
        phases = {}
        for a in range(2):
            for b in range(2):
                pad = [(1 - a, a), (1 - b, b)]
                kp = k2[..., (a * 2 + b) * cout:(a * 2 + b + 1) * cout]
                phases[(a, b)] = jax.lax.conv_general_dilated(
                    xs, kp, (1, 1), pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.stack([jnp.stack([phases[(a, 0)], phases[(a, 1)]], axis=3)
                       for a in range(2)], axis=3)  # (B,128,128,2,2,cout)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(
            x.shape[0], 256, 256, cout)

    return {
        "pad_inside(current)": v_current,
        "s2d_one_conv(129grid)": v_s2d_onec,
        "s2d_four_convs": v_s2d_fourc,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--dtype", type=str, default="bfloat16")
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)
    variants = make_variants()

    # ---- exactness: fp32, tiny batch, vs the direct SAME conv -------------
    kx = jax.random.key(0)
    x32 = jax.random.normal(kx, (2, 256, 256, 3), jnp.float32)
    k32 = jax.random.normal(jax.random.key(1), (3, 3, 3, 64), jnp.float32)
    want = np.asarray(conv_same(x32, k32))
    for name, fn in variants.items():
        got = np.asarray(jax.jit(fn)(x32, k32))
        err = np.abs(got - want).max()
        print(f"{name:28s} fp32 max|diff| vs direct conv: {err:.3e}")
        assert err < 1e-4, name

    # ---- timing: fwd+bwd (grads wrt x and k), batch-128 train shape --------
    x = jax.random.normal(kx, (args.batch, 256, 256, 3), dtype)
    k = jax.random.normal(jax.random.key(1), (3, 3, 3, 64), dtype)
    for name, fn in variants.items():
        def loss(x, k, fn=fn):
            return jnp.mean(fn(x, k).astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        dt = timeit(g, x, k, iters=args.iters)
        print(f"{name:28s} fwd+bwd {dt * 1e3:8.2f} ms/iter")


if __name__ == "__main__":
    main()
