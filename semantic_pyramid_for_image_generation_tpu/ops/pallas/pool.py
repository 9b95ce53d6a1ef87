"""Fused Pallas TPU kernel for 2x2/stride-2 max pooling (NHWC) + its VJP.

The XLA pairwise form (ops/pool.py::max_pool_2d) is numerically right but
expensive on TPU: the (B, H/2, 2, W/2, 2, C) reshape/slice chain materializes
6-d temps with degenerate trailing tiles, and its backward builds the same
shapes again through selects.  Profiling the batch-128 train step attributed
~51 ms/step to these chains (pool.py:34-35) against a ~14 ms HBM roofline —
the largest single non-conv overhead in the step (OPTIM.md round 3).

Kernel strategy (per (batch, row-block) grid step):
  - H pairs are free: the input is viewed as (B, H/2, 2, W, C) outside the
    kernel (a layout-free bitcast) and passed twice with block index 0 / 1 on
    the pair dim, so the kernel receives even rows and odd rows as two VMEM
    refs and `jnp.maximum`s them — no in-kernel reshape.
  - W pairs cannot be sliced on the minor-most side (Mosaic: no strided
    gathers, no partial-lane shape casts), so the row-max slab is transposed
    to (hb*C, W) — lanes = W, the same legal pattern as
    ops/pallas/resize.py — and the even/odd columns are *selected with exact
    0/1 matrices on the MXU* (one 1.0 per column: fp-exact in bf16, like the
    CBN one-hot row select).  out = max(even, odd).
  - The backward recomputes the forward from the saved input (elementwise +
    two small matmuls; cheaper than saving intermediates) and routes
    cotangents with exactly JAX's balanced-eq `maximum` rule
    (select(x==ans, select(y==ans, g/2, g), 0)) in the same max order as the
    XLA pairwise form, so bf16 kernel gradients match the bf16 XLA reference
    elementwise.  Quadrant grads are written as one (B, H/2, 2, W, C) output
    and bitcast back to NHWC outside.

Used by ops/pool.py for bf16 TPU runs; the pairwise XLA form remains the
fp32 torch-parity path (matching /root/reference/models.py:201-204 pools and
the /root/reference/lossfunction.py:44-59 loss pools through it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=None)
def _parity_select_matrices(w: int):
    """(S_even, S_odd): (w, w//2) 0/1 matrices with S[2j, j] = 1 (even) and
    S[2j+1, j] = 1 (odd). m @ S_even picks even columns exactly."""
    se = np.zeros((w, w // 2), dtype=np.float32)
    so = np.zeros((w, w // 2), dtype=np.float32)
    se[np.arange(0, w, 2), np.arange(w // 2)] = 1.0
    so[np.arange(1, w, 2), np.arange(w // 2)] = 1.0
    return se, so


def _compact(m2, sel_ref):
    """(hb*C, W) @ (W, W/2) exact column selection; fp-exact for 0/1 sel."""
    return jnp.dot(m2, sel_ref[...],
                   preferred_element_type=jnp.float32).astype(m2.dtype)


def _expand(g2, sel_ref):
    """(hb*C, W/2) scatter back to (hb*C, W): contract on sel's column dim
    (== g2 @ sel.T without materializing the transpose)."""
    return jax.lax.dot_general(
        g2, sel_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(g2.dtype)


def _mp_fwd_kernel(se_ref, so_ref, xe_ref, xo_ref, o_ref):
    # All compute in f32: Mosaic on v5e cannot lower bf16 vector compares
    # (max/eq); bf16->f32 is exact so values match the bf16 XLA form.
    xe = xe_ref[0, :, 0].astype(jnp.float32)        # (hb, W, C)
    xo = xo_ref[0, :, 0].astype(jnp.float32)
    hb, w, c = xe.shape
    m = jnp.maximum(xe, xo)                         # rows paired (torch order)
    m2 = jnp.swapaxes(m, 1, 2).reshape(hb * c, w)   # lanes = W
    y = jnp.maximum(_compact(m2, se_ref), _compact(m2, so_ref))
    o_ref[0] = jnp.swapaxes(y.reshape(hb, c, w // 2), 1, 2).astype(o_ref.dtype)


def _balanced(eq_self, eq_other, g):
    """JAX maximum-transpose rule: full g if only self hit, g/2 on a tie."""
    zero = jnp.zeros((), g.dtype)
    return jnp.where(eq_self, jnp.where(eq_other, g * 0.5, g), zero)


def _mp_bwd_kernel(se_ref, so_ref, xe_ref, xo_ref, g_ref, o_ref):
    # f32 compute throughout (see _mp_fwd_kernel note): exact for bf16 inputs.
    xe = xe_ref[0, :, 0].astype(jnp.float32)        # (hb, W, C)
    xo = xo_ref[0, :, 0].astype(jnp.float32)
    hb, w, c = xe.shape
    m = jnp.maximum(xe, xo)
    m2 = jnp.swapaxes(m, 1, 2).reshape(hb * c, w)
    e = _compact(m2, se_ref)                        # (hb*C, W/2)
    o = _compact(m2, so_ref)
    out = jnp.maximum(e, o)
    g2 = jnp.swapaxes(g_ref[0], 1, 2).reshape(hb * c, w // 2)
    g2 = g2.astype(jnp.float32)
    ge = _balanced(e == out, o == out, g2)
    go = _balanced(o == out, e == out, g2)
    gm2 = _expand(ge, se_ref) + _expand(go, so_ref)  # disjoint supports: exact
    gm = jnp.swapaxes(gm2.reshape(hb, c, w), 1, 2)  # (hb, W, C)
    o_ref[0, :, 0] = _balanced(xe == m, xo == m, gm).astype(o_ref.dtype)
    o_ref[0, :, 1] = _balanced(xo == m, xe == m, gm).astype(o_ref.dtype)


def _pick_hb(h2: int, w: int, c: int, n_bufs: int) -> int:
    """Row block: ~n_bufs live (hb, W, C) slabs within a ~4 MB budget."""
    budget = 4 * 1024 * 1024
    hb = h2
    while hb > 1 and n_bufs * 2 * hb * w * c > budget:
        hb //= 2
    return hb


def supported_shape(h: int, w: int, c: int) -> bool:
    """Shapes whose transposed (hb*C, W) form lowers cleanly: full-lane W,
    even dims. Sub-128 W (deep pools) stays on the XLA pairwise path."""
    return h % 2 == 0 and w % 2 == 0 and w >= 128 and (w * c) % 128 == 0


def _fwd(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    x5 = x.reshape(b, h // 2, 2, w, c)              # layout-free bitcast
    se, so = _parity_select_matrices(w)
    hb = _pick_hb(h // 2, w, c, n_bufs=8)
    grid = (b, (h // 2) // hb)
    xspec = lambda p: pl.BlockSpec((1, hb, 1, w, c),
                                   lambda i, j, p=p: (i, j, p, 0, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mp_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((w, w // 2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w // 2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            xspec(0), xspec(1),
        ],
        out_specs=pl.BlockSpec((1, hb, w // 2, c),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, c), x.dtype),
        interpret=jax.default_backend() != "tpu",
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (h // 2) * c * w * (w // 2) * 2,
            bytes_accessed=2 * b * h * w * c + 2 * b * (h // 2) * (w // 2) * c,
            transcendentals=0,
        ),
    )(jnp.asarray(se, jnp.float32), jnp.asarray(so, jnp.float32), x5, x5)


@jax.custom_vjp
def max_pool_2x2_pallas(x: jax.Array) -> jax.Array:
    """nn.MaxPool2d(2, 2) on NHWC via the fused kernel. Same forward values
    as ops/pool.py::max_pool_2d's pairwise form; backward follows JAX's
    balanced-eq maximum rule in the same (rows, then columns) order."""
    return _fwd(x)


def _mp_vjp_fwd(x):
    return _fwd(x), x


def _mp_vjp_bwd(x, g):
    b, h, w, c = x.shape
    x5 = x.reshape(b, h // 2, 2, w, c)
    se, so = _parity_select_matrices(w)
    hb = _pick_hb(h // 2, w, c, n_bufs=12)
    grid = (b, (h // 2) // hb)
    xspec = lambda p: pl.BlockSpec((1, hb, 1, w, c),
                                   lambda i, j, p=p: (i, j, p, 0, 0),
                                   memory_space=pltpu.VMEM)
    gx5 = pl.pallas_call(
        _mp_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((w, w // 2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w // 2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            xspec(0), xspec(1),
            pl.BlockSpec((1, hb, w // 2, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, 2, w, c), lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, 2, w, c), x.dtype),
        interpret=jax.default_backend() != "tpu",
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (h // 2) * c * w * (w // 2) * 4,
            bytes_accessed=(2 * 2 * b * h * w * c
                            + 2 * b * (h // 2) * (w // 2) * c),
            transcendentals=0,
        ),
    )(jnp.asarray(se, jnp.float32), jnp.asarray(so, jnp.float32), x5, x5, g)
    return (gx5.reshape(b, h, w, c),)


max_pool_2x2_pallas.defvjp(_mp_vjp_fwd, _mp_vjp_bwd)
