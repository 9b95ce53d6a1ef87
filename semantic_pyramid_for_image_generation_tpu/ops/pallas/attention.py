"""Fused Pallas TPU kernel for the SAGAN pooled-KV self-attention.

The reference computes bmm -> softmax -> bmm through three separate CUDA
kernels with an HBM round-trip for the (B, 1024, 256) attention map
(/root/reference/models.py:262-268). Here the whole contraction runs in one
Pallas kernel per batch element with the attention map resident in VMEM:

    logits = q @ k^T          (MXU, fp32 accumulate)
    p      = softmax(logits)  (VPU, numerically-stable)
    out    = p @ v            (MXU)

Shapes at full width (32x32 feature map, 256 channels): q (B, 1024, 32),
k (B, 256, 32), v (B, 256, 128) — everything fits VMEM comfortably
(~1.5 MB fp32 per batch element including the map).

The backward pass recomputes the attention map with plain XLA einsums
(cheap at these sizes, saves storing the map) via custom_vjp.

On non-TPU backends the kernel runs in interpreter mode, keeping tests
device-independent. On TPU, fp32 inputs route to the HIGHEST-precision XLA
contraction instead (the torch-parity mode — the in-kernel dots run at
Mosaic's default MXU precision, which truncates fp32 operands to bf16
single-passes; `bench.py --check-pallas` pins both modes on-chip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0].astype(jnp.float32)   # (Nq, C8)
    k = k_ref[0].astype(jnp.float32)   # (Nk, C8)
    v = v_ref[0]                       # (Nk, C2)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Nq, Nk)
    p = jax.nn.softmax(logits, axis=-1)
    o_ref[0] = jnp.dot(
        p.astype(v.dtype), v,
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _xla_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """The HIGHEST-precision XLA contraction — the fp32 torch-parity path
    (identical to SelfAttention's plain path, models/layers.py:338-343)."""
    logits = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkc->bqc", p, v,
                      precision=jax.lax.Precision.HIGHEST)


def _forward(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    if q.dtype == jnp.float32 and jax.default_backend() == "tpu":
        # fp32 is the torch-parity mode: route to the HIGHEST-precision XLA
        # contraction. The in-kernel dots run at Mosaic's default MXU
        # precision (operands truncated to bf16 single-passes) — measured
        # 0.064 max forward divergence from the parity path at the generator
        # shape, caught on-chip by `bench.py --check-pallas`. The Pallas
        # kernel is the bf16 perf-mode path; interpret mode (tests) keeps
        # the kernel for fp32, where it is exact.
        return _xla_attention(q, k, v)
    b, nq, c8 = q.shape
    _, nk, c2 = v.shape
    spec = lambda n, c: pl.BlockSpec(  # noqa: E731
        (1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _attention_kernel,
        grid=(b,),
        in_specs=[spec(nq, c8), spec(nk, c8), spec(nk, c2)],
        out_specs=spec(nq, c2),
        out_shape=jax.ShapeDtypeStruct((b, nq, c2), v.dtype),
        interpret=jax.default_backend() != "tpu",
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nq * nk * (c8 + c2),
            bytes_accessed=4 * b * (nq * c8 + nk * c8 + nk * c2 + nq * c2),
            transcendentals=b * nq * nk,
        ),
    )(q, k, v)


@jax.custom_vjp
def pooled_kv_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """softmax(q k^T) v with fp32 softmax. bf16 inputs take the fused Pallas
    kernel (the TPU perf mode); fp32 inputs on TPU take the
    HIGHEST-precision XLA contraction so the torch-parity mode stays exact
    (see _forward — the Mosaic MXU cannot run full-precision fp32 dots)."""
    return _forward(q, k, v)


def _fwd(q, k, v):
    return _forward(q, k, v), (q, k, v)


def _bwd(residuals, g):
    q, k, v = residuals
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    logits = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32, precision=prec)
    p = jax.nn.softmax(logits, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bqk,bqc->bkc", p, g32, precision=prec)
    dp = jnp.einsum("bqc,bkc->bqk", g32, v.astype(jnp.float32), precision=prec)
    dlogits = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bqk,bkc->bqc", dlogits, k.astype(jnp.float32),
                    precision=prec)
    dk = jnp.einsum("bqk,bqc->bkc", dlogits, q.astype(jnp.float32),
                    precision=prec)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


pooled_kv_attention.defvjp(_fwd, _bwd)
