"""Functional spectral normalization.

The reference wraps every G/D conv/linear/embedding in
`torch.nn.utils.spectral_norm` (/root/reference/models.py passim), which hides
per-layer power-iteration vectors `u`, `v` as module buffers mutated on every
training-mode forward.

TPU-native design: the power-iteration vectors are explicit state, carried in a
`spectral` variable collection of the train-state pytree and threaded through
pure jitted functions. One power-iteration (a pair of matvecs) per layer per
forward, matching torch's `n_power_iterations=1` semantics:

  v <- normalize(W^T u);  u <- normalize(W v);  sigma = u^T W v

with `u`, `v` treated as constants for differentiation (so d(sigma)/dW = u v^T),
exactly like torch where the buffers are grad-free.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12


def l2_normalize(x: jax.Array, eps: float = _EPS) -> jax.Array:
    """Matches `torch.nn.functional.normalize`: x / max(||x||_2, eps)."""
    return x / jnp.maximum(jnp.linalg.norm(x), eps)


def spectral_norm_weight(
    w2d: jax.Array,
    u: jax.Array,
    v: jax.Array,
    update: bool,
    n_iter: int = 1,
    eps: float = _EPS,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One spectral-norm step on a 2D weight matrix.

    Args:
        w2d: weight viewed as (rows, cols). For parity with torch, rows must be
            the output dimension (torch reshapes conv weights to
            (out, in*kh*kw)).
        u: current left singular-vector estimate, shape (rows,). float32.
        v: current right singular-vector estimate, shape (cols,). float32.
        update: if True, run `n_iter` power iterations (training-mode forward);
            if False, reuse the stored vectors (eval-mode forward).

    Returns:
        (sigma, u_new, v_new). `sigma` is differentiable w.r.t. `w2d` with the
        singular vectors treated as constants. When `update=False` the vectors
        are returned unchanged.
    """
    w32 = w2d.astype(jnp.float32)
    if update:
        # Python-unrolled: n_iter is static (1 in practice), and a lax loop
        # cannot be partially evaluated when its stop-gradient outputs are
        # value_and_grad aux outputs ("linearization failed" otherwise).
        for _ in range(n_iter):
            v = l2_normalize(w32.T @ u, eps)
            u = l2_normalize(w32 @ v, eps)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = jnp.einsum("i,ij,j->", u, w32, v)
    return sigma, u, v


def spectral_init_vectors(key: jax.Array, rows: int, cols: int,
                          eps: float = _EPS) -> Tuple[jax.Array, jax.Array]:
    """Init (u, v) as in torch: independent N(0,1) draws, l2-normalized."""
    ku, kv = jax.random.split(key)
    u = l2_normalize(jax.random.normal(ku, (rows,), jnp.float32), eps)
    v = l2_normalize(jax.random.normal(kv, (cols,), jnp.float32), eps)
    return u, v
