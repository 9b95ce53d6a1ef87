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


# ---------------------------------------------------------------------------
# Batched sigma pass (OPTIM.md lever 3)
#
# A full-width G or D holds ~60 spectrally-normalized layers; computing sigma
# inside each module costs ~6 tiny serialized ops per layer per forward (TPU
# executes ops on one core — tiny matvecs cannot hide behind the convs).
# Instead the train step precomputes EVERY layer's sigma in one pass, with
# layers of identical (rows, cols) w2d shape stacked into a single
# (L, rows, cols) power-iteration — same math, same u/v trajectories, ~10
# batched ops per net instead of ~350.
#
# The resulting sigma pytree is injected into `.apply` as a read-only
# `sigmas` collection; `_SpectralMixin._spectral_scale` short-circuits on it.
# ---------------------------------------------------------------------------


def _w2d_view(param_leaf) -> jax.Array:
    """The torch power-iteration matrix for one layer's params
    (models/layers.py: conv HWIO -> (O, I*kh*kw); dense (in, out) -> (out, in);
    embedding table as-is)."""
    if "kernel" in param_leaf:
        k = param_leaf["kernel"]
        if k.ndim == 4:
            return k.transpose(3, 2, 0, 1).reshape(k.shape[3], -1)
        return k.T
    return param_leaf["embedding"]


def _l2_normalize_rows(x: jax.Array, eps: float) -> jax.Array:
    return x / jnp.maximum(
        jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def _walk_spectral(spectral, params, path=()):
    if isinstance(spectral, dict) and "u" in spectral and "v" in spectral:
        yield path, spectral, params
        return
    for key in spectral:
        yield from _walk_spectral(spectral[key], params[key], path + (key,))


def _set_path(tree, path, leaf) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


def compute_sigma_tree(params, spectral, update: bool, n_iter: int = 1,
                       eps: float = _EPS):
    """Batched spectral-norm pass over every SN layer of one network.

    Args:
        params / spectral: the network's variable trees (spectral leaves are
            {"u", "v"} pairs created by _SpectralMixin).
        update: run `n_iter` power iterations (training-mode forward) or reuse
            the stored vectors (eval). Matches spectral_norm_weight exactly
            per layer (same matvecs, batched over same-shape layers).

    Returns:
        (sigma_tree, new_spectral): `sigma_tree` mirrors the module paths with
        {"sigma": scalar} leaves (differentiable w.r.t. params, u/v constant),
        ready to pass as the `sigmas` collection of `.apply`; `new_spectral`
        carries the advanced u/v state.
    """
    groups: dict = {}
    for path, spec_leaf, param_leaf in _walk_spectral(spectral, params):
        w = _w2d_view(param_leaf)
        groups.setdefault(w.shape, []).append(
            (path, w, spec_leaf["u"], spec_leaf["v"]))

    sigma_tree: dict = {}
    new_spectral: dict = {}
    for items in groups.values():
        w_stack = jnp.stack([w for _, w, _, _ in items]).astype(jnp.float32)
        u_stack = jnp.stack([u for _, _, u, _ in items])
        v_stack = jnp.stack([v for _, _, _, v in items])
        if update:
            for _ in range(n_iter):
                v_stack = _l2_normalize_rows(
                    jnp.einsum("lrc,lr->lc", w_stack, u_stack), eps)
                u_stack = _l2_normalize_rows(
                    jnp.einsum("lrc,lc->lr", w_stack, v_stack), eps)
        u_stack = jax.lax.stop_gradient(u_stack)
        v_stack = jax.lax.stop_gradient(v_stack)
        sigma = jnp.einsum("lr,lrc,lc->l", u_stack, w_stack, v_stack)
        for i, (path, _, _, _) in enumerate(items):
            _set_path(sigma_tree, path, {"sigma": sigma[i]})
            _set_path(new_spectral, path,
                      {"u": u_stack[i], "v": v_stack[i]})
    return sigma_tree, new_spectral
