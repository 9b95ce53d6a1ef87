"""Train state: one pytree carrying everything the fused train step threads.

The reference scatters mutable state across torch modules (SN `u` buffers, BN
running stats, optimizer slots — SURVEY.md 7 'hard parts' 1-3). Here it is a
single `flax.struct` pytree, so the whole G/D update is a pure function
`(state, batch, rng) -> (state, metrics)` that jit compiles once, donates its
input buffers, and shards over the data mesh.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from semantic_pyramid_for_image_generation_tpu.config import (
    DEFAULT_LR,
    PyramidGANConfig,
)
from semantic_pyramid_for_image_generation_tpu.models import (
    Discriminator,
    Generator,
    VGG16,
)

Pytree = Any


class TrainState(struct.PyTreeNode):
    step: jax.Array
    # generator
    g_params: Pytree
    g_spectral: Pytree
    g_batch_stats: Pytree
    g_opt_state: Pytree
    # discriminator
    d_params: Pytree
    d_spectral: Pytree
    d_opt_state: Pytree
    # frozen feature extractor
    vgg_params: Pytree


def make_models(config: PyramidGANConfig, use_pallas_attention: bool = False):
    generator = Generator(config, use_pallas_attention=use_pallas_attention)
    discriminator = Discriminator(config, use_pallas_attention=use_pallas_attention)
    vgg = VGG16(config)
    return generator, discriminator, vgg


def make_optimizers(lr: float = DEFAULT_LR):
    """Adam with torch defaults (b1=0.9, b2=0.999, eps=1e-8), one per net
    (/root/reference/main.py:64-65)."""
    return optax.adam(lr), optax.adam(lr)


def init_train_state(
    rng: jax.Array,
    config: PyramidGANConfig,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    use_pallas_attention: bool = False,
    vgg_variables: Optional[Dict[str, Any]] = None,
    g_variables: Optional[Dict[str, Any]] = None,
    d_variables: Optional[Dict[str, Any]] = None,
) -> TrainState:
    """Initialize (or adopt converted `.pt`) variables for all three nets."""
    generator, discriminator, vgg = make_models(config, use_pallas_attention)
    rng_g, rng_d, rng_v = jax.random.split(rng, 3)

    feats = [jnp.zeros((1,) + s, jnp.float32) for s in config.feature_shapes]
    masks = [jnp.zeros((1,) + s, jnp.float32) for s in config.mask_shapes]
    onehot = jnp.zeros((1, config.num_classes), jnp.float32)

    if g_variables is None:
        g_variables = generator.init(
            rng_g, jnp.zeros((1, config.latent_dim), jnp.float32),
            feats, masks, onehot, train=False)
    if d_variables is None:
        d_variables = discriminator.init(
            rng_d,
            jnp.zeros((1, config.image_size, config.image_size,
                       config.out_channels), jnp.float32),
            onehot, train=False)
    if vgg_variables is None:
        vgg_variables = vgg.init(
            rng_v,
            jnp.zeros((1, config.image_size, config.image_size,
                       config.out_channels), jnp.float32))

    as_jnp = lambda tree: jax.tree.map(jnp.asarray, tree)  # noqa: E731
    g_params = as_jnp(g_variables["params"])
    d_params = as_jnp(d_variables["params"])
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        g_spectral=as_jnp(g_variables["spectral"]),
        g_batch_stats=as_jnp(g_variables["batch_stats"]),
        g_opt_state=g_tx.init(g_params),
        d_params=d_params,
        d_spectral=as_jnp(d_variables["spectral"]),
        d_opt_state=d_tx.init(d_params),
        vgg_params=as_jnp(vgg_variables["params"]),
    )


def param_count(tree: Pytree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))


def inject_adam_moments(opt_state: Pytree, moments: Dict[str, Any]) -> Pytree:
    """Insert imported torch Adam moments into an optax adam state.

    optax.adam is chain(scale_by_adam, scale(-lr)); slot 0 carries
    (count, mu, nu). torch's `step` counts completed updates and optax bias-
    corrects with count+1 on the next update, so count=torch_step continues
    with the exact update torch would take next (/root/reference/main.py:68-73
    restores both optimizer state dicts; this is the optax equivalent)."""
    inner = opt_state[0]
    as_jnp = lambda tree: jax.tree.map(jnp.asarray, tree)  # noqa: E731
    mu, nu = as_jnp(moments["mu"]), as_jnp(moments["nu"])
    want = jax.tree.structure(inner.mu)
    got = jax.tree.structure(mu)
    if want != got:
        raise ValueError(
            "imported Adam moments do not match the optimizer pytree: "
            f"expected {want}, got {got}")
    inner = inner._replace(
        count=jnp.asarray(moments["count"], inner.count.dtype), mu=mu, nu=nu)
    return (inner,) + tuple(opt_state[1:])
