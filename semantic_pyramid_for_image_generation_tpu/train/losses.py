"""Training objectives (/root/reference/lossfunction.py), pure jnp.

Four losses drive the GAN (SURVEY.md 2.3):
  * masked multi-level semantic reconstruction (L1 on 2x-max-pooled features),
  * mini-batch diversity (latent L1 over image L1),
  * LSGAN generator / discriminator least-squares objectives.

All reduce with plain means, so they are linear in the batch and shard cleanly
over the data mesh under jit/GSPMD (the global mean of a sharded batch is
computed with an ICI psum XLA inserts automatically).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from semantic_pyramid_for_image_generation_tpu.ops.pool import (
    max_pool_1d,
    max_pool_2d,
)


def semantic_reconstruction_loss(
    features_real: Sequence[jax.Array],
    features_fake: Sequence[jax.Array],
    masks: Sequence[jax.Array],
) -> jax.Array:
    """Sum over pyramid levels of mean(|real - fake| * mask) after 2x max
    pooling of features AND masks (lossfunction.py:31-68). Conv levels are
    NHWC with (B, H, W, 1) masks broadcasting over channels; fc levels pool
    pairwise along the feature axis."""
    assert len(features_real) == len(features_fake) == len(masks)
    loss = jnp.zeros((), jnp.float32)
    for real, fake, mask in zip(features_real, features_fake, masks):
        real = real.astype(jnp.float32)
        fake = fake.astype(jnp.float32)
        mask = mask.astype(jnp.float32)
        if real.ndim == 4:
            real, fake, mask = (max_pool_2d(t, 2) for t in (real, fake, mask))
        else:
            real, fake, mask = (max_pool_1d(t, 2) for t in (real, fake, mask))
        loss = loss + jnp.mean(jnp.abs(real - fake) * mask)
    return loss


def diversity_loss(images_fake: jax.Array, latents: jax.Array) -> jax.Array:
    """L1(z1, z2) / (L1(img1, img2) + 1e-8) over batch halves
    (lossfunction.py:92-110); pushes distinct noises to distinct images."""
    b = images_fake.shape[0]
    assert b > 1, "diversity loss needs batch > 1 (lossfunction.py:100)"
    half = b // 2
    img1 = images_fake[:half].astype(jnp.float32)
    img2 = images_fake[half:2 * half].astype(jnp.float32)
    z1 = latents[:half].astype(jnp.float32)
    z2 = latents[half:2 * half].astype(jnp.float32)
    l1_latent = jnp.mean(jnp.abs(z1 - z2))
    l1_images = jnp.mean(jnp.abs(img1 - img2))
    return l1_latent / (l1_images + 1e-8)


def lsgan_generator_loss(prediction_fake: jax.Array) -> jax.Array:
    """0.5 * mean((D(fake) - 1)^2) (lossfunction.py:137)."""
    return 0.5 * jnp.mean(jnp.square(prediction_fake.astype(jnp.float32) - 1.0))


def lsgan_discriminator_loss(
    prediction_real: jax.Array, prediction_fake: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Returns the real/fake parts separately, summed by the caller
    (lossfunction.py:156-164, model_wrapper.py:160)."""
    loss_real = 0.5 * jnp.mean(jnp.square(prediction_real.astype(jnp.float32) - 1.0))
    loss_fake = 0.5 * jnp.mean(jnp.square(prediction_fake.astype(jnp.float32)))
    return loss_real, loss_fake
