"""The fused G/D train step — one jitted XLA program per optimizer iteration.

Replicates the reference loop body (/root/reference/model_wrapper.py:131-190)
with exact state-advance semantics, but as a single compiled function:

  1. frozen-VGG pyramid of the real images (shared by both phases);
  2. D phase: generator forward (train mode, advances G spectral/BN state
     like torch's no_grad forward does), D on real then fake (two spectral
     advances), LSGAN loss, Adam update of D;
  3. G phase: fresh noise, generator forward with gradients (third state
     advance), *updated* D on fakes (third D spectral advance), LSGAN +
     diversity + masked semantic-reconstruction losses, Adam update of G.

Under a data mesh the batch arrives sharded on axis 0, parameters replicated;
the loss means become global means via the psum XLA inserts, which is exactly
the gradient all-reduce of data parallelism (SURVEY.md 2.11).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from semantic_pyramid_for_image_generation_tpu.config import (
    DEFAULT_W_DIV,
    DEFAULT_W_REC,
)
from semantic_pyramid_for_image_generation_tpu.train.losses import (
    diversity_loss,
    lsgan_discriminator_loss,
    lsgan_generator_loss,
    semantic_reconstruction_loss,
)
from semantic_pyramid_for_image_generation_tpu.train.state import TrainState

Batch = Dict[str, Any]  # images (B,H,W,C), labels (B,num_classes), masks: 7-tuple


def ensure_m11_images(images: jax.Array) -> jax.Array:
    """Device-side normalization for the compact uint8 feed
    (Places365Loader(compact_feed=True)): per-image min-max to [-1,1],
    mathematically identical to the host float path (data.py:53 semantics —
    the /255 cancels in the min-max). Float batches pass through unchanged."""
    if images.dtype != jnp.uint8:
        return images
    images = images.astype(jnp.float32)
    flat = images.reshape(images.shape[0], -1)
    mn = flat.min(axis=1)[:, None, None, None]
    mx = flat.max(axis=1)[:, None, None, None]
    return 2.0 * (images - mn) / jnp.maximum(mx - mn, 1e-12) - 1.0


def _float_masks(masks) -> list:
    return [m if jnp.issubdtype(m.dtype, jnp.floating)
            else m.astype(jnp.float32) for m in masks]


def make_train_step(
    generator,
    discriminator,
    vgg,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    w_rec: float = DEFAULT_W_REC,
    w_div: float = DEFAULT_W_DIV,
    donate: bool = True,
    remat_vgg: bool = False,
    fused_discriminator: bool = False,
    spectral_update: bool = True,
) -> Callable[[TrainState, Batch, jax.Array], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the jitted `(state, batch, rng) -> (state, metrics)` step.

    remat_vgg: rematerialize the VGG forward over the fakes in the G backward
    (jax.checkpoint) — trades ~one extra VGG forward for dropping the deepest
    activation set, unlocking larger per-chip batches.

    fused_discriminator: perf mode — run D(real ++ fake) as one 2B-batch pass
    in the D phase (identical per-element math, one spectral advance instead
    of two). Requires compat_projection=False: the reference's (B,B,128)
    broadcast quirk mixes batch rows and cannot be split blockwise. The ONLY
    semantic difference from the separate-pass step is that single spectral
    advance: with spectral updates frozen the two modes produce identical
    post-update parameters over multiple steps
    (tests/test_train_step.py::test_fused_discriminator_*).

    spectral_update: test-only switch — False freezes the power-iteration
    state (every sigma pass reuses stored u/v), isolating batching effects
    from u-trajectory effects in equivalence tests. Production keeps True
    (torch advances u on every training-mode forward; SURVEY.md hard part 1).

    Spectral norm runs as a batched sigma pass per forward
    (ops/spectral_norm.py::compute_sigma_tree): same per-layer math and u/v
    trajectories as the inline module path, but ~10 stacked matmuls per net
    instead of ~350 serialized tiny ops."""
    if fused_discriminator:
        assert not discriminator.config.compat_projection, (
            "fused_discriminator requires compat_projection=False")

    from semantic_pyramid_for_image_generation_tpu.ops.spectral_norm import (
        compute_sigma_tree,
    )

    def train_step(state: TrainState, batch: Batch, rng: jax.Array):
        images = ensure_m11_images(batch["images"])
        labels = batch["labels"].astype(jnp.float32)
        masks = _float_masks(batch["masks"])
        latent_dim = generator.config.latent_dim
        b = images.shape[0]
        rng = jax.random.fold_in(rng, state.step)
        rng_d, rng_g = jax.random.split(rng)
        # test-only injection hook (tests/test_full_step_parity.py): a batch
        # may pin the per-phase latent draws so a trajectory can be replayed
        # against the live reference loop with identical noise
        inject_noise_d = batch.get("noise_d")
        inject_noise_g = batch.get("noise_g")

        # ---- shared frozen-VGG pyramid of the real batch (model_wrapper 144-145)
        features_real = vgg.apply({"params": state.vgg_params}, images)
        features_real = [jax.lax.stop_gradient(f) for f in features_real]

        # ---- discriminator phase -----------------------------------------
        noise_d = (jax.random.normal(rng_d, (b, latent_dim), jnp.float32)
                   if inject_noise_d is None else inject_noise_d)
        g_sigmas_1, g_spectral = compute_sigma_tree(
            state.g_params, state.g_spectral, update=spectral_update)
        fake_d, g_mut = generator.apply(
            {"params": state.g_params, "spectral": state.g_spectral,
             "batch_stats": state.g_batch_stats, "sigmas": g_sigmas_1},
            noise_d, features_real, masks, labels, train=True,
            mutable=["batch_stats"])
        fake_d = jax.lax.stop_gradient(fake_d)
        g_batch_stats = g_mut["batch_stats"]

        def d_loss_fn(d_params):
            d_sigmas_1, d_spec_1 = compute_sigma_tree(
                d_params, state.d_spectral, update=spectral_update)
            if fused_discriminator:
                pred = discriminator.apply(
                    {"params": d_params, "spectral": state.d_spectral,
                     "sigmas": d_sigmas_1},
                    jnp.concatenate([images.astype(fake_d.dtype), fake_d], 0),
                    jnp.concatenate([labels, labels], 0), train=True)
                pred_real, pred_fake = pred[:b], pred[b:]
                d_spectral_new = d_spec_1
            else:
                pred_real = discriminator.apply(
                    {"params": d_params, "spectral": state.d_spectral,
                     "sigmas": d_sigmas_1},
                    images, labels, train=True)
                d_sigmas_2, d_spec_2 = compute_sigma_tree(
                    d_params, d_spec_1, update=spectral_update)
                pred_fake = discriminator.apply(
                    {"params": d_params, "spectral": d_spec_1,
                     "sigmas": d_sigmas_2},
                    fake_d, labels, train=True)
                d_spectral_new = d_spec_2
            loss_real, loss_fake = lsgan_discriminator_loss(pred_real, pred_fake)
            return loss_real + loss_fake, (loss_real, loss_fake, d_spectral_new)

        (_, (loss_d_real, loss_d_fake, d_spectral)), d_grads = (
            jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params))
        d_updates, d_opt_state = d_tx.update(
            d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- generator phase (sees the UPDATED discriminator) -------------
        noise_g = (jax.random.normal(rng_g, (b, latent_dim), jnp.float32)
                   if inject_noise_g is None else inject_noise_g)

        def g_loss_fn(g_params):
            g_sigmas_2, g_spec_2 = compute_sigma_tree(
                g_params, g_spectral, update=spectral_update)
            fake, g_mut2 = generator.apply(
                {"params": g_params, "spectral": g_spectral,
                 "batch_stats": g_batch_stats, "sigmas": g_sigmas_2},
                noise_g, features_real, masks, labels, train=True,
                mutable=["batch_stats"])
            d_sigmas_3, d_spec_3 = compute_sigma_tree(
                d_params, d_spectral, update=spectral_update)
            pred_fake = discriminator.apply(
                {"params": d_params, "spectral": d_spectral,
                 "sigmas": d_sigmas_3},
                fake, labels, train=True)
            loss_g = lsgan_generator_loss(pred_fake)
            loss_div = w_div * diversity_loss(fake, noise_g)
            vgg_fwd = lambda img: vgg.apply(  # noqa: E731
                {"params": state.vgg_params}, img)
            if remat_vgg:
                vgg_fwd = jax.checkpoint(vgg_fwd)
            features_fake = vgg_fwd(fake)
            loss_rec = w_rec * semantic_reconstruction_loss(
                features_real, features_fake, masks)
            total = loss_g + loss_div + loss_rec
            aux = (loss_g, loss_div, loss_rec,
                   g_spec_2, g_mut2["batch_stats"], d_spec_3)
            return total, aux

        (_, g_aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params)
        (loss_g, loss_div, loss_rec,
         g_spectral, g_batch_stats, d_spectral) = g_aux
        g_updates, g_opt_state = g_tx.update(
            g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params, g_spectral=g_spectral,
            g_batch_stats=g_batch_stats, g_opt_state=g_opt_state,
            d_params=d_params, d_spectral=d_spectral, d_opt_state=d_opt_state)
        metrics = {
            # metric names follow the reference logger (model_wrapper.py:197-202)
            "loss_discriminator_real": loss_d_real,
            "loss_discriminator_fake": loss_d_fake,
            "loss_generator": loss_g,
            "loss_generator_semantic_reconstruction": loss_rec,
            "loss_generator_diversity": loss_div,
        }
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_generate_fn(generator, vgg):
    """Jitted eval-mode sampler: (state, images, masks, labels, rng) -> fakes.
    Mirrors the validation/inference generation path
    (/root/reference/frechet_inception_distance.py:82-90). Pass `noise`
    explicitly to pin the latent draw (e.g. the batched 7x7 grid concatenates
    per-level draws so one 49-row dispatch reproduces seven 7-row ones)."""
    from semantic_pyramid_for_image_generation_tpu.ops.spectral_norm import (
        compute_sigma_tree,
    )

    @jax.jit
    def generate(state: TrainState, images, masks, labels, rng, noise=None):
        images = ensure_m11_images(images)
        features = vgg.apply({"params": state.vgg_params}, images)
        if noise is None:
            noise = jax.random.normal(
                rng, (images.shape[0], generator.config.latent_dim),
                jnp.float32)
        sigmas, _ = compute_sigma_tree(
            state.g_params, state.g_spectral, update=False)
        return generator.apply(
            {"params": state.g_params, "spectral": state.g_spectral,
             "batch_stats": state.g_batch_stats, "sigmas": sigmas},
            noise, features, _float_masks(masks), labels.astype(jnp.float32),
            train=False)

    return generate
