"""Loss parity against the genuine reference lossfunction.py."""

import jax.numpy as jnp
import numpy as np
import torch

from semantic_pyramid_for_image_generation_tpu.train.losses import (
    diversity_loss,
    lsgan_discriminator_loss,
    lsgan_generator_loss,
    semantic_reconstruction_loss,
)
from torch_ref import import_reference

ref_loss = import_reference("lossfunction")


def _pyramid(rng, batch=4):
    feats = []
    masks = []
    for c, hw in ((8, 16), (16, 8)):
        feats.append(rng.standard_normal((batch, c, hw, hw)).astype(np.float32))
        masks.append((rng.random((batch, 1, hw, hw)) < 0.5).astype(np.float32))
    for d in (64, 32):
        feats.append(rng.standard_normal((batch, d)).astype(np.float32))
        masks.append((rng.random((batch, d)) < 0.5).astype(np.float32))
    return feats, masks


def test_semantic_reconstruction_loss_parity(rng):
    real_nchw, masks_nchw = _pyramid(rng)
    fake_nchw, _ = _pyramid(rng)
    want = ref_loss.SemanticReconstructionLoss()(
        [torch.from_numpy(f) for f in real_nchw],
        [torch.from_numpy(f) for f in fake_nchw],
        [torch.from_numpy(m) for m in masks_nchw],
    )
    to_nhwc = lambda x: x.transpose(0, 2, 3, 1) if x.ndim == 4 else x  # noqa: E731
    got = semantic_reconstruction_loss(
        [jnp.asarray(to_nhwc(f)) for f in real_nchw],
        [jnp.asarray(to_nhwc(f)) for f in fake_nchw],
        [jnp.asarray(to_nhwc(m)) for m in masks_nchw],
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_diversity_loss_parity(rng):
    images = rng.standard_normal((6, 3, 16, 16)).astype(np.float32)
    latents = rng.standard_normal((6, 128)).astype(np.float32)
    want = ref_loss.DiversityLoss()(torch.from_numpy(images),
                                    torch.from_numpy(latents))
    got = diversity_loss(jnp.asarray(images.transpose(0, 2, 3, 1)),
                         jnp.asarray(latents))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_lsgan_losses_parity(rng):
    pred_real = rng.standard_normal((4, 4, 128)).astype(np.float32)
    pred_fake = rng.standard_normal((4, 4, 128)).astype(np.float32)
    want_g = ref_loss.LSGANGeneratorLoss()(torch.from_numpy(pred_fake))
    want_dr, want_df = ref_loss.LSGANDiscriminatorLoss()(
        torch.from_numpy(pred_real), torch.from_numpy(pred_fake))
    got_g = lsgan_generator_loss(jnp.asarray(pred_fake))
    got_dr, got_df = lsgan_discriminator_loss(jnp.asarray(pred_real),
                                              jnp.asarray(pred_fake))
    np.testing.assert_allclose(float(got_g), float(want_g), rtol=1e-6)
    np.testing.assert_allclose(float(got_dr), float(want_dr), rtol=1e-6)
    np.testing.assert_allclose(float(got_df), float(want_df), rtol=1e-6)
