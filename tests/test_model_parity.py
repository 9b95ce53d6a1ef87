"""Forward parity of Generator / Discriminator / VGG16 against the genuine
reference implementation (imported from /root/reference with library stubs).

These tests execute both frameworks on identical inputs with identical weights
(converted via utils/pt_interop) and demand elementwise agreement, in both
eval mode (stored spectral vectors / running BN stats) and training mode
(one power-iteration step + batch statistics).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
from semantic_pyramid_for_image_generation_tpu.models import (
    Discriminator,
    Generator,
    VGG16,
)
from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
    convert_discriminator_state_dict,
    convert_generator_state_dict,
    convert_vgg16_state_dict,
)
from torch_ref import import_reference, to_nchw_torch

ref_models = import_reference("models")

CF = 8  # width-reduced G/D for test speed; VGG feature contract stays full


def _pyramid_inputs(rng, batch=2, num_classes=365):
    feats_nchw, masks_nchw = [], []
    for c, hw in ((64, 128), (128, 64), (256, 32), (512, 16), (512, 8)):
        feats_nchw.append(rng.standard_normal((batch, c, hw, hw)).astype(np.float32))
        masks_nchw.append(
            (rng.random((batch, 1, hw, hw)) < 0.7).astype(np.float32))
    for d in (4096, num_classes):
        feats_nchw.append(rng.standard_normal((batch, d)).astype(np.float32))
        masks_nchw.append((rng.random((batch, d)) < 0.7).astype(np.float32))
    labels = np.eye(num_classes, dtype=np.float32)[
        rng.integers(0, num_classes, size=batch)]
    return feats_nchw, masks_nchw, labels


def _to_nhwc_lists(feats_nchw, masks_nchw):
    feats = [f.transpose(0, 2, 3, 1) if f.ndim == 4 else f for f in feats_nchw]
    masks = [m.transpose(0, 2, 3, 1) if m.ndim == 4 else m for m in masks_nchw]
    return feats, masks


class TestParameterCounts:
    """Full-width parameter counts vs the numbers /root/reference/main.py:76-77
    prints. Uses jax.eval_shape: traces init without compiling/executing."""

    def test_generator_param_count_matches_reference(self):
        cfg = PyramidGANConfig()
        gen = Generator(cfg)
        feats = [jnp.zeros((1,) + s) for s in cfg.feature_shapes]
        masks = [jnp.zeros((1,) + s) for s in cfg.mask_shapes]
        variables = jax.eval_shape(
            lambda: gen.init(jax.random.key(0), jnp.zeros((1, 128)), feats,
                             masks, jnp.zeros((1, 365)), train=False))
        n = sum(int(np.prod(x.shape))
                for x in jax.tree.leaves(variables["params"]))
        assert n == 29_967_047

    def test_discriminator_param_count_matches_reference(self):
        disc = Discriminator(PyramidGANConfig())
        variables = jax.eval_shape(
            lambda: disc.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)),
                              jnp.zeros((1, 365)), train=False))
        n = sum(int(np.prod(x.shape))
                for x in jax.tree.leaves(variables["params"]))
        assert n == 16_820_994


class TestGeneratorParity:
    @pytest.fixture(scope="class")
    def setup(self):
        torch.manual_seed(0)
        ref = ref_models.Generator(channels_factor=CF)
        cfg = PyramidGANConfig(channels_factor=CF)
        ours = Generator(cfg)
        variables = convert_generator_state_dict(ref.state_dict())
        rng = np.random.default_rng(1)
        feats_nchw, masks_nchw, labels = _pyramid_inputs(rng)
        latent = rng.standard_normal((2, 128)).astype(np.float32)
        return ref, ours, variables, feats_nchw, masks_nchw, labels, latent

    def test_eval_forward_parity(self, setup):
        ref, ours, variables, feats_nchw, masks_nchw, labels, latent = setup
        ref.eval()
        with torch.no_grad():
            want = ref(torch.from_numpy(latent),
                       [torch.from_numpy(f) for f in feats_nchw],
                       [torch.from_numpy(m) for m in masks_nchw],
                       torch.from_numpy(labels))
        feats, masks = _to_nhwc_lists(feats_nchw, masks_nchw)
        got = ours.apply(variables, jnp.asarray(latent),
                         [jnp.asarray(f) for f in feats],
                         [jnp.asarray(m) for m in masks],
                         jnp.asarray(labels), train=False)
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1), atol=2e-4)

    def test_train_forward_parity_and_state_updates(self, setup):
        ref, ours, variables, feats_nchw, masks_nchw, labels, latent = setup
        ref.train()
        with torch.no_grad():
            want = ref(torch.from_numpy(latent),
                       [torch.from_numpy(f) for f in feats_nchw],
                       [torch.from_numpy(m) for m in masks_nchw],
                       torch.from_numpy(labels))
        feats, masks = _to_nhwc_lists(feats_nchw, masks_nchw)
        got, mutated = ours.apply(
            variables, jnp.asarray(latent),
            [jnp.asarray(f) for f in feats],
            [jnp.asarray(m) for m in masks],
            jnp.asarray(labels), train=True,
            mutable=["spectral", "batch_stats"])
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1), atol=2e-4)
        # spectral u advanced identically to the torch buffer
        sd = ref.state_dict()
        np.testing.assert_allclose(
            np.asarray(mutated["spectral"]["linear_layer"]["u"]),
            sd["linear_layer.weight_u"].numpy(), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(mutated["spectral"]["block_2"]["conv_1"]["u"]),
            sd["main_path.2.main_block.3.weight_u"].numpy(), atol=1e-5)
        # CBN running stats advanced identically (momentum 0.001)
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["block_0"]["cbn_1"]["mean"]),
            sd["main_path.0.main_block.0.batch_norm.running_mean"].numpy(),
            atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["final_bn"]["var"]),
            sd["final_block.1.running_var"].numpy(), atol=1e-5)


class TestDiscriminatorParity:
    @pytest.fixture(scope="class")
    def setup(self):
        torch.manual_seed(1)
        ref = ref_models.Discriminator(channel_factor=CF)
        cfg = PyramidGANConfig(channels_factor=CF)
        ours = Discriminator(cfg)
        variables = convert_discriminator_state_dict(ref.state_dict())
        rng = np.random.default_rng(2)
        images = rng.standard_normal((3, 3, 128, 128)).astype(np.float32)
        labels = np.eye(365, dtype=np.float32)[rng.integers(0, 365, size=3)]
        return ref, ours, variables, images, labels

    def test_eval_forward_parity_compat_quirk_shape(self, setup):
        ref, ours, variables, images, labels = setup
        ref.eval()
        with torch.no_grad():
            want = ref(torch.from_numpy(images), torch.from_numpy(labels))
        got = ours.apply(variables, jnp.asarray(images.transpose(0, 2, 3, 1)),
                         jnp.asarray(labels), train=False)
        # the reference's broadcast quirk: output is (B, B, 128)
        assert want.shape == (3, 3, 128)
        assert got.shape == (3, 3, 128)
        # random-init eval-mode sigmas make activations blow up over 7 blocks
        # (values ~1e22); relative agreement is what matters here
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4)

    def test_train_forward_parity(self, setup):
        ref, ours, variables, images, labels = setup
        ref.train()
        with torch.no_grad():
            want = ref(torch.from_numpy(images), torch.from_numpy(labels))
        got, mutated = ours.apply(
            variables, jnp.asarray(images.transpose(0, 2, 3, 1)),
            jnp.asarray(labels), train=True, mutable=["spectral"])
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4)
        sd = ref.state_dict()
        np.testing.assert_allclose(
            np.asarray(mutated["spectral"]["embedding"]["u"]),
            sd["embedding.weight_u"].numpy(), atol=1e-5)

    def test_canonical_projection_mode(self, setup):
        _, _, variables, images, labels = setup
        cfg = PyramidGANConfig(channels_factor=CF, compat_projection=False)
        ours = Discriminator(cfg)
        got = ours.apply(variables, jnp.asarray(images.transpose(0, 2, 3, 1)),
                         jnp.asarray(labels), train=False)
        assert got.shape == (3, 1)


class TestVGG16Parity:
    def test_pyramid_forward_parity(self):
        torch.manual_seed(2)
        ref = ref_models.VGG16()
        # swap in a 365-way head as main.py does implicitly via the .pt load
        ref.vgg16.classifier[6] = torch.nn.Linear(4096, 365)
        ref.eval()
        cfg = PyramidGANConfig(image_size=64)
        ours = VGG16(cfg)
        variables = convert_vgg16_state_dict(ref.state_dict())
        rng = np.random.default_rng(3)
        images = (rng.random((2, 3, 64, 64)).astype(np.float32) * 2.0) - 1.0
        with torch.no_grad():
            want = ref(torch.from_numpy(images))
        got = ours.apply(variables, jnp.asarray(images.transpose(0, 2, 3, 1)))
        assert len(want) == len(got) == 7
        for w, g in zip(want, got):
            g = np.asarray(g)
            if g.ndim == 4:
                g = g.transpose(0, 3, 1, 2)
            np.testing.assert_allclose(g, w.numpy(), atol=3e-4)

    def test_grayscale_and_return_output(self):
        torch.manual_seed(3)
        # the reference constructor always swaps in a 365-way head
        # (/root/reference/models.py:176-177)
        ref = ref_models.VGG16(return_output=True)
        ref.eval()
        cfg = PyramidGANConfig(image_size=64)
        ours = VGG16(cfg, return_output=True)
        variables = convert_vgg16_state_dict(ref.state_dict())
        rng = np.random.default_rng(4)
        images = rng.random((2, 1, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(images).repeat_interleave(3, dim=1))
        got = ours.apply(variables, jnp.asarray(images.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=3e-4)
