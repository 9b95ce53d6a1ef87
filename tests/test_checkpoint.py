"""Orbax checkpoint round-trip and reference `.pt` import path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
from semantic_pyramid_for_image_generation_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from semantic_pyramid_for_image_generation_tpu.train.state import (
    init_train_state,
    make_optimizers,
)
from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
    load_reference_gan_checkpoint,
)
from torch_ref import import_reference

CFG = PyramidGANConfig().tiny()


@pytest.fixture(scope="module")
def state():
    g_tx, d_tx = make_optimizers()
    return init_train_state(jax.random.key(0), CFG, g_tx, d_tx)


def test_orbax_round_trip(tmp_path, state):
    new = state.replace(step=state.step + 41)
    path = save_checkpoint(str(tmp_path), new)
    assert os.path.basename(path) == "checkpoint_041"
    restored = restore_checkpoint(path, state)
    assert int(restored.step) == 41
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.g_params)[0]),
        np.asarray(jax.tree.leaves(state.g_params)[0]))
    assert latest_checkpoint(str(tmp_path)) == path


def test_reference_pt_checkpoint_import(tmp_path):
    """A torch-saved reference GAN checkpoint loads into our state."""
    ref_models = import_reference("models")
    torch.manual_seed(0)
    gen = ref_models.Generator(channels_factor=8)
    disc = ref_models.Discriminator(channel_factor=8)
    pt = tmp_path / "checkpoint_000.pt"
    torch.save({"generator": gen.state_dict(),
                "discriminator": disc.state_dict(),
                "generator_optimizer": {}, "discriminator_optimizer": {}},
               str(pt))
    g_vars, d_vars = load_reference_gan_checkpoint(str(pt))
    cfg = PyramidGANConfig(channels_factor=8)
    g_tx, d_tx = make_optimizers()
    state = init_train_state(jax.random.key(0), cfg, g_tx, d_tx,
                             g_variables=g_vars, d_variables=d_vars)
    np.testing.assert_allclose(
        np.asarray(state.g_params["linear_layer"]["kernel"]),
        gen.linear_layer.weight_orig.detach().numpy().T)
    np.testing.assert_allclose(
        np.asarray(state.d_spectral["embedding"]["u"]),
        disc.embedding.weight_u.detach().numpy())
