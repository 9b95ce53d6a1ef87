"""Round-trip `.pt` interop: our variables -> reference state dict -> back."""

import jax
import numpy as np
import pytest

from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
from semantic_pyramid_for_image_generation_tpu.train.state import (
    init_train_state,
    make_optimizers,
)
from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
    convert_discriminator_state_dict,
    convert_generator_state_dict,
    export_discriminator_state_dict,
    export_generator_state_dict,
)

CFG = PyramidGANConfig(channels_factor=8.0)


@pytest.fixture(scope="module")
def state():
    g_tx, d_tx = make_optimizers()
    return init_train_state(jax.random.key(3), CFG, g_tx, d_tx)


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    lb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(la) == len(lb)
    for path, leaf in la:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(lb[key]),
                                   atol=1e-6, err_msg=key)


def test_generator_roundtrip(state):
    variables = {"params": state.g_params, "spectral": state.g_spectral,
                 "batch_stats": state.g_batch_stats}
    sd = export_generator_state_dict(variables)
    back = convert_generator_state_dict(sd)
    _trees_equal(variables["params"], back["params"])
    _trees_equal(variables["spectral"], back["spectral"])
    _trees_equal(variables["batch_stats"], back["batch_stats"])
    # exported keys look like genuine reference keys
    assert "main_path.3.query_convolution.weight_orig" in sd
    assert "final_block.1.running_mean" in sd


def test_discriminator_roundtrip(state):
    variables = {"params": state.d_params, "spectral": state.d_spectral}
    sd = export_discriminator_state_dict(variables)
    back = convert_discriminator_state_dict(sd)
    _trees_equal(variables["params"], back["params"])
    _trees_equal(variables["spectral"], back["spectral"])
    assert "embedding.weight_orig" in sd
    assert "layers.0.main_block.0.weight_orig" in sd
