"""FSDP (2-D data x fsdp mesh) sharding: numerics match single-device, and
large parameter / optimizer leaves are genuinely sharded (ZeRO-3 memory win).

The reference has no parameter sharding at all (nn.DataParallel replicates,
/root/reference/main.py:91-94); this is the TPU-native scaling extension:
GSPMD inserts the per-layer all-gathers and gradient reduce-scatters from
the input placements alone — the train step code is unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
from semantic_pyramid_for_image_generation_tpu.data.synthetic import synthetic_batch
from semantic_pyramid_for_image_generation_tpu.parallel import (
    FSDP_AXIS,
    fsdp_spec,
    make_mesh,
    shard_batch,
    shard_state,
)
from semantic_pyramid_for_image_generation_tpu.parallel.mesh import (
    FSDP_MIN_LEAF_ELEMENTS,
)
from semantic_pyramid_for_image_generation_tpu.train.state import (
    init_train_state,
    make_models,
    make_optimizers,
)
from semantic_pyramid_for_image_generation_tpu.train.step import make_train_step

CFG = PyramidGANConfig().tiny()


@pytest.fixture(scope="module")
def setup():
    g_tx, d_tx = make_optimizers(lr=1e-4)
    state = init_train_state(jax.random.key(0), CFG, g_tx, d_tx)
    step = make_train_step(*make_models(CFG), g_tx, d_tx, donate=False)
    return state, step


def test_fsdp_spec_rules():
    mesh = make_mesh(fsdp=2)
    assert mesh.axis_names == ("data", "fsdp")
    # large leaf, both dims divisible -> largest dim carries the axis
    spec = fsdp_spec((512, 1024), mesh)
    assert tuple(spec) == (None, FSDP_AXIS)
    # conv kernel: shard the biggest divisible extent
    spec = fsdp_spec((3, 3, 64, 512), mesh)
    assert tuple(spec) == (None, None, None, FSDP_AXIS)
    # small leaves stay replicated regardless of divisibility
    assert tuple(fsdp_spec((128,), mesh)) == ()
    assert np.prod((128,)) < FSDP_MIN_LEAF_ELEMENTS
    # indivisible large leaf stays replicated
    assert tuple(fsdp_spec((3, 87 * 1024 + 1), mesh)) == ()


def test_fsdp_mesh_matches_single_device(setup):
    """4x2 (data, fsdp) step must agree numerically with single-device."""
    state, step = setup
    assert jax.device_count() >= 8
    batch = jax.tree.map(jnp.asarray, synthetic_batch(CFG, batch=8))
    single_state, single_metrics = step(state, batch, jax.random.key(4))

    mesh = make_mesh(fsdp=2)
    fsdp_state = shard_state(state, mesh)
    fsdp_batch = shard_batch(batch, mesh)
    multi_state, multi_metrics = step(fsdp_state, fsdp_batch,
                                      jax.random.key(4))
    for k in single_metrics:
        np.testing.assert_allclose(
            float(multi_metrics[k]), float(single_metrics[k]),
            rtol=2e-3, atol=2e-5, err_msg=k)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(multi_state.g_params)[0]),
        np.asarray(jax.tree.leaves(single_state.g_params)[0]), atol=1e-4)


def test_fsdp_state_is_sharded(setup):
    """Params, Adam moments, and the frozen VGG must actually shard: the
    largest leaves carry the fsdp axis and their per-device shard is half
    the global size on a fsdp=2 mesh."""
    state, _ = setup
    mesh = make_mesh(fsdp=2)
    fsdp_state = shard_state(state, mesh)

    def sharded_leaves(tree):
        out = []
        for leaf in jax.tree.leaves(tree):
            spec = leaf.sharding.spec
            if any(s == FSDP_AXIS for s in spec):
                shard = leaf.addressable_shards[0].data
                assert shard.size * 2 == leaf.size
                out.append(leaf)
        return out

    assert sharded_leaves(fsdp_state.g_params)
    assert sharded_leaves(fsdp_state.d_params)
    assert sharded_leaves(fsdp_state.vgg_params)  # frozen 134M VGG included
    # Adam moments mirror the param shardings (the ZeRO optimizer-state win)
    assert sharded_leaves(fsdp_state.g_opt_state[0].mu)
    assert sharded_leaves(fsdp_state.d_opt_state[0].nu)
    # small state (SN u/v, BN stats, step) stays replicated
    for leaf in jax.tree.leaves(fsdp_state.g_spectral):
        assert not any(s == FSDP_AXIS for s in leaf.sharding.spec)


def test_fsdp_multi_step_stays_sharded(setup):
    """Output state keeps the fsdp placements across steps (no silent
    gather-to-replicated), so a long run holds the memory saving."""
    state, step = setup
    mesh = make_mesh(fsdp=2)
    fsdp_state = shard_state(state, mesh)
    batch = shard_batch(
        jax.tree.map(jnp.asarray, synthetic_batch(CFG, batch=8)), mesh)
    for i in range(2):
        fsdp_state, metrics = step(fsdp_state, batch, jax.random.key(5 + i))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    big = [leaf for leaf in jax.tree.leaves(fsdp_state.g_params)
           if leaf.size >= FSDP_MIN_LEAF_ELEMENTS]
    assert big and all(
        any(s == FSDP_AXIS for s in leaf.sharding.spec) for leaf in big)
