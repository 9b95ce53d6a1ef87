"""Fused Pallas 2x2 max-pool kernel vs the XLA pairwise reference
(ops/pool.py). Runs in interpret mode off-TPU, so forward values and the
custom VJP (JAX balanced-eq tie routing) are checked device-independently."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_pyramid_for_image_generation_tpu.ops.pallas.pool import (
    max_pool_2x2_pallas,
    supported_shape,
)
from semantic_pyramid_for_image_generation_tpu.ops.pool import max_pool_2d


def _pairwise(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.maximum(x[:, :, 0], x[:, :, 1])
    return jnp.maximum(x[:, :, :, 0], x[:, :, :, 1])


SHAPES = [(2, 256, 256, 4), (1, 128, 128, 8), (2, 128, 128, 1)]


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_pairwise(shape):
    assert supported_shape(*shape[1:])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(max_pool_2x2_pallas(x)), np.asarray(_pairwise(x)))


@pytest.mark.parametrize("shape", SHAPES[:2])
def test_custom_vjp_matches_pairwise_grad(shape):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(shape).astype(np.float32)
    # duplicate rows to force ties through the balanced-eq routing
    x[:, ::2] = x[:, 1::2]
    x = jnp.asarray(x)
    g1 = jax.grad(lambda x: jnp.sum(jnp.sin(max_pool_2x2_pallas(x))))(x)
    g2 = jax.grad(lambda x: jnp.sum(jnp.sin(_pairwise(x))))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-6)


def test_unsupported_shapes_rejected():
    # deep pools (W < 128) stay on the XLA path
    assert not supported_shape(16, 16, 512)
    assert not supported_shape(8, 8, 512)


def test_dispatcher_consistency():
    """max_pool_2d routes only under bf16 + TPU, so off-TPU it must equal the
    pairwise form regardless of env gates."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(max_pool_2d(x)), np.asarray(_pairwise(x)))
