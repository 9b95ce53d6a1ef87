"""Fused Pallas separable-resize kernel vs the einsum reference
(ops/resize.py). Runs in interpret mode off-TPU, so values and the custom
VJP are checked device-independently."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_pyramid_for_image_generation_tpu.ops.pallas.resize import (
    upsample_align_corners_pallas,
)
from semantic_pyramid_for_image_generation_tpu.ops.resize import (
    _apply_separable,
    _bilinear_matrix_align_corners,
)


def _einsum_upsample(x, scale=2):
    _, h, w, _ = x.shape
    return _apply_separable(x, _bilinear_matrix_align_corners(h, h * scale),
                            _bilinear_matrix_align_corners(w, w * scale))


@pytest.mark.parametrize("shape", [(2, 8, 8, 16), (1, 16, 8, 128),
                                   (2, 4, 4, 64), (1, 32, 32, 256)])
def test_forward_matches_einsum(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(upsample_align_corners_pallas(x)),
        np.asarray(_einsum_upsample(x)), atol=2e-6)


@pytest.mark.parametrize("shape", [(2, 8, 8, 16), (1, 16, 8, 128)])
def test_custom_vjp_matches_einsum_grad(shape):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    g1 = jax.grad(
        lambda x: jnp.sum(jnp.sin(upsample_align_corners_pallas(x))))(x)
    g2 = jax.grad(lambda x: jnp.sum(jnp.sin(_einsum_upsample(x))))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-6)


def test_row_blocking_path():
    """Shapes big enough to trigger output-row blocking still agree."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 128)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(upsample_align_corners_pallas(x)),
        np.asarray(_einsum_upsample(x)), atol=2e-6)
