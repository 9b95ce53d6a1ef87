"""Native C++ mask/normalize kernels vs the numpy reference semantics."""

import numpy as np
import pytest

from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
from semantic_pyramid_for_image_generation_tpu.data.native import (
    generate_masks_batch,
    native_available,
    normalize_image_m11,
)

CFG = PyramidGANConfig()

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable")


def _classify(mask):
    if np.all(mask == 1.0):
        return "ones"
    if np.all(mask == 0.0):
        return "zeros"
    return "partial"


def test_batch_shapes():
    masks = generate_masks_batch(CFG, batch=6, seed=0)
    assert [m.shape for m in masks] == [(6,) + s for s in CFG.mask_shapes]


def test_training_invariants():
    masks = generate_masks_batch(CFG, batch=64, seed=1)
    for b in range(64):
        sample = [m[b] for m in masks]
        kinds = [_classify(m) for m in reversed(sample)]  # deep->shallow
        sel = kinds.index("ones")
        assert all(k == "zeros" for k in kinds[:sel])
        shallower = kinds[sel + 1:]
        if any(k == "partial" for k in shallower):
            assert 0 < sel < 6
            for m in sample:
                assert set(np.unique(m)).issubset({0.0, 1.0})
        else:
            assert all(k in ("zeros", "ones") for k in shallower)


def test_distribution_double_weights_deep():
    masks = generate_masks_batch(CFG, batch=4000, seed=2)
    counts = np.zeros(7)
    for b in range(4000):
        kinds = [_classify(m[b]) for m in reversed(masks)]
        counts[kinds.index("ones")] += 1
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq[:2], 2 / 9, atol=0.03)
    np.testing.assert_allclose(freq[2:], 1 / 9, atol=0.03)


def test_validation_one_hot():
    masks = generate_masks_batch(CFG, batch=32, seed=3, validation=True)
    for b in range(32):
        kinds = [_classify(m[b]) for m in masks]
        assert kinds.count("ones") == 1 and kinds.count("zeros") == 6


def test_deterministic_by_seed():
    a = generate_masks_batch(CFG, batch=8, seed=9, epoch=4)
    b = generate_masks_batch(CFG, batch=8, seed=9, epoch=4)
    c = generate_masks_batch(CFG, batch=8, seed=9, epoch=5)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert any(not np.array_equal(x, z) for x, z in zip(a, c))


def test_normalize_minmax_rgb(rng):
    img = rng.integers(5, 250, (16, 16, 3), dtype=np.uint8)
    out = normalize_image_m11(img)
    assert out.shape == (16, 16, 3)
    np.testing.assert_allclose(out.min(), -1.0, atol=1e-6)
    np.testing.assert_allclose(out.max(), 1.0, atol=1e-6)
    # matches the numpy pipeline formula
    arr = img.astype(np.float32) / 255.0
    want = 2 * (arr - arr.min()) / (arr.max() - arr.min()) - 1
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_normalize_minmax_grayscale(rng):
    img = rng.integers(0, 255, (8, 8), dtype=np.uint8)
    out = normalize_image_m11(img)
    assert out.shape == (8, 8, 3)
    np.testing.assert_array_equal(out[..., 0], out[..., 1])
