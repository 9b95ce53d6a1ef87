"""FID math and evaluator plumbing (SURVEY.md 2.5)."""

import jax.numpy as jnp
import numpy as np
import scipy.linalg

from semantic_pyramid_for_image_generation_tpu.eval.fid import (
    FIDEvaluator,
    fid_from_activations,
    fid_from_statistics,
    normalize_m1_1,
)


def test_fid_formula_matches_reference_math(rng):
    """|mu_r-mu_f|^2 + tr(Sr) + tr(Sf) - 2 tr(sqrtm(Sr Sf)) with imaginary
    stripping (/root/reference/frechet_inception_distance.py:103-123)."""
    real = rng.standard_normal((200, 16)).astype(np.float64)
    fake = 0.5 * rng.standard_normal((180, 16)) + 0.3
    mu_r, cov_r = real.mean(0), np.cov(real, rowvar=False)
    mu_f, cov_f = fake.mean(0), np.cov(fake, rowvar=False)
    diff = mu_r - mu_f
    cov_mean, _ = scipy.linalg.sqrtm(cov_r @ cov_f, disp=False)
    if np.iscomplexobj(cov_mean):
        cov_mean = cov_mean.real
    want = diff @ diff + np.trace(cov_r) + np.trace(cov_f) \
        - 2 * np.trace(cov_mean)
    got = fid_from_statistics(mu_r, cov_r, mu_f, cov_f)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_fid_identical_distributions_near_zero(rng):
    acts = rng.standard_normal((500, 8)).astype(np.float64)
    fid = fid_from_activations(acts, acts.copy())
    assert abs(fid) < 1e-6


def test_fid_separates_distributions(rng):
    a = rng.standard_normal((400, 8))
    b = rng.standard_normal((400, 8)) + 2.0
    assert fid_from_activations(a, b) > fid_from_activations(a, a)


def test_random_inception_requires_opt_in():
    """Without pretrained weights FIDEvaluator must refuse (VERDICT r2 task
    6): a warned-but-plausible non-standard FID is too easy to mistake for a
    real one. allow_random=True (CLI --allow_random_fid) is the explicit
    smoke-run escape hatch."""
    import pytest

    with pytest.raises(ValueError, match="allow_random"):
        FIDEvaluator()


def test_normalize_m1_1_matches_reference(rng):
    x = rng.standard_normal((3, 8, 8, 3)).astype(np.float32) * 5 + 2
    y = np.asarray(normalize_m1_1(jnp.asarray(x)))
    assert y.min() >= -1.0 - 1e-6 and y.max() <= 1.0 + 1e-6
    for i in range(3):
        np.testing.assert_allclose(y[i].min(), -1.0, atol=1e-6)
        np.testing.assert_allclose(y[i].max(), 1.0, atol=1e-6)


def test_normalize_constant_image_is_finite(rng):
    """A constant sample must not NaN the FID path (VERDICT r3 weak 3): the
    reference divides by (mx - mn) bare (misc.py:100-121); ours clamps like
    ensure_m11_images."""
    from semantic_pyramid_for_image_generation_tpu.eval.fid import (
        normalize_0_1,
    )

    x = np.concatenate([
        np.full((1, 8, 8, 3), 0.5, np.float32),
        rng.standard_normal((1, 8, 8, 3)).astype(np.float32)])
    for fn in (normalize_m1_1, normalize_0_1):
        y = np.asarray(fn(jnp.asarray(x)))
        assert np.all(np.isfinite(y)), fn.__name__
    # the non-constant sample is unaffected by the clamp
    y = np.asarray(normalize_m1_1(jnp.asarray(x)))
    np.testing.assert_allclose(y[1].min(), -1.0, atol=1e-6)
    np.testing.assert_allclose(y[1].max(), 1.0, atol=1e-6)


def test_evaluator_end_to_end_random_inception(rng):
    """Random-weight inception still yields a well-defined pipeline: FID of a
    distribution against itself ~ 0, and resize path (64 -> 299) works."""
    ev = FIDEvaluator(allow_random=True)
    images = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    acts = ev.activations(jnp.asarray(images))
    assert acts.shape == (8, 2048)
    batches = [{"images": jnp.asarray(images)}]
    fid = ev.fid(batches, lambda b: b["images"])
    assert abs(fid) < 1e-2


def test_streaming_moments_match_direct_activations(rng):
    """The on-device moment accumulation (FIDEvaluator.fid) must match
    collecting all activations and running np.mean/np.cov (fid.py:103-108
    semantics), including masked remainder batches."""
    import warnings

    from semantic_pyramid_for_image_generation_tpu.eval.fid import (
        fid_from_activations,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ev = FIDEvaluator(allow_random=True)
    images = rng.uniform(-1, 1, (12, 64, 64, 3)).astype(np.float32)
    fakes = rng.uniform(-1, 1, (12, 64, 64, 3)).astype(np.float32)
    batches = [
        {"images": jnp.asarray(images[:8]), "fakes": jnp.asarray(fakes[:8])},
        # padded remainder batch: rows past num_valid must be ignored
        {"images": jnp.asarray(np.concatenate([images[8:], images[:4]], 0)),
         "fakes": jnp.asarray(np.concatenate([fakes[8:], fakes[:4]], 0)),
         "num_valid": 4},
    ]
    got = ev.fid(batches, lambda b: b["fakes"])
    want = fid_from_activations(
        np.concatenate([ev.activations(jnp.asarray(images[:8])),
                        ev.activations(jnp.asarray(images[8:]))]),
        np.concatenate([ev.activations(jnp.asarray(fakes[:8])),
                        ev.activations(jnp.asarray(fakes[8:]))]))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_device_moment_reduction_matches_host(rng):
    """The fully-on-device moments -> FID reduction (fid_from_moments_device:
    eigh-based tr-sqrtm in f32) must agree with the host f64 scipy path at
    realistic activation scales (non-negative, inception-pooled-like)."""
    from semantic_pyramid_for_image_generation_tpu.eval.fid import (
        fid_from_moments_device,
        statistics_from_moments,
    )

    dim, n = 256, 400
    real = np.abs(rng.standard_normal((n, dim))) * 0.4
    fake = np.abs(0.8 * rng.standard_normal((n, dim))) * 0.4 + 0.1
    s1r, s2r = real.sum(0), real.T @ real
    s1f, s2f = fake.sum(0), fake.T @ fake
    mu_r, cov_r = statistics_from_moments(n, s1r, s2r)
    mu_f, cov_f = statistics_from_moments(n, s1f, s2f)
    want = fid_from_statistics(mu_r, cov_r, mu_f, cov_f)
    got = float(fid_from_moments_device(
        n, jnp.asarray(s1r, jnp.float32), jnp.asarray(s2r, jnp.float32),
        jnp.asarray(s1f, jnp.float32), jnp.asarray(s2f, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_evaluator_device_statistics_matches_host(rng):
    """FIDEvaluator(device_statistics=True) must produce the same scalar as
    the default host/f64 reduction on both the streaming and scan paths."""
    import warnings

    import jax

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ev_host = FIDEvaluator(allow_random=True)
        ev_dev = FIDEvaluator(allow_random=True, device_statistics=True)
    images = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    fakes = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    batches = [{"images": jnp.asarray(images), "fakes": jnp.asarray(fakes)}]
    want = ev_host.fid(batches, lambda b: b["fakes"])
    got = ev_dev.fid(batches, lambda b: b["fakes"])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
    got_scan = ev_dev.fid_scan(
        [{"images": images, "fakes": fakes}],
        lambda state, b, key: b["fakes"], state=None,
        rng=jax.random.key(0), group=1)
    np.testing.assert_allclose(got_scan, want, rtol=1e-3, atol=1e-3)


def test_fid_scan_matches_streaming(rng):
    """The O(1)-dispatch lax.scan packaging (FIDEvaluator.fid_scan, VERDICT
    r2 task 2) must agree with the per-batch streaming path, including a
    ragged trailing batch and a partial trailing group (both padded with
    num_valid masking)."""
    import warnings

    import jax

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ev = FIDEvaluator(allow_random=True)
    images = rng.uniform(-1, 1, (10, 64, 64, 3)).astype(np.float32)
    fakes = rng.uniform(-1, 1, (10, 64, 64, 3)).astype(np.float32)
    # 2 full batches of 4 + ragged batch of 2 -> group=2 leaves a partial
    # trailing group of 1
    batches = []
    for lo, hi in ((0, 4), (4, 8), (8, 10)):
        batches.append({"images": images[lo:hi], "fakes": fakes[lo:hi]})

    def pad_stream(b):
        n = b["images"].shape[0]
        if n < 4:
            b = {k: np.concatenate([v, np.repeat(v[:1], 4 - n, 0)])
                 for k, v in b.items()}
            b["num_valid"] = n
        return {k: (jnp.asarray(v) if k != "num_valid" else v)
                for k, v in b.items()}

    want = ev.fid([pad_stream(dict(b)) for b in batches],
                  lambda b: b["fakes"])
    got = ev.fid_scan(batches, lambda state, b, key: b["fakes"],
                      state=None, rng=jax.random.key(0), group=2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
