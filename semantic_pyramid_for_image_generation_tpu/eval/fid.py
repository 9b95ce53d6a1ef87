"""Frechet Inception Distance (/root/reference/frechet_inception_distance.py).

Pipeline parity with the reference:
  * per-sample min-max normalization to [-1, 1] (misc.normalize_m1_1_batch),
  * bilinear resize to 299x299 with align_corners=False semantics,
  * InceptionV3 Mixed_7c activations pooled to 2048-d,
  * classic FID on host: |mu_r - mu_f|^2 + tr(S_r) + tr(S_f)
    - 2 tr(sqrtm(S_r S_f)), scipy sqrtm with imaginary-part stripping.

TPU-native split: activation extraction runs jitted on device (batched,
sharded-batch friendly); the 2048x2048 statistics solve is tiny and stays on
host CPU (SURVEY.md 2.9).

Note: the reference label-device bug (fid.py:90 passes CPU labels under CUDA)
does not exist here — batches are pure pytrees.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from semantic_pyramid_for_image_generation_tpu.models.inception import (
    InceptionV3Features,
)
from semantic_pyramid_for_image_generation_tpu.ops.resize import (
    resize_bilinear_half_pixel,
)


def normalize_m1_1(images: jax.Array) -> jax.Array:
    """Per-sample min-max to [-1, 1] (/root/reference/misc.py:112-121).

    Unlike the reference, the divisor is clamped (like ensure_m11_images,
    train/step.py): the reference divides by (mx - mn) bare and NaNs the FID
    on any constant image; a constant sample maps to all-(-1) here instead."""
    flat = images.reshape(images.shape[0], -1)
    mn = flat.min(axis=1)[:, None, None, None]
    mx = flat.max(axis=1)[:, None, None, None]
    return 2.0 * (images - mn) / jnp.maximum(mx - mn, 1e-12) - 1.0


def normalize_0_1(images: jax.Array) -> jax.Array:
    """Per-sample min-max to [0, 1] (/root/reference/misc.py:100-109),
    with the same constant-image clamp as normalize_m1_1."""
    flat = images.reshape(images.shape[0], -1)
    mn = flat.min(axis=1)[:, None, None, None]
    mx = flat.max(axis=1)[:, None, None, None]
    return (images - mn) / jnp.maximum(mx - mn, 1e-12)


def fid_from_statistics(mu_real: np.ndarray, cov_real: np.ndarray,
                        mu_fake: np.ndarray, cov_fake: np.ndarray) -> float:
    """Host-side FID formula (fid.py:103-123), including the reference's
    imaginary-part stripping of the matrix square root."""
    diff = mu_real - mu_fake
    cov_mean, _ = scipy.linalg.sqrtm(cov_real @ cov_fake, disp=False)
    if np.iscomplexobj(cov_mean):
        cov_mean = cov_mean.real
    return float(diff @ diff + np.trace(cov_real) + np.trace(cov_fake)
                 - 2.0 * np.trace(cov_mean))


def trace_sqrtm_product(cov_real: jax.Array, cov_fake: jax.Array) -> jax.Array:
    """tr(sqrtm(Σr·Σf)) fully on device — the one term of the FID formula the
    reference computes with host scipy (frechet_inception_distance.py:117).

    Uses tr sqrtm(Σr Σf) = tr sqrtm(Σf^{1/2} Σr Σf^{1/2}): the inner matrix is
    symmetric PSD, so two jnp.linalg.eigh decompositions (which XLA lowers on
    TPU) replace the general-matrix scipy sqrtm, and the trace is the sum of
    clipped-eigenvalue square roots — no imaginary parts to strip by
    construction."""
    w_f, v_f = jnp.linalg.eigh(cov_fake)
    sqrt_f = (v_f * jnp.sqrt(jnp.clip(w_f, 0.0, None))) @ v_f.T
    m = sqrt_f @ cov_real @ sqrt_f
    w = jnp.linalg.eigh(0.5 * (m + m.T))[0]
    return jnp.sum(jnp.sqrt(jnp.clip(w, 0.0, None)))


@jax.jit
def fid_from_moments_device(n: jax.Array,
                            s1_real: jax.Array, s2_real: jax.Array,
                            s1_fake: jax.Array, s2_fake: jax.Array) -> jax.Array:
    """The whole moments -> FID-scalar reduction as one jittable device
    program (statistics_from_moments + fid_from_statistics, but on device):
    only ONE scalar crosses to the host instead of the 34 MB of moments.

    Tradeoff vs the host path: the single-pass covariance cancellation and
    the eigendecompositions run in float32 (TPU has no fast f64), where the
    host path deliberately uses f64 (see statistics_from_moments). Parity of
    the composed scalar is pinned by test_fid.py at realistic activation
    scales; the host path stays the default."""
    n = jnp.asarray(n, jnp.float32)
    mu_r = s1_real / n
    cov_r = (s2_real - n * jnp.outer(mu_r, mu_r)) / jnp.maximum(n - 1.0, 1.0)
    mu_f = s1_fake / n
    cov_f = (s2_fake - n * jnp.outer(mu_f, mu_f)) / jnp.maximum(n - 1.0, 1.0)
    diff = mu_r - mu_f
    return (diff @ diff + jnp.trace(cov_r) + jnp.trace(cov_f)
            - 2.0 * trace_sqrtm_product(cov_r, cov_f))


def fid_from_activations(real: np.ndarray, fake: np.ndarray) -> float:
    mu_r, cov_r = np.mean(real, axis=0), np.cov(real, rowvar=False)
    mu_f, cov_f = np.mean(fake, axis=0), np.cov(fake, rowvar=False)
    return fid_from_statistics(mu_r, cov_r, mu_f, cov_f)


def statistics_from_moments(n: float, s1: np.ndarray, s2: np.ndarray):
    """(count, sum, sum-of-outer-products) -> (mu, unbiased covariance);
    identical to np.mean/np.cov(rowvar=False) up to float association.

    The single-pass cancellation (s2 - n mu mu^T) is done in float64 on host
    (free at 2048^2 scale) — in f32 it can measurably perturb FID at 10k
    samples, where np.cov would have used f64."""
    s1 = np.asarray(s1, np.float64)
    s2 = np.asarray(s2, np.float64)
    mu = s1 / n
    cov = (s2 - n * np.outer(mu, mu)) / max(n - 1.0, 1.0)
    return mu, cov


class FIDEvaluator:
    """Batched FID evaluation driver.

    `inception_variables=None` initializes the backbone randomly — the
    reported value is then NOT a standard FID, so construction *raises*
    unless `allow_random=True` is passed explicitly (pipeline-smoke runs,
    tests). Pass converted torchvision inception_v3 weights
    (models.inception.convert_inception_state_dict; see
    scripts/download_inception.sh) for standard FID — the reference gets this
    implicitly from `pretrained=True`
    (/root/reference/frechet_inception_distance.py:22).
    """

    def __init__(self, inception_variables: Optional[Dict[str, Any]] = None,
                 dtype: str = "float32", allow_random: bool = False,
                 device_statistics: bool = False):
        # device_statistics=True finishes the moments -> FID reduction on
        # device (fid_from_moments_device): one scalar crosses to host instead
        # of 34 MB of moments + scipy sqrtm. f32 statistics — see the
        # tradeoff note on fid_from_moments_device; default stays host/f64.
        self.device_statistics = device_statistics
        self.model = InceptionV3Features(dtype=jnp.dtype(dtype))
        self.random_init = inception_variables is None
        if inception_variables is None:
            if not allow_random:
                raise ValueError(
                    "FIDEvaluator requires pretrained Inception weights for a "
                    "standard FID (--load_inception, see scripts/"
                    "download_inception.sh). Pass allow_random=True (CLI: "
                    "--allow_random_fid) to run with a randomly initialized "
                    "backbone — pipeline smoke only, NOT a comparable FID.")
            import warnings

            warnings.warn(
                "FIDEvaluator built WITHOUT pretrained Inception weights — "
                "the backbone is randomly initialized and the reported value "
                "is NOT a standard FID (pipeline-smoke only). Pass converted "
                "torchvision inception_v3 weights via --load_inception for "
                "comparable numbers.", UserWarning, stacklevel=2)
            inception_variables = self.model.init(
                jax.random.key(0), jnp.zeros((1, 299, 299, 3), jnp.float32))
        self.variables = inception_variables

        @jax.jit
        def activations(variables, images):
            images = normalize_m1_1(images.astype(jnp.float32))
            if images.shape[1] != 299 or images.shape[2] != 299:
                images = resize_bilinear_half_pixel(images, 299, 299)
            return self.model.apply(variables, images)

        self._activations = activations

        @jax.jit
        def moments(variables, images, num_valid):
            """Per-batch streaming FID moments, fully on device: masked
            (count, sum, sum-of-outer-products) of the 2048-d activations.
            Keeping the accumulation on device means the validation walk
            issues only async dispatches — no per-batch device->host sync
            (measured 1750 s -> ~60 s for FID-10k on the relay-attached
            chip)."""
            acts = activations(variables, images)
            keep = (jnp.arange(acts.shape[0]) < num_valid)
            kept = jnp.where(keep[:, None], acts, 0.0)
            s1 = kept.sum(axis=0)
            s2 = jnp.matmul(kept.T, kept,
                            precision=jax.lax.Precision.HIGHEST)
            return s1, s2

        self._moments = moments

    def activations(self, images: jax.Array) -> np.ndarray:
        return np.asarray(self._activations(self.variables, images))

    def _scan_moments_fn(self, generate):
        """Build the jitted whole-group moment pass: ONE dispatch walks a
        stacked group of batches with lax.scan, generating fakes and
        accumulating real+fake (sum, sum-of-outer-products) on device.
        `generate(state, batch, key) -> fakes`. Measured on the relay-attached
        dev chip: FID-10k in 19.8 s vs ~60 s for 2-dispatches-per-batch
        streaming (OPTIM.md FID table, scripts/fid_rehearsal.py)."""

        @jax.jit
        def scan_moments(variables, state, stacked, key_data, num_valid):
            def body(carry, inp):
                batch, kd, nv = inp
                # keys travel as uint32 key_data so multi-process staging can
                # treat them like any other array (jax.Array key dtypes cannot
                # pass through make_array_from_process_local_data)
                key = jax.random.wrap_key_data(kd)
                fakes = generate(state, batch, key)
                m_r = self._moments(variables, batch["images"], nv)
                m_f = self._moments(variables, fakes, nv)
                s1r, s2r, s1f, s2f = carry
                return (s1r + m_r[0], s2r + m_r[1],
                        s1f + m_f[0], s2f + m_f[1]), None

            dim = 2048
            zeros = (jnp.zeros((dim,)), jnp.zeros((dim, dim)),
                     jnp.zeros((dim,)), jnp.zeros((dim, dim)))
            carry, _ = jax.lax.scan(body, zeros,
                                    (stacked, key_data, num_valid))
            return carry

        return scan_moments

    def fid_scan(self,
                 real_batches: Iterable[Any],
                 generate: Callable[[Any, Any, jax.Array], jax.Array],
                 state: Any,
                 rng: jax.Array,
                 group: int = 16,
                 put_group: Optional[Callable[[Any], Any]] = None) -> float:
        """FID over `real_batches` in O(n_batches / group) dispatches: batches
        are staged into device-resident groups of `group`, each walked by one
        compiled lax.scan (design rule from OPTIM.md: on a relay-class host a
        dispatch costs seconds, so eval loops must be packaged as scans).

        Numerically identical to the streaming `fid` path up to float
        association (test_fid.py proves it). Ragged batches are padded to the
        first batch's size with `num_valid` masking; a trailing partial group
        is padded with num_valid=0 batches so every dispatch reuses the same
        compiled program.

        `put_group` stages one assembled group pytree
        ((stacked batches, key_data, num_valid) as host numpy) onto devices —
        Trainer.validate passes a mesh-aware placement (batch axis sharded,
        keys/counters replicated) so the scan also works on a multi-process
        mesh, where bare jnp.asarray would hand a global-mesh jit
        process-local arrays (VERDICT r3 weak 1). Default: plain jnp."""
        scan_moments = self._scan_moments_fn(generate)
        totals = None
        n_total = 0
        pending: list = []
        batch_size = None

        def pad_rows(batch, size):
            n = int(batch.get("num_valid", batch["images"].shape[0]))
            batch = {k: v for k, v in batch.items() if k != "num_valid"}
            rows = batch["images"].shape[0]
            if rows < size:
                batch = jax.tree.map(
                    lambda x: np.concatenate(
                        [np.asarray(x)] +
                        [np.asarray(x[:1])] * (size - rows), 0), batch)
            return batch, n

        def flush(chunk):
            nonlocal totals
            # reuse one compiled program: pad the trailing partial group
            # with already-staged batches masked out via num_valid=0
            nv = [c[1] for c in chunk]
            while len(chunk) < group:
                chunk = chunk + [chunk[-1]]
                nv.append(0)
            stacked = jax.tree.map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]),
                *[c[0] for c in chunk])
            key_data = np.asarray(jax.random.key_data(jax.random.split(
                jax.random.fold_in(rng, n_total), len(chunk))))
            group_tree = (stacked, key_data, np.asarray(nv, np.int32))
            if put_group is not None:
                group_tree = put_group(group_tree)
            else:
                group_tree = jax.tree.map(jnp.asarray, group_tree)
            out = scan_moments(self.variables, state, *group_tree)
            totals = out if totals is None else tuple(
                a + b for a, b in zip(totals, out))

        for batch in real_batches:
            if batch_size is None:
                batch_size = int(batch["images"].shape[0])
            padded = pad_rows(batch, batch_size)
            n_total += padded[1]
            pending.append(padded)
            if len(pending) == group:
                flush(pending)
                pending = []
        if pending:
            flush(pending)
        return self._reduce_moments(n_total, totals)

    def _reduce_moments(self, n_total: int, totals) -> float:
        """moments -> FID scalar, on host (f64, default) or fully on device
        (f32, one scalar crosses instead of 34 MB of moments)."""
        if self.device_statistics:
            return float(jax.device_get(
                fid_from_moments_device(n_total, *totals)))
        s1r, s2r, s1f, s2f = jax.device_get(totals)
        mu_r, cov_r = statistics_from_moments(n_total, s1r, s2r)
        mu_f, cov_f = statistics_from_moments(n_total, s1f, s2f)
        return fid_from_statistics(mu_r, cov_r, mu_f, cov_f)

    def fid(self,
            real_batches: Iterable[Any],
            generate_fn: Callable[[Any], jax.Array]) -> float:
        """Walk validation batches; for each, accumulate real and fake
        activation moments on device (mirrors fid.py:65-98; statistics
        identical to collecting all activations up to float association)."""
        n_total = 0
        s1_r = s2_r = s1_f = s2_f = None
        for batch in real_batches:
            # batches may be padded up to the data-mesh multiple; "num_valid"
            # bounds the genuine samples (remainder-batch support)
            n = int(batch.get("num_valid", batch["images"].shape[0]))
            n_total += n
            d_r = self._moments(self.variables, batch["images"], n)
            d_f = self._moments(self.variables, generate_fn(batch), n)
            if s1_r is None:
                (s1_r, s2_r), (s1_f, s2_f) = d_r, d_f
            else:
                s1_r, s2_r = s1_r + d_r[0], s2_r + d_r[1]
                s1_f, s2_f = s1_f + d_f[0], s2_f + d_f[1]
        return self._reduce_moments(n_total, (s1_r, s2_r, s1_f, s2_f))
