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
    """Per-sample min-max to [-1, 1] (/root/reference/misc.py:112-121)."""
    flat = images.reshape(images.shape[0], -1)
    mn = flat.min(axis=1)[:, None, None, None]
    mx = flat.max(axis=1)[:, None, None, None]
    return 2.0 * (images - mn) / (mx - mn) - 1.0


def normalize_0_1(images: jax.Array) -> jax.Array:
    """Per-sample min-max to [0, 1] (/root/reference/misc.py:100-109)."""
    flat = images.reshape(images.shape[0], -1)
    mn = flat.min(axis=1)[:, None, None, None]
    mx = flat.max(axis=1)[:, None, None, None]
    return (images - mn) / (mx - mn)


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


def fid_from_activations(real: np.ndarray, fake: np.ndarray) -> float:
    mu_r, cov_r = np.mean(real, axis=0), np.cov(real, rowvar=False)
    mu_f, cov_f = np.mean(fake, axis=0), np.cov(fake, rowvar=False)
    return fid_from_statistics(mu_r, cov_r, mu_f, cov_f)


class FIDEvaluator:
    """Batched FID evaluation driver.

    `inception_variables=None` initializes the backbone randomly — the pipeline
    stays exercisable without the torchvision weight file; pass converted
    weights (models.inception.convert_inception_state_dict) for standard FID.
    """

    def __init__(self, inception_variables: Optional[Dict[str, Any]] = None,
                 dtype: str = "float32"):
        self.model = InceptionV3Features(dtype=jnp.dtype(dtype))
        self.random_init = inception_variables is None
        if inception_variables is None:
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

    def activations(self, images: jax.Array) -> np.ndarray:
        return np.asarray(self._activations(self.variables, images))

    def fid(self,
            real_batches: Iterable[Any],
            generate_fn: Callable[[Any], jax.Array]) -> float:
        """Walk validation batches; for each, collect real activations and
        activations of `generate_fn(batch)` fakes (mirrors fid.py:65-98)."""
        real_acts, fake_acts = [], []
        for batch in real_batches:
            # batches may be padded up to the data-mesh multiple; "num_valid"
            # bounds the genuine samples (remainder-batch support)
            n = int(batch.get("num_valid", batch["images"].shape[0]))
            real_acts.append(self.activations(batch["images"])[:n])
            fake_acts.append(self.activations(generate_fn(batch))[:n])
        return fid_from_activations(
            np.concatenate(real_acts, axis=0),
            np.concatenate(fake_acts, axis=0))
