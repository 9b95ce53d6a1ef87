"""Synthetic batches exercising the full pyramid contract (SURVEY.md 7:
'minimum end-to-end slice') — used by tests, the multi-chip dry run, and the
benchmark harness. No Places365 download needed."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
from semantic_pyramid_for_image_generation_tpu.data.masks import MaskSchedule


def synthetic_batch(config: PyramidGANConfig, batch: int,
                    rng: np.random.Generator | None = None,
                    validation: bool = False) -> Dict[str, Any]:
    """Random images in [-1, 1], one-hot labels, and a per-sample mask draw —
    the same batch pytree the Places365 pipeline emits."""
    rng = np.random.default_rng(0) if rng is None else rng
    s = config.image_size
    images = rng.uniform(-1.0, 1.0,
                         (batch, s, s, config.out_channels)).astype(np.float32)
    labels = np.eye(config.num_classes, dtype=np.float32)[
        rng.integers(0, config.num_classes, size=batch)]
    schedule = MaskSchedule(config)
    draw = schedule.validation_masks if validation else schedule.training_masks
    masks = schedule.batch([draw(rng) for _ in range(batch)])
    return {"images": images, "labels": labels, "masks": tuple(masks)}
