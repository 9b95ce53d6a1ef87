"""Trainer end-to-end on synthetic data: metrics artifacts, checkpoint files,
the 7x7 inference grid, and FID validation with a random-weight inception.
Mirrors the reference ModelWrapper surface (SURVEY.md 2.2)."""

import glob
import json
import os

import numpy as np
import pytest

from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
from semantic_pyramid_for_image_generation_tpu.data.synthetic import synthetic_batch

CFG = PyramidGANConfig().tiny()


class _SyntheticLoader:
    def __init__(self, batches, batch_size, validation=False):
        self._data = [synthetic_batch(CFG, batch_size,
                                      np.random.default_rng(i),
                                      validation=validation)
                      for i in range(batches)]

    def __iter__(self):
        return iter(self._data)

    def __len__(self):
        return len(self._data)


@pytest.mark.slow
def test_trainer_one_epoch(tmp_path):
    from semantic_pyramid_for_image_generation_tpu.train.loop import Trainer

    trainer = Trainer(
        CFG,
        training_dataset=_SyntheticLoader(2, 8),
        validation_dataset=_SyntheticLoader(1, 4, validation=True),
        lr=1e-4,
        save_data_path=str(tmp_path),
        use_mesh=True,
    )
    trainer.train(epochs=1, validate_after_n_iterations=8,
                  validate_at_start=False, progress=False)

    # metric artifacts with reference-compatible names (misc.py:144-159)
    metrics_dir = trainer.paths["metrics"]
    with open(os.path.join(metrics_dir, "hyperparameter.txt")) as f:
        hyper = json.load(f)
    assert hyper["generator_params"]
    for name in ("loss_generator", "loss_discriminator_real", "fid"):
        assert os.path.exists(os.path.join(metrics_dir, f"{name}.npy")), name
    # per-epoch checkpoint
    assert glob.glob(os.path.join(trainer.paths["models"], "checkpoint_*"))
    # 7x7 grid PNG
    grids = glob.glob(os.path.join(trainer.paths["plots"], "predictions_*.png"))
    assert grids
    from PIL import Image

    with Image.open(grids[-1]) as img:
        w, h = img.size
    assert w == h == 7 * CFG.image_size + 8 * 2  # 7 cells + padding
