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
        allow_random_fid=True,
    )
    trainer.train(epochs=1, validate_after_n_iterations=8,
                  validate_at_start=False, progress=False)

    # batched metric fetches must not drop metrics (VERDICT r2 task 1):
    # every step logged even though device_get fired once per flush
    assert len(trainer.logger.metrics["loss_generator"]) == 2
    assert len(trainer.logger.metrics["iterations"]) == 2
    assert trainer.logger.metrics["iterations"] == [8.0, 16.0]

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


@pytest.mark.slow
def test_checkpoint_cadence(tmp_path):
    """save_model_after_n_epochs (the reference's hidden default at
    model_wrapper.py:94, promoted to a flag) skips non-multiple epochs: with
    cadence 2 over 3 epochs only epochs 0 and 2 produce checkpoints."""
    from semantic_pyramid_for_image_generation_tpu.train.loop import Trainer

    trainer = Trainer(
        CFG,
        training_dataset=_SyntheticLoader(1, 8),
        validation_dataset=_SyntheticLoader(1, 4, validation=True),
        lr=1e-4,
        save_data_path=str(tmp_path),
        use_mesh=False,
        allow_random_fid=True,
    )
    trainer.train(epochs=3, validate_after_n_iterations=10**9,
                  save_model_after_n_epochs=2,
                  validate_at_start=False, progress=False)
    ckpts = sorted(os.path.basename(p) for p in glob.glob(
        os.path.join(trainer.paths["models"], "checkpoint_*")))
    assert ckpts == ["checkpoint_000", "checkpoint_002"]


@pytest.mark.slow
def test_train_called_twice_numbers_checkpoints_continuously(tmp_path):
    """Trainer.train() invoked again on the same Trainer (warm restart,
    bench.py --trainer's timed second epoch) must continue the persistent
    epoch counter instead of re-saving checkpoint_000 — orbax refuses to
    overwrite an existing checkpoint directory."""
    from semantic_pyramid_for_image_generation_tpu.train.loop import Trainer

    trainer = Trainer(
        CFG,
        training_dataset=_SyntheticLoader(1, 8),
        validation_dataset=None,
        lr=1e-4,
        save_data_path=str(tmp_path),
        use_mesh=False,
        allow_random_fid=True,
    )
    trainer.train(epochs=1, validate_at_start=False, progress=False)
    trainer.train(epochs=1, validate_at_start=False, progress=False)
    assert trainer.epochs_trained == 2
    ckpts = sorted(os.path.basename(p) for p in glob.glob(
        os.path.join(trainer.paths["models"], "checkpoint_*")))
    assert ckpts == ["checkpoint_000", "checkpoint_001"]
    # epoch metric reflects the global counter, not the per-call index
    assert trainer.logger.metrics["epoch"] == [0.0, 1.0]


@pytest.mark.slow
def test_batched_grid_matches_looped_dispatches(tmp_path):
    """inference() packages all 7 mask levels into ONE generate dispatch
    (VERDICT r2 task 7); with the same rng-split sequence the grid PNG must
    be byte-identical to the pre-batching 7-dispatch form."""
    import jax
    import jax.numpy as jnp

    from semantic_pyramid_for_image_generation_tpu.data.masks import (
        MaskSchedule,
    )
    from semantic_pyramid_for_image_generation_tpu.eval.grid import (
        save_inference_grid,
    )
    from semantic_pyramid_for_image_generation_tpu.train.loop import Trainer

    n = 2
    trainer = Trainer(
        CFG,
        training_dataset=_SyntheticLoader(1, 4),
        validation_dataset=_SyntheticLoader(1, 4, validation=True),
        save_data_path=str(tmp_path),
        use_mesh=False,
        allow_random_fid=True,
    )
    rng0 = trainer.rng
    path = trainer.inference(num_images=n)

    # replay the looped form: one dispatch per level, same rng splits
    batch = trainer._inference_batch  # cached by _draw_inference_samples
    images = np.asarray(batch["images"][:n])
    labels = np.asarray(batch["labels"][:n])
    schedule = MaskSchedule(CFG)
    rng = rng0
    columns = []
    for level in range(7):
        masks = tuple(np.broadcast_to(m[None], (n,) + m.shape).copy()
                      for m in schedule.inference_masks(level))
        rng, k = jax.random.split(rng)
        fakes = trainer.generate_fn(
            trainer.state, jnp.asarray(images),
            jax.tree.map(jnp.asarray, masks), jnp.asarray(labels), k)
        columns.append(np.asarray(fakes))
    stack = np.stack(columns, axis=1).reshape(
        (n * 7,) + columns[0].shape[1:])
    want_path = os.path.join(str(tmp_path), "looped.png")
    save_inference_grid(stack, want_path)
    with open(path, "rb") as f_got, open(want_path, "rb") as f_want:
        assert f_got.read() == f_want.read()


def test_compat_inference_indices_restricts_draw_pool():
    """Opt-in reproduction of reference quirk 2.8.5 (model_wrapper.py:258-260):
    grid samples are drawn from range(len(dataloader)) — the BATCH COUNT — so
    only the first n_batches validation items can ever appear. Default mode
    draws from the whole validation set (the reference's evident intent)."""
    from semantic_pyramid_for_image_generation_tpu.train.loop import Trainer

    class _DS:
        def __len__(self):
            return 100

        def sample(self, i, rng):
            # pixel value encodes the drawn index so the test can observe it
            return (np.full((4, 4, 3), float(i), np.float32),
                    np.eye(10, dtype=np.float32)[i % 10])

    class _Loader:
        dataset = _DS()
        batch_size = 8
        drop_last = False

    tr = Trainer.__new__(Trainer)  # unit-test the draw without model init
    tr.validation_dataset = _Loader()
    tr.seed = 0
    tr.samples_seen = 0
    tr.compat_inference_indices = True
    n_batches = -(-100 // 8)  # 13

    for s in range(10):
        tr.samples_seen = s
        images, labels = tr._draw_inference_samples(7)
        assert images.shape[0] == 7 and labels.shape == (7, 10)
        assert images.max() < n_batches, "compat draw escaped the batch pool"

    tr.compat_inference_indices = False
    top = max(float(tr._draw_inference_samples(7)[0].max())
              for tr.samples_seen in range(30))
    assert top >= n_batches, "default draw should cover the whole dataset"
