"""Full-iteration update-TRAJECTORY parity against the live reference.

The strongest correctness claim in PARITY.md — "the fused step advances every
piece of state in the reference's exact order" — proven as a test instead of
prose (VERDICT r3 item 1): this executes the reference's GENUINE training
loop (`ModelWrapper.train`, /root/reference/model_wrapper.py:93-228 — the
real method, not a re-implementation) for 2 iterations with torch Adam
(lr 1e-5), CF=8, full-width VGG, fp32, pinned noise/masks/labels; then runs
our fused jitted step from the identically-converted initial weights with the
identical inputs (noise injected via the train-step test hook), and demands
elementwise agreement of

  * every per-iteration loss metric,
  * post-update G and D parameters (through TWO torch-Adam/optax-adam updates
    each),
  * spectral-norm u vectors (3 G advances + 3 D advances per iteration),
  * conditional-BN running statistics (2 advances per iteration, mom 0.001).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
from semantic_pyramid_for_image_generation_tpu.train.state import (
    init_train_state,
    make_models,
    make_optimizers,
)
from semantic_pyramid_for_image_generation_tpu.train.step import (
    make_train_step,
)
from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
    convert_discriminator_state_dict,
    convert_generator_state_dict,
    convert_vgg16_state_dict,
)
from torch_ref import import_reference

ref_models = import_reference("models")
ref_model_wrapper = import_reference("model_wrapper")

CF = 8
BATCH = 2  # DiversityLoss asserts batch > 1 (/root/reference/lossfunction.py:100)
ITERS = 2
LR = 1e-5

LOSS_NAMES = (
    "loss_discriminator_real",
    "loss_discriminator_fake",
    "loss_generator",
    "loss_generator_semantic_reconstruction",
    "loss_generator_diversity",
)


class _StubLoader:
    """Quacks like the torch DataLoader ModelWrapper.train iterates
    (needs .batch_size, .dataset, iteration yielding (images, labels, masks)
    with masks a mutable list — model_wrapper.py:108, :120, :131)."""

    def __init__(self, batches):
        self._batches = batches
        self.batch_size = BATCH
        self.dataset = list(range(len(batches) * BATCH))

    def __iter__(self):
        for images, labels, masks in self._batches:
            yield (images.clone(), labels.clone(), [m.clone() for m in masks])

    def __len__(self):
        return len(self._batches)


def _pinned_inputs(rng, cfg):
    """ITERS batches + per-phase noise, as numpy (converted per-framework)."""
    batches = []
    for _ in range(ITERS):
        images = (rng.random((BATCH, 3, cfg.image_size, cfg.image_size),
                             dtype=np.float64).astype(np.float32) * 2.0 - 1.0)
        labels = np.eye(cfg.num_classes, dtype=np.float32)[
            rng.integers(0, cfg.num_classes, size=BATCH)]
        masks = []
        for shape in ((1, 128, 128), (1, 64, 64), (1, 32, 32), (1, 16, 16),
                      (1, 8, 8), (4096,), (cfg.num_classes,)):
            masks.append((rng.random((BATCH,) + shape) < 0.7)
                         .astype(np.float32))
        noise_d = rng.standard_normal((BATCH, cfg.latent_dim)).astype(np.float32)
        noise_g = rng.standard_normal((BATCH, cfg.latent_dim)).astype(np.float32)
        batches.append({"images": images, "labels": labels, "masks": masks,
                        "noise_d": noise_d, "noise_g": noise_g})
    return batches


def _assert_tree_allclose(got, want, atol, label, rtol=0.0):
    got_leaves, got_def = jax.tree.flatten(got)
    want_leaves, want_def = jax.tree.flatten(want)
    assert got_def == want_def, label
    paths = [jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_flatten_with_path(want)[0]]
    for path, g, w in zip(paths, got_leaves, want_leaves):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=atol, rtol=rtol,
            err_msg=f"{label}{path}")


@pytest.mark.slow
def test_two_iteration_training_trajectory_matches_reference(
        tmp_path, monkeypatch):
    torch.manual_seed(0)
    cfg = PyramidGANConfig(channels_factor=CF)
    rng = np.random.default_rng(42)
    pinned = _pinned_inputs(rng, cfg)

    # ---- reference side: the GENUINE ModelWrapper.train ------------------
    ref_g = ref_models.Generator(channels_factor=CF)
    ref_d = ref_models.Discriminator(channel_factor=CF)
    ref_vgg = ref_models.VGG16()  # random-init full-width skeleton, 365 head
    g_vars0 = convert_generator_state_dict(ref_g.state_dict())
    d_vars0 = convert_discriminator_state_dict(ref_d.state_dict())
    vgg_vars0 = convert_vgg16_state_dict(ref_vgg.state_dict())

    loader = _StubLoader([
        (torch.from_numpy(b["images"]), torch.from_numpy(b["labels"]),
         [torch.from_numpy(m) for m in b["masks"]]) for b in pinned])
    wrapper = ref_model_wrapper.ModelWrapper(
        generator=ref_g,
        discriminator=ref_d,
        training_dataset=loader,
        validation_dataset=None,
        vgg16=ref_vgg,
        generator_optimizer=torch.optim.Adam(ref_g.parameters(), lr=LR),
        discriminator_optimizer=torch.optim.Adam(ref_d.parameters(), lr=LR),
        save_data_path=str(tmp_path))
    # validation/inference need FID weights + a val set; they are outside this
    # trajectory claim — stub the instance attributes, keep train() genuine
    wrapper.validate = lambda *a, **k: 0.0
    wrapper.inference = lambda *a, **k: None

    draws = [torch.from_numpy(n) for b in pinned
             for n in (b["noise_d"], b["noise_g"])]

    def pinned_randn(shape, **kwargs):
        t = draws.pop(0)
        assert tuple(shape) == tuple(t.shape)
        return t.clone().requires_grad_(kwargs.get("requires_grad", False))

    monkeypatch.setattr(torch, "randn", pinned_randn)
    wrapper.train(epochs=1, device="cpu")
    assert not draws, "reference consumed an unexpected number of noise draws"

    ref_metrics = {k: wrapper.logger.metrics[k] for k in LOSS_NAMES}
    g_vars_ref = convert_generator_state_dict(ref_g.state_dict())
    d_vars_ref = convert_discriminator_state_dict(ref_d.state_dict())

    # ---- our side: the fused jitted step from identical initial state ----
    g_tx, d_tx = make_optimizers(LR)
    state = init_train_state(jax.random.key(0), cfg, g_tx, d_tx,
                             vgg_variables=vgg_vars0,
                             g_variables=g_vars0, d_variables=d_vars0)
    generator, discriminator, vgg = make_models(cfg)
    step = make_train_step(generator, discriminator, vgg, g_tx, d_tx,
                           donate=False)

    our_metrics = {k: [] for k in LOSS_NAMES}
    for b in pinned:
        batch = {
            "images": jnp.asarray(b["images"].transpose(0, 2, 3, 1)),
            "labels": jnp.asarray(b["labels"]),
            "masks": tuple(
                jnp.asarray(m.transpose(0, 2, 3, 1) if m.ndim == 4 else m)
                for m in b["masks"]),
            "noise_d": jnp.asarray(b["noise_d"]),
            "noise_g": jnp.asarray(b["noise_g"]),
        }
        state, metrics = step(state, batch, jax.random.key(7))
        for k in LOSS_NAMES:
            our_metrics[k].append(float(metrics[k]))

    # ---- 1. per-iteration loss trajectory ---------------------------------
    for k in LOSS_NAMES:
        np.testing.assert_allclose(
            our_metrics[k], ref_metrics[k], rtol=2e-3, atol=2e-5,
            err_msg=f"loss trajectory diverged: {k}")

    # ---- 2. post-update parameters (two Adam updates each) ----------------
    _assert_tree_allclose(state.g_params, g_vars_ref["params"], 1e-4,
                          "g_params")
    _assert_tree_allclose(state.d_params, d_vars_ref["params"], 1e-4,
                          "d_params")
    # ---- 3. spectral power-iteration state (6 G + 6 D advances) -----------
    _assert_tree_allclose(state.g_spectral, g_vars_ref["spectral"], 1e-4,
                          "g_spectral")
    _assert_tree_allclose(state.d_spectral, d_vars_ref["spectral"], 1e-4,
                          "d_spectral")
    # ---- 4. conditional-BN running statistics (4 advances, mom 0.001) -----
    # rtol absorbs fp32 reduction-order noise in the batch-moment reductions
    # (observed max rel diff ~5e-5 on running means of magnitude ~0.3).
    _assert_tree_allclose(state.g_batch_stats, g_vars_ref["batch_stats"],
                          1e-6, "g_batch_stats", rtol=3e-4)
