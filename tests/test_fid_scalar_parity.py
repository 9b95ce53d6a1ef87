"""End-to-end FID SCALAR parity against the live reference (VERDICT r3 item 2).

Executes the genuine `frechet_inception_distance`
(/root/reference/frechet_inception_distance.py:45-123) — with the
torch_inception mirror standing in for torchvision's inception_v3 via the
torch_ref stub — and our `FIDEvaluator.fid` on identical images, identical
converted G/VGG/Inception weights, and pinned noise, and demands the two
SCALARS agree. The pieces (activations, resize, normalize, formula) are each
parity-tested elsewhere; this pins their composition, where min-max order,
299-resize semantics, and pooling interact.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
from semantic_pyramid_for_image_generation_tpu.eval.fid import FIDEvaluator
from semantic_pyramid_for_image_generation_tpu.models.inception import (
    convert_inception_state_dict,
)
from semantic_pyramid_for_image_generation_tpu.train.state import (
    init_train_state,
    make_models,
    make_optimizers,
)
from semantic_pyramid_for_image_generation_tpu.train.step import (
    make_generate_fn,
)
from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
    convert_discriminator_state_dict,  # noqa: F401 (symmetry with full-step test)
    convert_generator_state_dict,
    convert_vgg16_state_dict,
)
from torch_inception import randomized_mirror
from torch_ref import import_reference

ref_models = import_reference("models")
ref_fid = import_reference("frechet_inception_distance")

CF = 8
BATCH = 2
N_BATCHES = 2


@pytest.mark.slow
def test_fid_scalar_matches_live_reference(monkeypatch):
    torch.manual_seed(3)
    cfg = PyramidGANConfig(channels_factor=CF)
    rng = np.random.default_rng(11)

    # pinned validation batches: raw (NOT pre-normalized) images so the
    # min-max inside the FID pipeline does real work; binary masks; one-hots
    batches = []
    for _ in range(N_BATCHES):
        images = rng.random(
            (BATCH, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
        labels = np.eye(cfg.num_classes, dtype=np.float32)[
            rng.integers(0, cfg.num_classes, size=BATCH)]
        masks = []
        for shape in ((1, 128, 128), (1, 64, 64), (1, 32, 32), (1, 16, 16),
                      (1, 8, 8), (4096,), (cfg.num_classes,)):
            masks.append((rng.random((BATCH,) + shape) < 0.7)
                         .astype(np.float32))
        noise = rng.standard_normal((BATCH, cfg.latent_dim)).astype(np.float32)
        batches.append({"images": images, "labels": labels, "masks": masks,
                        "noise": noise})

    # ---- reference side: the GENUINE frechet_inception_distance ----------
    ref_g = ref_models.Generator(channels_factor=CF).eval()
    ref_vgg = ref_models.VGG16().eval()  # validate() runs both in eval mode
    g_vars = convert_generator_state_dict(ref_g.state_dict())
    vgg_vars = convert_vgg16_state_dict(ref_vgg.state_dict())

    loader = [(torch.from_numpy(b["images"]), torch.from_numpy(b["labels"]),
               [torch.from_numpy(m) for m in b["masks"]]) for b in batches]
    draws = [torch.from_numpy(b["noise"]) for b in batches]

    def pinned_randn(shape, **kwargs):
        t = draws.pop(0)
        assert tuple(shape) == tuple(t.shape)
        return t.clone().requires_grad_(kwargs.get("requires_grad", False))

    monkeypatch.setattr(torch, "randn", pinned_randn)
    want = float(ref_fid.frechet_inception_distance(
        loader, ref_g, ref_vgg, device="cpu"))
    assert not draws

    # ---- our side: FIDEvaluator.fid on identical weights/inputs ----------
    # the torch_ref inception_v3 stub IS randomized_mirror(seed=0), so
    # converting the same mirror gives both frameworks identical backbones
    ev = FIDEvaluator(convert_inception_state_dict(
        randomized_mirror(seed=0).state_dict()))
    g_tx, d_tx = make_optimizers(1e-5)
    state = init_train_state(jax.random.key(0), cfg, g_tx, d_tx,
                             vgg_variables=vgg_vars, g_variables=g_vars)
    generator, _, vgg = make_models(cfg)
    gen_fn = make_generate_fn(generator, vgg)

    nhwc = [{
        "images": jnp.asarray(b["images"].transpose(0, 2, 3, 1)),
        "labels": jnp.asarray(b["labels"]),
        "masks": tuple(
            jnp.asarray(m.transpose(0, 2, 3, 1) if m.ndim == 4 else m)
            for m in b["masks"]),
    } for b in batches]
    noises = [jnp.asarray(b["noise"]) for b in batches]
    counter = {"i": 0}

    def generate(batch):
        i = counter["i"]
        counter["i"] += 1
        return gen_fn(state, batch["images"], batch["masks"],
                      batch["labels"], jax.random.key(0), noise=noises[i])

    got = ev.fid(nhwc, generate)
    assert counter["i"] == N_BATCHES

    # the composed scalar: resize/normalize/pool interplay pinned end-to-end
    np.testing.assert_allclose(got, want, rtol=1e-3,
                               err_msg=f"FID got={got} want={want}")
