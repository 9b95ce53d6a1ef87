"""Fast CLI contract tests (no jit): flag surfaces and config plumbing."""

import pytest

from semantic_pyramid_for_image_generation_tpu.cli.generate import (
    build_parser as generate_parser,
)
from semantic_pyramid_for_image_generation_tpu.cli.main import build_parser
from semantic_pyramid_for_image_generation_tpu.cli.vgg16_finetune import (
    build_parser as finetune_parser,
)
from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig


def test_reference_flags_accepted():
    """Every /root/reference/main.py:4-42 flag parses."""
    args = build_parser().parse_args([
        "--train", "--test", "--batch_size", "20", "--lr", "1e-05",
        "--channel_factor", "1.0", "--device", "cpu", "--gpus_to_use", "0",
        "--use_data_parallel", "--load_checkpoint", "x.pt",
        "--load_pretrained_vgg16", "vgg.pt", "--path_to_places365", "p",
        "--epochs", "50",
    ])
    assert args.train and args.test
    assert args.batch_size == 20
    assert args.lr == 1e-05


def test_reference_defaults_match():
    args = build_parser().parse_args([])
    # /root/reference/main.py defaults
    assert args.batch_size == 20
    assert args.lr == 1e-05
    assert args.channel_factor == 1.0
    assert args.epochs == 50
    assert args.load_pretrained_vgg16 == \
        "pre_trained_models/vgg_places_365_fine_tuned.pt"
    assert args.path_to_places365 == "places365_standard"
    # hidden reference defaults promoted to flags (model_wrapper.py:93-94)
    assert args.w_rec == 0.1
    assert args.w_div == 0.1
    assert args.validate_after_n_iterations == 100_000
    assert args.fid_images == 6000
    assert args.save_model_after_n_epochs == 1


def test_finetune_defaults_match_reference():
    args = finetune_parser().parse_args([])
    # /root/reference/vgg_16_train.py:28-50
    assert args.epochs == 3
    assert args.batch_size == 256
    assert args.lr == 1e-4


def test_generate_parser():
    args = generate_parser().parse_args(
        ["--images", "x.png", "--levels", "0,3,6", "--num_samples", "2"])
    assert args.levels == "0,3,6"


def test_perf_mode_flags_thread_to_config():
    """OPTIM.md's benched perf modes are CLI-reachable (VERDICT weak 5):
    --fused_d / --canonical_projection / --remat_vgg / --remat_blocks."""
    from semantic_pyramid_for_image_generation_tpu.cli.main import (
        config_from_args,
    )

    parser = build_parser()
    default = parser.parse_args([])
    assert not default.fused_d and not default.canonical_projection
    assert not default.remat_vgg and not default.remat_blocks
    # parity-mode default: the reference's (B,B,128) quirk is preserved
    assert config_from_args(default).compat_projection is True

    perf = parser.parse_args(["--fused_d", "--remat_vgg", "--remat_blocks"])
    cfg = config_from_args(perf)
    assert cfg.compat_projection is False  # fused_d implies canonical head
    assert cfg.remat_blocks is True
    assert perf.remat_vgg is True

    canon = parser.parse_args(["--canonical_projection"])
    assert config_from_args(canon).compat_projection is False


def test_config_mask_probability_threads():
    import dataclasses

    from semantic_pyramid_for_image_generation_tpu.data.masks import (
        MaskSchedule,
    )

    cfg = dataclasses.replace(PyramidGANConfig(), p_random_mask=0.0)
    sched = MaskSchedule(cfg)
    assert sched.p_random_mask == 0.0
    import numpy as np

    rng = np.random.default_rng(0)
    # with p=0 the spatial branch never fires: masks are strictly one-hot
    for _ in range(50):
        masks = sched.training_masks(rng)
        for m in masks:
            assert set(np.unique(m)).issubset({0.0, 1.0})
            assert np.all(m == m.flat[0])  # constant per level
