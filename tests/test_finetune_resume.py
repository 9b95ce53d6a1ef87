"""vgg16_finetune --resume is real and lossless (VERDICT r4 item 1).

The reference restores state_dict + start_epoch + best_prec1
(/root/reference/vgg_16_train.py:64-74) and saves `epoch: epoch + 1`
(:125-131). Here resume additionally restores the Adam moments, and the
loader/dropout streams are epoch-keyed, so a killed fine-tune restarted with
--resume reproduces the uninterrupted run's parameters exactly.
"""

import os

import numpy as np
import orbax.checkpoint as ocp
import pytest

from semantic_pyramid_for_image_generation_tpu.cli.vgg16_finetune import (
    epoch_lr_scale,
    main as finetune_main,
    resolve_resume_path,
)

IMG = 32


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    """Tiny ImageFolder tree: 2 classes x 8 train + 2 val images."""
    from PIL import Image

    root = tmp_path_factory.mktemp("places_tiny")
    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 2)):
        for cls in ("a_forest", "b_beach"):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                arr = rng.integers(0, 256, (IMG, IMG, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")
    return str(root)


def _run(data, save_dir, epochs, resume=None):
    argv = ["--device", "cpu", "--data", data, "--save_dir", save_dir,
            "--epochs", str(epochs), "--batch_size", "8", "--workers", "2",
            "--image_size", str(IMG), "--num_classes", "2",
            "--vgg_width_factor", "16", "--dtype", "float32",
            "--load_vgg16", ""]
    if resume:
        argv += ["--resume", resume]
    assert finetune_main(argv) == 0


def _read(path):
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))


def test_resume_is_lossless(dataset_root, tmp_path):
    straight = str(tmp_path / "straight")
    resumed = str(tmp_path / "resumed")

    _run(dataset_root, straight, epochs=2)
    _run(dataset_root, resumed, epochs=1)

    # leg 1 recorded the reference's resume metadata (epoch+1 semantics)
    leg1 = _read(os.path.join(resumed, "latest_0"))
    assert int(leg1["epoch"]) == 1
    assert "opt_state" in leg1 and "params" in leg1

    _run(dataset_root, resumed, epochs=2, resume=resumed)

    want = _read(os.path.join(straight, "latest_1"))
    got = _read(os.path.join(resumed, "latest_1"))
    assert int(got["epoch"]) == 2
    # identical data order (epoch-keyed shuffle), dropout keys (epoch-keyed
    # rng) and Adam moments => bit-identical parameters
    import jax

    for (pw, w), (pg, g) in zip(
            jax.tree_util.tree_flatten_with_path(want["params"])[0],
            jax.tree_util.tree_flatten_with_path(got["params"])[0]):
        assert pw == pg
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=jax.tree_util.keystr(pw))
    # best-prec1 monotonicity survives the restart
    assert float(got["best_prec1"]) >= float(leg1["best_prec1"])


def test_resume_skips_finished_run(dataset_root, tmp_path, capsys):
    save_dir = str(tmp_path / "done")
    _run(dataset_root, save_dir, epochs=1)
    # epochs == start_epoch: nothing to do, no new checkpoints
    before = set(os.listdir(save_dir))
    _run(dataset_root, save_dir, epochs=1, resume=save_dir)
    out = capsys.readouterr().out
    assert "=> loaded checkpoint" in out and "(epoch 1" in out
    assert set(os.listdir(save_dir)) == before


def test_resume_missing_path_warns_and_starts_fresh(dataset_root, tmp_path,
                                                    capsys):
    save_dir = str(tmp_path / "fresh")
    _run(dataset_root, save_dir, epochs=1,
         resume=str(tmp_path / "nowhere"))
    out = capsys.readouterr().out
    assert "=> no checkpoint found" in out
    assert os.path.isdir(os.path.join(save_dir, "latest_0"))


def test_resolve_resume_path(tmp_path):
    assert resolve_resume_path(str(tmp_path / "missing")) is None
    assert resolve_resume_path(str(tmp_path)) is None  # empty dir
    for name in ("latest_0", "latest_2", "latest_10", "best", "junk"):
        (tmp_path / name).mkdir()
    # save_dir picks the numerically newest latest_N
    assert resolve_resume_path(str(tmp_path)).endswith("latest_10")
    # concrete checkpoint dirs pass through
    assert resolve_resume_path(str(tmp_path / "latest_2")).endswith("latest_2")
    assert resolve_resume_path(str(tmp_path / "best")).endswith("best")


def test_resolve_resume_path_save_dir_named_latest(tmp_path):
    """A save_dir merely NAMED latest_* (no numeric suffix) is scanned for
    latest_N subdirs, not mistaken for a concrete checkpoint dir."""
    save_dir = tmp_path / "latest_run"
    for name in ("latest_0", "latest_3", "best"):
        (save_dir / name).mkdir(parents=True)
    assert resolve_resume_path(str(save_dir)).endswith(
        os.path.join("latest_run", "latest_3"))


def test_lr_schedule_position():
    """The decade schedule (vgg_16_train.py:252-256) — and therefore a resume
    landing at epoch 30 trains at lr/10, not lr."""
    assert epoch_lr_scale(0) == 1.0
    assert epoch_lr_scale(29) == 1.0
    assert epoch_lr_scale(30) == pytest.approx(0.1)
    assert epoch_lr_scale(59) == pytest.approx(0.1)
    assert epoch_lr_scale(60) == pytest.approx(0.01)
