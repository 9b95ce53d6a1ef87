"""Offline proof that scripts/artifact_selftest.py executes end-to-end
(VERDICT r4 weak 6 / item 6): fabricate tiny stand-ins — random VGG16 `.pt`
weights in the reference schema, a random torchvision-keyed inception `.pt`,
a 24-image Places365-format tree — then run the selftest's checking and
evaluation plumbing for real and assert the JSON report and the pass/fail
wiring. The artifact-day command path must not meet its first execution on
artifact day."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

WIDTH = 16
BATCH = 4


def _load_selftest():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "artifact_selftest", os.path.join(repo, "scripts",
                                          "artifact_selftest.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["artifact_selftest"] = mod
    spec.loader.exec_module(mod)
    return mod


selftest = _load_selftest()


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """Tiny stand-ins in the exact formats the fetch scripts would produce."""
    import torch

    import jax
    import jax.numpy as jnp

    from semantic_pyramid_for_image_generation_tpu.config import (
        PyramidGANConfig,
    )
    from semantic_pyramid_for_image_generation_tpu.models import VGG16
    from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
        export_vgg16_state_dict,
    )
    from PIL import Image
    from torch_inception import randomized_mirror

    root = tmp_path_factory.mktemp("artifact_standins")

    # Places365-standard tree: {train,val}/<class>/*.jpg + train.txt/val.txt
    rng = np.random.default_rng(0)
    places = root / "places365_standard"
    for split, n in (("train", 4), ("val", 4)):
        lines = []
        for cls in ("a_forest", "b_beach"):
            d = places / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
                img = Image.fromarray(arr).resize((256, 256), Image.BILINEAR)
                img.save(str(d / f"{i:02d}.jpg"), quality=85)
                lines.append(f"{split}/{cls}/{i:02d}.jpg")
        (places / f"{split}.txt").write_text("\n".join(lines) + "\n")

    # width-reduced VGG16 .pt state dicts (reference vgg16.* key schema)
    cfg = PyramidGANConfig(vgg_width_factor=WIDTH)
    model = VGG16(cfg, return_output=True)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 256, 256, 3), jnp.float32))
    sd = export_vgg16_state_dict(variables)
    torch.save(sd, str(root / "vgg_raw.pt"))
    torch.save(sd, str(root / "vgg_finetuned.pt"))

    # full torchvision-keyed inception_v3 .pt (random weights — the selftest
    # exercises the SAME convert + FIDEvaluator path the real weights take)
    torch.save(randomized_mirror(seed=0).state_dict(),
               str(root / "inception.pth"))
    return root


def _argv(root, **overrides):
    argv = [
        "--device", "cpu",
        "--places", str(root / "places365_standard"),
        "--vgg_pt", str(root / "vgg_raw.pt"),
        "--vgg_finetuned_pt", str(root / "vgg_finetuned.pt"),
        "--inception_pt", str(root / "inception.pth"),
        "--batch_size", str(BATCH), "--num_workers", "2",
        "--fid_images", "4", "--self_fid_images", "4", "--scan_group", "1",
        "--channel_factor", "16", "--vgg_width_factor", str(WIDTH),
        # relaxed expectations: random weights -> any finite value passes
        "--expect_top1_before", "50.0", "60.0",
        "--expect_top5_before", "50.0", "60.0",
        "--expect_top1_after", "50.0", "60.0",
        "--expect_top5_after", "50.0", "60.0",
        "--expect_self_fid_max", "1e9",
        "--expect_fid_band", "0.0", "1e9",
    ]
    for flag, values in overrides.items():
        i = argv.index(flag)
        argv[i + 1:i + 1 + len(values)] = values
    return argv


def test_check_only_reports_missing(tmp_path, capsys):
    rc = selftest.main(["--check-only",
                        "--places", str(tmp_path / "nowhere"),
                        "--vgg_pt", str(tmp_path / "missing.pt"),
                        "--vgg_finetuned_pt", str(tmp_path / "missing2.pt"),
                        "--inception_pt", str(tmp_path / "missing3.pth")])
    assert rc == 1
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["ready"] is False
    assert set(report["missing"]) == {"inception", "vgg_caffe",
                                      "vgg_finetuned", "places365"}


def test_no_unlocked_evaluation_is_vacuous_pass(tmp_path, capsys):
    """Weights present but no Places365: nothing can execute, so the exit
    code is 0 (docstring contract: '0 iff every EXECUTED check passed') and
    the report says not-ready with an empty checks dict."""
    for name in ("w.pt", "wf.pt", "i.pth"):
        (tmp_path / name).write_bytes(b"x")
    rc = selftest.main(["--places", str(tmp_path / "nowhere"),
                        "--vgg_pt", str(tmp_path / "w.pt"),
                        "--vgg_finetuned_pt", str(tmp_path / "wf.pt"),
                        "--inception_pt", str(tmp_path / "i.pth")])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert report == {"ready": False, "results": {}, "checks": {},
                      "passed": True}


@pytest.mark.slow
def test_fid_band_gated_on_inception(artifacts, capsys):
    """Without the inception artifact the generator-FID band check must NOT
    run (a random-backbone FID is meaningless against the 300-500 band);
    the VGG accuracy checks still execute."""
    rc = selftest.main(_argv(artifacts, **{
        "--inception_pt": [str(artifacts / "absent.pth")]}))
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert report["ready"] is False
    assert set(report["results"]) == {
        "vgg_top1_before", "vgg_top5_before", "vgg_top1_after",
        "vgg_top5_after"}
    assert "fid_band" not in report["checks"]
    assert "self_fid" not in report["checks"]


@pytest.mark.slow
def test_selftest_runs_end_to_end_and_wires_pass_fail(artifacts, capsys):
    """One full run with one deliberately-impossible expectation: every
    evaluation executes for real (VGG accuracy x2 through run_validation,
    self-FID through the converted inception, generator FID through
    cli.main.build_trainer), the JSON report carries all results, exactly the
    sabotaged check fails, and the exit code reflects it."""
    rc = selftest.main(_argv(artifacts,
                             **{"--expect_top5_before": ["99.9", "1e-6"]}))
    out = capsys.readouterr().out
    report = json.loads(out.strip().splitlines()[-1])
    assert report["ready"] is True
    assert set(report["results"]) == {
        "vgg_top1_before", "vgg_top5_before", "vgg_top1_after",
        "vgg_top5_after", "self_fid", "fid"}
    for v in report["results"].values():
        assert np.isfinite(v)
    # identical weights for raw and fine-tuned stand-ins -> identical values
    assert report["results"]["vgg_top1_before"] == \
        report["results"]["vgg_top1_after"]
    checks = report["checks"]
    assert checks["vgg_top5_before"] is False  # the sabotaged expectation
    others = {k: v for k, v in checks.items() if k != "vgg_top5_before"}
    assert all(others.values()), checks
    assert report["passed"] is False and rc == 1
