"""Long-horizon training evidence on TPU (VERDICT r2 task 5).

The reference demonstrates its pipeline with a 600k-sample run and a published
sample grid (/root/reference/README.md:68-71, figures/600000.png). The
closest feasible demonstration on this host (no Places365, no egress): a
~2k-step bf16 batch-64 run on a fixed synthetic-JPEG Places365-format tree,
through the REAL production path — cli.main -> Trainer.train (host-fed
compact feed, batched metric fetches, scan-FID validations, per-epoch grids
and checkpoints) — recording loss/pipeline-FID trajectories and sample grids.

Usage: python scripts/long_run.py [--steps 2048] [--batch 64] [--out figures/r3_longrun]
Artifacts: <out>/loss_curves.png, <out>/fid.json, <out>/predictions_*.png
"""

from __future__ import annotations

import argparse
import faulthandler
import glob
import json
import os
import shutil
import signal
import sys
import time

# Detached runs on this host have hung inside relay RPCs before (an orbax
# save once futex-parked every thread for 50+ minutes); make the process
# stack-dumpable from outside: `kill -USR1 <pid>` writes all thread
# tracebacks to stderr (the nohup log).
faulthandler.register(signal.SIGUSR1, all_threads=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_tree(root: str, classes: int, per_class: int, val_per_class: int,
              image_size: int = 256) -> None:
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    for split, per in (("train", per_class), ("val", val_per_class)):
        lines = []
        for c in range(classes):
            d = os.path.join(root, split, f"class_{c:02d}")
            os.makedirs(d, exist_ok=True)
            for i in range(per):
                base = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
                img = Image.fromarray(base).resize(
                    (image_size, image_size), Image.BILINEAR)
                img.save(os.path.join(d, f"{i:03d}.jpg"), quality=88)
                lines.append(f"{split}/class_{c:02d}/{i:03d}.jpg")
        with open(os.path.join(root, f"{split}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2048)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--classes", type=int, default=16)
    p.add_argument("--validate_every_steps", type=int, default=512)
    p.add_argument("--data_dir", type=str, default="/tmp/longrun_data")
    p.add_argument("--save_dir", type=str, default="/tmp/longrun_sd")
    p.add_argument("--out", type=str, default="figures/r3_longrun")
    args = p.parse_args()

    import numpy as np

    from semantic_pyramid_for_image_generation_tpu.cli import main as cli_main

    # dataset sized so the run is a handful of epochs (per-epoch checkpoints
    # are ~1 GB each; keep their count small)
    per_class = 1024
    steps_per_epoch = args.classes * per_class // args.batch
    epochs = -(-args.steps // steps_per_epoch)
    if not os.path.exists(os.path.join(args.data_dir, "train.txt")):
        print(f"building {args.classes}x{per_class} JPEG tree...", flush=True)
        make_tree(args.data_dir, args.classes, per_class, val_per_class=16)
    shutil.rmtree(args.save_dir, ignore_errors=True)

    t0 = time.perf_counter()
    cli_main.main([
        "--train", "--batch_size", str(args.batch), "--epochs", str(epochs),
        "--path_to_places365", args.data_dir,
        "--fid_images", str(args.classes * 16),
        "--validate_after_n_iterations",
        str(args.validate_every_steps * args.batch),
        "--num_workers", "16", "--compact_feed", "--allow_random_fid",
        "--save_data_path", args.save_dir, "--log_every", "50",
        "--save_model_after_n_epochs", str(max(1, epochs // 2)),
        "--dtype", "bfloat16", "--lr", "1e-4", "--seed", "0",
    ])
    wall = time.perf_counter() - t0

    # ---- collect artifacts -------------------------------------------------
    os.makedirs(args.out, exist_ok=True)
    metrics_dir = sorted(glob.glob(os.path.join(args.save_dir, "metrics_*")))[-1]
    plots_dir = sorted(glob.glob(os.path.join(args.save_dir, "plots_*")))[-1]

    curves = {}
    for name in ("loss_generator", "loss_discriminator_real",
                 "loss_discriminator_fake",
                 "loss_generator_semantic_reconstruction",
                 "loss_generator_diversity", "iterations", "fid",
                 "iterations_fid"):
        path = os.path.join(metrics_dir, f"{name}.npy")
        if os.path.exists(path):
            curves[name] = np.load(path)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(11, 7))
    it = curves["iterations"]
    axes[0, 0].plot(it, curves["loss_generator"], lw=0.7)
    axes[0, 0].set_title("LSGAN generator loss")
    axes[0, 1].plot(it, curves["loss_discriminator_real"]
                    + curves["loss_discriminator_fake"], lw=0.7)
    axes[0, 1].set_title("LSGAN discriminator loss (real+fake)")
    axes[1, 0].plot(it, curves["loss_generator_semantic_reconstruction"],
                    lw=0.7)
    axes[1, 0].set_title("semantic reconstruction loss (w_rec applied)")
    if "fid" in curves and len(curves["fid"]):
        axes[1, 1].plot(curves["iterations_fid"], curves["fid"], marker="o")
        axes[1, 1].set_title("pipeline-FID (random-backbone smoke metric)")
    for ax in axes.flat:
        ax.set_xlabel("samples seen")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "loss_curves.png"), dpi=110)

    grids = sorted(glob.glob(os.path.join(plots_dir, "predictions_*.png")),
                   key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]))
    keep = [grids[0], grids[len(grids) // 2], grids[-1]] if len(grids) >= 3 \
        else grids
    for g in keep:
        shutil.copy(g, os.path.join(args.out, os.path.basename(g)))

    summary = {
        "steps": int(len(it)),
        "samples": int(it[-1]) if len(it) else 0,
        "wall_s": round(wall, 1),
        "img_per_sec_end_to_end": round(float(it[-1]) / wall, 1),
        "loss_rec_first_100_mean": float(
            np.mean(curves["loss_generator_semantic_reconstruction"][:100])),
        "loss_rec_last_100_mean": float(
            np.mean(curves["loss_generator_semantic_reconstruction"][-100:])),
        "fid_trajectory": [round(float(f), 2) for f in curves.get("fid", [])],
        "fid_iterations": [int(i) for i in curves.get("iterations_fid", [])],
        "all_finite": bool(all(np.isfinite(v).all() for v in curves.values())),
        "grids_kept": [os.path.basename(g) for g in keep],
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
