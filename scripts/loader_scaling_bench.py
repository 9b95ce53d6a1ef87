"""Host input-pipeline worker-scaling measurement (VERDICT r3 weak 6).

OPTIM.md's multi-core feed claim ("a real TPU VM host should feed the chip
at full rate with ~one core per chip of decode headroom") was an
extrapolation: this dev host has exactly ONE core, so `num_workers` scaling
was never measured. This script makes the claim a one-command measurement
on any host:

  python scripts/loader_scaling_bench.py [--workers 1,2,4,8] [--batch 64]

For each worker count it reports
  * `loader` — production `Places365Loader` throughput (threaded PIL JPEG
    decode + native C++ mask/normalize kernels + collate), the number that
    must exceed the device rate (~278 img/s/chip) for the feed not to bound
    training; and
  * `decode` — a pure ThreadPoolExecutor PIL decode of the same files,
    isolating codec thread-scaling (PIL releases the GIL inside the JPEG
    codec) from the Python-side mask/collate work.

One JSON line per point plus a `summary` line with `cpu_count`, so the
curve can be read off directly: on a 1-core host both columns stay flat
(threads only overlap I/O); on an N-core host `decode` should scale
~linearly until cores or the page cache saturate. Reference anchor: the
torch DataLoader's `num_workers=batch_size` fork-per-worker feed
(/root/reference/main.py:82) — ours is threads + native kernels, so the
scaling mechanism under test is GIL-released codec concurrency, not
process fan-out.
"""

import argparse
import json
import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def decode_throughput(paths, workers: int, repeats: int = 2) -> float:
    """Pure PIL open+decode+to-array rate (img/s) at `workers` threads."""
    from PIL import Image

    def decode(p):
        with Image.open(p) as im:
            return np.asarray(im.convert("RGB")).shape

    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(workers) as pool:
            list(pool.map(decode, paths))
        best = max(best, len(paths) / (time.perf_counter() - t0))
    return best


def loader_throughput(root, cfg, batch: int, workers: int,
                      compact: bool) -> float:
    from semantic_pyramid_for_image_generation_tpu.data.places365 import (
        Places365,
        Places365Loader,
    )

    ds = Places365(root, "train.txt", cfg)
    loader = Places365Loader(ds, batch_size=batch, num_workers=workers,
                             prefetch=2, compact_feed=compact)
    for _ in loader:  # warm page cache + thread pool
        break
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        n = 0
        for b in loader:
            n += b["images"].shape[0]
        best = max(best, n / (time.perf_counter() - t0))
    return best


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workers", default="1,2,4,8",
                        help="comma-separated worker counts to sweep")
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--images", type=int, default=512,
                        help="synthetic JPEG count (Places365-format tree)")
    parser.add_argument("--float_feed", action="store_true",
                        help="bench the float32 feed instead of uint8 compact")
    args = parser.parse_args()
    worker_counts = [int(w) for w in args.workers.split(",")]

    # CPU-only: this measures the host pipeline; keep the TPU out of it
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from bench import make_jpeg_tree
    from semantic_pyramid_for_image_generation_tpu.config import (
        PyramidGANConfig,
    )

    cfg = PyramidGANConfig()
    cores = os.cpu_count()
    with tempfile.TemporaryDirectory() as root:
        classes = 4
        make_jpeg_tree(root, cfg.image_size,
                       per_class=-(-args.images // classes), classes=classes)
        paths = []
        with open(os.path.join(root, "train.txt")) as f:
            paths = [os.path.join(root, ln.strip()) for ln in f if ln.strip()]

        rows = []
        for w in worker_counts:
            dec = decode_throughput(paths, w)
            ldr = loader_throughput(root, cfg, args.batch, w,
                                    compact=not args.float_feed)
            row = {"num_workers": w, "decode_img_per_s": round(dec, 1),
                   "loader_img_per_s": round(ldr, 1)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    base = rows[0]
    peak = max(rows, key=lambda r: r["decode_img_per_s"])
    print(json.dumps({
        "summary": "host feed worker scaling",
        "cpu_count": cores,
        "feed": "float32" if args.float_feed else "uint8-compact",
        "decode_speedup_at_peak": round(
            peak["decode_img_per_s"] / base["decode_img_per_s"], 2),
        "peak_workers": peak["num_workers"],
        "device_rate_to_beat_img_per_s": 278.3,
    }))


if __name__ == "__main__":
    main()
