"""FID-10k on-chip rehearsal (SURVEY.md north star; VERDICT r1 task 8).

Runs the COMPLETE FID pipeline at 10k scale on the TPU — converted Inception
weights (via models.inception.convert_inception_state_dict, fed from the
executing torch mirror in tests/torch_inception.py), full-width VGG16 pyramid
+ Generator fakes, per-sample min-max + 299 resize + Mixed_7c pooling on
device, host sqrtm — and reports wall-clock + peak device memory, so the
north-star metric (FID-10k on Places365 val, /root/reference/
frechet_inception_distance.py:45-123) is one dataset away, not one subsystem
away. Images are synthetic (the host has no Places365); every compute stage
is the production stage.

Usage: python scripts/fid_rehearsal.py [--num 10000] [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--num", type=int, default=10_000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--stage", type=int, default=16,
                   help="distinct device-resident batches to cycle (relay-"
                        "attached dev host; see comment below)")
    p.add_argument("--dtype", type=str, default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
    from semantic_pyramid_for_image_generation_tpu.data.synthetic import (
        synthetic_batch,
    )
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

    t_setup = time.perf_counter()
    # Converted Inception weights through the production .pt conversion path.
    # (The image has no torchvision/network; the executing torch mirror in
    # tests/torch_inception.py stands in for torchvision.models.inception_v3 —
    # identical architecture, parity-tested in tests/test_inception.py.)
    from torch_inception import randomized_mirror

    inception_vars = convert_inception_state_dict(
        randomized_mirror(0).state_dict())

    cfg = PyramidGANConfig(compute_dtype=args.dtype)
    g_tx, d_tx = make_optimizers()
    state = init_train_state(jax.random.key(0), cfg, g_tx, d_tx,
                             use_pallas_attention=True)
    generator, _, vgg = make_models(cfg, True)
    generate_fn = make_generate_fn(generator, vgg)
    evaluator = FIDEvaluator(inception_vars)
    rng = jax.random.key(7)
    print(f"setup {time.perf_counter() - t_setup:.1f}s", flush=True)

    n_batches = -(-args.num // args.batch)
    host_rng = np.random.default_rng(0)

    # Stage a pool of device-resident batches and cycle them: this dev host
    # reaches the chip through a network relay (OPTIM.md host-fed table), so
    # streaming 10k fresh host batches would measure the relay, not the FID
    # pipeline. Fakes still differ every batch (fresh noise per call).
    n_stage = min(n_batches, args.stage)
    staged = [jax.tree.map(jnp.asarray,
                           synthetic_batch(cfg, args.batch, host_rng,
                                           validation=True))
              for _ in range(n_stage)]

    def batches():
        for i in range(n_batches):
            yield staged[i % n_stage]

    def generate(batch):
        nonlocal rng
        rng, sub = jax.random.split(rng)
        return generate_fn(state, batch["images"], batch["masks"],
                           batch["labels"], sub)

    t0 = time.perf_counter()
    fid = evaluator.fid(batches(), generate)
    dt = time.perf_counter() - t0

    mem = {}
    try:
        stats = jax.devices()[0].memory_stats() or {}
        mem = {k: stats[k] for k in
               ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
               if k in stats}
    except Exception:
        pass
    print(json.dumps({
        "metric": f"FID-{args.num} rehearsal wall-clock (VGG+G+Inception "
                  "on-chip, sqrtm on host)",
        "fid": round(fid, 4),
        "images": args.num,
        "batch": args.batch,
        "wall_s": round(dt, 1),
        "images_per_sec": round(2 * args.num / dt, 1),  # real + fake passes
        "memory": mem,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
