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
    n_images = n_batches * args.batch
    host_rng = np.random.default_rng(0)

    # Stage a pool of device-resident batches and run the WHOLE 10k pass as
    # ONE jitted lax.scan: this dev host reaches the chip through a network
    # relay where each dispatch is a multi-second round-trip (measured: the
    # per-batch-dispatch version of this script took 29 min for ~10 s of
    # device FLOPs). The scan packages the exact production compute —
    # generate_fn + FIDEvaluator._moments — into a single dispatch, so the
    # wall clock below is genuine device time.
    n_stage = min(n_batches, args.stage)
    staged = [jax.tree.map(jnp.asarray,
                           synthetic_batch(cfg, args.batch, host_rng,
                                           validation=True))
              for _ in range(n_stage)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *staged)
    keys = jax.random.split(rng, n_batches)
    idx = jnp.arange(n_batches) % n_stage

    @jax.jit
    def fid_moments_pass(variables, state, stacked, keys, idx):
        dim = 2048

        def body(carry, inp):
            key, i = inp
            batch = jax.tree.map(lambda x: x[i], stacked)
            fakes = generate_fn(state, batch["images"], batch["masks"],
                                batch["labels"], key)
            m_r = evaluator._moments(variables, batch["images"], args.batch)
            m_f = evaluator._moments(variables, fakes, args.batch)
            s1r, s2r, s1f, s2f = carry
            return (s1r + m_r[0], s2r + m_r[1],
                    s1f + m_f[0], s2f + m_f[1]), None

        zeros = (jnp.zeros((dim,)), jnp.zeros((dim, dim)),
                 jnp.zeros((dim,)), jnp.zeros((dim, dim)))
        carry, _ = jax.lax.scan(body, zeros, (keys, idx))
        return carry

    from semantic_pyramid_for_image_generation_tpu.eval.fid import (
        fid_from_moments_device,
        fid_from_statistics,
        statistics_from_moments,
    )

    t_compile = time.perf_counter()
    dev_moments = fid_moments_pass(
        evaluator.variables, state, stacked, keys, idx)
    float(jax.device_get(dev_moments[0][0]))  # relay-reliable sync
    compile_and_run_s = time.perf_counter() - t_compile
    t0 = time.perf_counter()
    dev_moments = fid_moments_pass(
        evaluator.variables, state, stacked, keys, idx)
    float(jax.device_get(dev_moments[0][0]))
    dt = time.perf_counter() - t0
    print(f"first call (compile+run) {compile_and_run_s:.1f}s", flush=True)

    # Statistics stage, both ways (VERDICT r4 lever: --fid_device_stats).
    # Host path: fetch 34 MB of moments over the relay, f64 numpy stats,
    # scipy general-matrix sqrtm on the 1-core host.
    t0 = time.perf_counter()
    s1r, s2r, s1f, s2f = jax.device_get(dev_moments)
    mu_r, cov_r = statistics_from_moments(n_images, s1r, s2r)
    mu_f, cov_f = statistics_from_moments(n_images, s1f, s2f)
    fid = fid_from_statistics(mu_r, cov_r, mu_f, cov_f)
    stats_host_s = time.perf_counter() - t0
    # Device path: eigh-based tr-sqrtm on chip, ONE f32 scalar crosses.
    fid_dev_first = float(jax.device_get(fid_from_moments_device(
        n_images, *dev_moments)))  # includes compile
    t0 = time.perf_counter()
    fid_dev = float(jax.device_get(fid_from_moments_device(
        n_images, *dev_moments)))
    stats_device_s = time.perf_counter() - t0
    assert np.isfinite(fid_dev_first)
    print(f"stats host {stats_host_s:.1f}s (fid={fid:.4f})  "
          f"device {stats_device_s:.1f}s (fid={fid_dev:.4f})", flush=True)

    mem = {}
    try:
        stats = jax.devices()[0].memory_stats() or {}
        mem = {k: stats[k] for k in
               ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
               if k in stats}
    except Exception:
        pass
    print(json.dumps({
        "metric": f"FID-{n_images} rehearsal wall-clock (VGG+G+Inception "
                  "on-chip, single-dispatch scan, sqrtm on host)",
        "fid": round(fid, 4),
        "fid_device_stats": round(fid_dev, 4),
        "images": n_images,
        "batch": args.batch,
        "wall_s": round(dt, 1),
        "stats_host_s": round(stats_host_s, 1),
        "stats_device_s": round(stats_device_s, 2),
        "images_per_sec": round(2 * n_images / dt, 1),  # real + fake passes
        "memory": mem,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
