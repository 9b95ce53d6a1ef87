"""Benchmark: fused G/D train-step throughput at 256x256, full-width model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor: the reference trained ~600k samples in ~24h on one V100
(/root/reference/README.md:68-71) => ~6.94 images/sec. BASELINE.md notes the
reference publishes no direct img/s, so that wall-clock-derived figure is the
documented V100 anchor for `vs_baseline`.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

V100_BASELINE_IMG_PER_SEC = 600_000 / (24 * 3600)  # ~6.94


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--pallas", action="store_true", default=True)
    parser.add_argument("--no-pallas", dest="pallas", action="store_false")
    parser.add_argument("--remat", action="store_true", default=False,
                        help="rematerialize the VGG-fake forward (bigger batches)")
    parser.add_argument("--remat-blocks", dest="remat_blocks",
                        action="store_true", default=False,
                        help="rematerialize G/D residual blocks (biggest batches)")
    parser.add_argument("--canonical-projection", dest="canonical",
                        action="store_true", default=False,
                        help="canonical (B,1) projection head instead of the "
                             "reference's (B,B,128) broadcast quirk")
    parser.add_argument("--fused-d", dest="fused_d", action="store_true",
                        default=False,
                        help="perf mode: one D(real++fake) 2B pass "
                             "(implies --canonical-projection)")
    args = parser.parse_args()

    from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
    from semantic_pyramid_for_image_generation_tpu.data.synthetic import (
        synthetic_batch,
    )
    from semantic_pyramid_for_image_generation_tpu.train.state import (
        init_train_state,
        make_models,
        make_optimizers,
    )
    from semantic_pyramid_for_image_generation_tpu.train.step import (
        make_train_step,
    )

    use_pallas = args.pallas and jax.default_backend() == "tpu"
    cfg = PyramidGANConfig(
        compute_dtype=args.dtype, remat_blocks=args.remat_blocks,
        compat_projection=not (args.canonical or args.fused_d))
    g_tx, d_tx = make_optimizers()
    state = init_train_state(jax.random.key(0), cfg, g_tx, d_tx,
                             use_pallas_attention=use_pallas)
    generator, discriminator, vgg = make_models(cfg, use_pallas)
    step = make_train_step(generator, discriminator, vgg, g_tx, d_tx,
                           remat_vgg=args.remat,
                           fused_discriminator=args.fused_d)

    batch = jax.tree.map(
        jnp.asarray,
        synthetic_batch(cfg, args.batch_size, np.random.default_rng(0)))
    rng = jax.random.key(1)

    def sync(metrics):
        # device_get of a scalar is the only reliable sync on the axon relay;
        # block_until_ready has been observed to return before execution
        # finishes there and under-report wall time
        return float(jax.device_get(metrics["loss_generator"]))

    for _ in range(args.warmup):
        state, metrics = step(state, batch, rng)
    sync(metrics)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch, rng)
        sync(metrics)
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    images_per_sec = args.batch_size * args.steps / dt
    per_chip = images_per_sec / n_chips
    print(json.dumps({
        "metric": "images/sec/chip, 256x256 fused G/D train step",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / V100_BASELINE_IMG_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
