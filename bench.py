"""Benchmark: fused G/D train-step throughput at 256x256, full-width model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Default lane (round 4+): `--steps` train steps packaged in ONE donated
lax.scan — the relay-RTT-free device rate. `--per-step` restores the
pre-round-4 conservative lane (one dispatch + one device_get sync per step).

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


def make_jpeg_tree(root: str, image_size: int, per_class: int = 64,
                   classes: int = 4) -> str:
    """Synthetic Places365-format JPEG tree for host-pipeline measurement."""
    import os

    from PIL import Image

    rng = np.random.default_rng(0)
    lines = []
    for c in range(classes):
        d = os.path.join(root, "train", f"class_{c:02d}")
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            # low-frequency content so JPEG decode cost is realistic
            base = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
            img = Image.fromarray(base).resize((image_size, image_size),
                                               Image.BILINEAR)
            img.save(os.path.join(d, f"{i:03d}.jpg"), quality=88)
            lines.append(f"train/class_{c:02d}/{i:03d}.jpg")
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return root


def host_pipeline_bench(args) -> None:
    """End-to-end (host-fed) training throughput: real JPEG decode + native
    mask/normalize kernels + device feed, vs the synthetic-batch number
    (SURVEY.md hard part 8; reference anchor: num_workers=batch_size
    DataLoader, /root/reference/main.py:82)."""
    import tempfile

    from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
    from semantic_pyramid_for_image_generation_tpu.data.places365 import (
        Places365,
        Places365Loader,
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

    with tempfile.TemporaryDirectory() as root:
        make_jpeg_tree(root, cfg.image_size,
                       per_class=max(16, args.batch_size // 2))
        ds = Places365(root, "train.txt", cfg)
        loader = Places365Loader(ds, batch_size=args.batch_size,
                                 num_workers=args.num_workers, prefetch=2,
                                 compact_feed=args.compact_feed)

        # --- loader-only throughput (host decode + masks + collate) --------
        for _ in loader:  # warm the page cache / thread pool
            break
        t0 = time.perf_counter()
        n_imgs = 0
        for batch in loader:
            n_imgs += batch["images"].shape[0]
        loader_rate = n_imgs / (time.perf_counter() - t0)

        # --- host-fed train-step throughput ---------------------------------
        g_tx, d_tx = make_optimizers()
        state = init_train_state(jax.random.key(0), cfg, g_tx, d_tx,
                                 use_pallas_attention=use_pallas)
        generator, discriminator, vgg = make_models(cfg, use_pallas)
        step = make_train_step(generator, discriminator, vgg, g_tx, d_tx,
                               remat_vgg=args.remat,
                               fused_discriminator=args.fused_d)
        rng = jax.random.key(1)
        first = next(iter(loader))
        put = lambda b: jax.tree.map(jnp.asarray, b)  # noqa: E731
        for _ in range(args.warmup):
            state, metrics = step(state, put(first), rng)
        float(jax.device_get(metrics["loss_generator"]))

        t0 = time.perf_counter()
        n_imgs = 0
        steps_done = 0
        while steps_done < args.steps:
            for batch in loader:
                state, metrics = step(state, put(batch), rng)
                n_imgs += batch["images"].shape[0]
                steps_done += 1
                if steps_done >= args.steps:
                    break
        float(jax.device_get(metrics["loss_generator"]))
        dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    per_chip = n_imgs / dt / n_chips
    feed = "uint8" if args.compact_feed else "float32"
    print(json.dumps({
        "metric": f"images/sec/chip, 256x256 host-fed ({feed} feed, JPEG "
                  f"decode + native masks) train step; loader alone: "
                  f"{round(loader_rate, 1)}",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / V100_BASELINE_IMG_PER_SEC, 2),
    }))


def trainer_bench(args) -> None:
    """Production-loop throughput: drive the REAL Trainer.train host-fed
    (threaded JPEG decode + native masks + compact feed + batched metric
    fetches) and report img/s/chip. Exists to prove the loop users actually
    run matches the raw-step number (VERDICT r2 task 1) — the reference's
    hot path is its loop too (/root/reference/model_wrapper.py:131-190)."""
    import tempfile

    from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
    from semantic_pyramid_for_image_generation_tpu.data.places365 import (
        Places365,
        Places365Loader,
    )
    from semantic_pyramid_for_image_generation_tpu.train.loop import Trainer

    use_pallas = args.pallas and jax.default_backend() == "tpu"
    cfg = PyramidGANConfig(
        compute_dtype=args.dtype, remat_blocks=args.remat_blocks,
        compat_projection=not (args.canonical or args.fused_d))

    with tempfile.TemporaryDirectory() as root, \
            tempfile.TemporaryDirectory() as save_dir:
        # enough images that one timed epoch >= args.steps batches
        per_class = max(16, -(-args.batch_size * args.steps // 4))
        make_jpeg_tree(root, cfg.image_size, per_class=per_class)
        loader = Places365Loader(
            Places365(root, "train.txt", cfg),
            batch_size=args.batch_size, num_workers=args.num_workers,
            prefetch=2, compact_feed=args.compact_feed)
        trainer = Trainer(
            cfg, loader, validation_dataset=None,
            save_data_path=save_dir, use_pallas_attention=use_pallas,
            remat_vgg=args.remat, fused_discriminator=args.fused_d,
            allow_random_fid=True)
        # epoch 1: compile + page-cache warmup; saves checkpoint_000 (so the
        # save path is exercised) and we time that save separately — on the
        # relay-attached dev chip the full-state device_get behind one orbax
        # save costs minutes, which would dominate a 1k-image bench epoch
        # while amortizing to noise over a real 1.8M-image Places365 epoch.
        t0 = time.perf_counter()
        trainer.train(epochs=1, validate_at_start=False, progress=False,
                      log_every=args.log_every)
        warmup_wall = time.perf_counter() - t0
        n_before = trainer.samples_seen
        t0 = time.perf_counter()
        # cadence > epoch counter => the timed epoch runs the loop only
        trainer.train(epochs=1, validate_at_start=False, progress=False,
                      log_every=args.log_every,
                      save_model_after_n_epochs=10**9)
        dt = time.perf_counter() - t0  # train() flush syncs at epoch end
        n_imgs = trainer.samples_seen - n_before
        ckpt_s = warmup_wall - dt  # compile-epoch overhead incl. the save

    per_chip = n_imgs / dt / jax.device_count()
    print(json.dumps({
        "metric": f"images/sec/chip, 256x256 production Trainer.train "
                  f"(host-fed, log_every={args.log_every}; per-epoch "
                  f"checkpoint excluded from the timed epoch, warmup epoch "
                  f"incl. compile+save took {round(ckpt_s, 1)}s longer)",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / V100_BASELINE_IMG_PER_SEC, 2),
    }))


def serving_bench(args) -> None:
    """Chip-side serving latency/throughput of the generation path — the
    cli/generate.py hot loop (VGG pyramid of the conditioning image + masks +
    eval-mode Generator forward with the batched sigma pass). `--steps`
    independent latent draws are packaged into ONE lax.scan dispatch so the
    dev relay's seconds-per-dispatch cost doesn't pollute the number
    (CLAUDE.md design rule; on a TPU VM each call is its own sub-ms
    dispatch). `--batch_size 1 --serving` is the latency operating point."""
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
        make_generate_fn,
    )

    use_pallas = args.pallas and jax.default_backend() == "tpu"
    cfg = PyramidGANConfig(compute_dtype=args.dtype,
                           channels_factor=args.channel_factor,
                           vgg_width_factor=args.vgg_width_factor)
    g_tx, d_tx = make_optimizers()
    state = init_train_state(jax.random.key(0), cfg, g_tx, d_tx,
                             use_pallas_attention=use_pallas)
    generator, _, vgg = make_models(cfg, use_pallas)
    generate = make_generate_fn(generator, vgg)

    batch = jax.tree.map(
        jnp.asarray,
        synthetic_batch(cfg, args.batch_size, np.random.default_rng(0),
                        validation=True))

    @jax.jit
    def scan_generate(state, images, masks, labels, rng):
        def body(_, step_rng):
            fake = generate(state, images, masks, labels, step_rng)
            # probe one pixel per call: forces execution, syncs ~nothing
            return 0.0, fake[0, 0, 0, 0]

        _, probes = jax.lax.scan(
            body, 0.0, jax.random.split(rng, args.steps))
        return probes

    run = lambda seed: float(jax.device_get(scan_generate(  # noqa: E731
        state, batch["images"], batch["masks"], batch["labels"],
        jax.random.key(seed)))[-1])
    run(0)  # compile
    t0 = time.perf_counter()
    run(1)
    dt = time.perf_counter() - t0

    n = args.batch_size * args.steps
    per_chip = n / dt / jax.device_count()
    print(json.dumps({
        "metric": f"images/sec/chip, 256x256 serving generate "
                  f"(VGG pyramid + G eval fwd, batch {args.batch_size}; "
                  f"{round(1000.0 * dt / args.steps, 1)} ms/call chip-side)",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / V100_BASELINE_IMG_PER_SEC, 2),
    }))


def serving_artifact_bench(args) -> None:
    """Chip-side throughput of the EXPORTED serving artifact
    (serving/export.py): export the generate path at --batch_size for the
    current backend in the production external-weights mode (the program is
    KB-sized; weights are a runtime argument — baking the full-width ~0.7 GB
    of constants into the module exceeds the dev relay's remote-compile
    request limit and bloats compile time everywhere), round-trip it through
    serialize/deserialize exactly as a deployment would, then time `--steps`
    calls packaged in ONE lax.scan (identical packaging to serving_bench, so
    the two lanes are directly comparable — any gap is the artifact-call
    overhead)."""
    import jax.export

    from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
    from semantic_pyramid_for_image_generation_tpu.data.synthetic import (
        synthetic_batch,
    )
    from semantic_pyramid_for_image_generation_tpu.serving import (
        export_generate,
    )
    from semantic_pyramid_for_image_generation_tpu.serving.export import (
        serving_weights,
    )
    from semantic_pyramid_for_image_generation_tpu.train.state import (
        init_train_state,
        make_optimizers,
    )

    use_pallas = args.pallas and jax.default_backend() == "tpu"
    cfg = PyramidGANConfig(compute_dtype=args.dtype,
                           channels_factor=args.channel_factor,
                           vgg_width_factor=args.vgg_width_factor)
    g_tx, d_tx = make_optimizers()
    state = init_train_state(jax.random.key(0), cfg, g_tx, d_tx,
                             use_pallas_attention=use_pallas)
    exported = export_generate(state, cfg, args.batch_size,
                               use_pallas_attention=use_pallas,
                               weights="external")
    blob = exported.serialize()
    restored = jax.export.deserialize(bytearray(blob))
    weights = jax.device_put(serving_weights(state))

    batch = jax.tree.map(
        jnp.asarray,
        synthetic_batch(cfg, args.batch_size, np.random.default_rng(0),
                        validation=True))
    masks = tuple(m.astype(jnp.float32) for m in batch["masks"])

    @jax.jit
    def scan_calls(weights, images, masks, labels, rng):
        def body(_, step_rng):
            noise = jax.random.normal(
                step_rng, (args.batch_size, cfg.latent_dim), jnp.float32)
            fake = restored.call(weights, images, masks, labels, noise)
            return 0.0, fake[0, 0, 0, 0]

        _, probes = jax.lax.scan(
            body, 0.0, jax.random.split(rng, args.steps))
        return probes

    run = lambda seed: float(jax.device_get(scan_calls(  # noqa: E731
        weights, batch["images"], masks, batch["labels"],
        jax.random.key(seed)))[-1])
    run(0)  # compile
    t0 = time.perf_counter()
    run(1)
    dt = time.perf_counter() - t0

    n = args.batch_size * args.steps
    per_chip = n / dt / jax.device_count()
    print(json.dumps({
        "metric": f"images/sec/chip, 256x256 serving generate via EXPORTED "
                  f"StableHLO artifact ({len(blob) / 1e3:.0f} KB program, "
                  f"external weights, batch {args.batch_size}; "
                  f"{round(1000.0 * dt / args.steps, 1)} ms/call chip-side)",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / V100_BASELINE_IMG_PER_SEC, 2),
    }))


def scan_steps_bench(args) -> None:
    """Dispatch-free train-step lane (VERDICT r3 item 5), the DEFAULT headline
    since round 4: package `--steps` full train steps into ONE lax.scan (state
    donated, carried on device), so the headline device rate is decoupled from
    the relay's seconds-per-call dispatch/sync cost — the same packaging trick
    serving_bench uses. `--per-step` keeps one host sync per step
    (conservative: couples the number to relay RTT). On a real TPU VM the two
    converge (dispatch is sub-ms there); on the relay-attached dev chip the
    scan lane is the truthful chip rate (278 vs 258 img/s at batch 128)."""
    from functools import partial

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
        channels_factor=args.channel_factor,
        vgg_width_factor=args.vgg_width_factor,
        compat_projection=not (args.canonical or args.fused_d))
    g_tx, d_tx = make_optimizers()
    state = init_train_state(jax.random.key(0), cfg, g_tx, d_tx,
                             use_pallas_attention=use_pallas)
    generator, discriminator, vgg = make_models(cfg, use_pallas)
    # donate at the OUTER jit; the inner jitted step inlines into the scan
    step = make_train_step(generator, discriminator, vgg, g_tx, d_tx,
                           remat_vgg=args.remat,
                           fused_discriminator=args.fused_d, donate=False)

    batch = jax.tree.map(
        jnp.asarray,
        synthetic_batch(cfg, args.batch_size, np.random.default_rng(0)))

    @partial(jax.jit, donate_argnums=(0,))
    def run_steps(state, batch, rng):
        def body(st, _):
            # the step folds rng with st.step, so noise still varies per step
            st, metrics = step(st, batch, rng)
            return st, metrics["loss_generator"]

        state, losses = jax.lax.scan(body, state, None, length=args.steps)
        return state, losses[-1]

    rng = jax.random.key(1)
    state, probe = run_steps(state, batch, rng)  # compile + warmup walk
    float(jax.device_get(probe))
    t0 = time.perf_counter()
    state, probe = run_steps(state, batch, rng)
    final = float(jax.device_get(probe))  # ONE sync for the whole package
    dt = time.perf_counter() - t0
    assert np.isfinite(final)

    per_chip = args.batch_size * args.steps / dt / jax.device_count()
    print(json.dumps({
        "metric": f"images/sec/chip, 256x256 fused G/D train step, "
                  f"{args.steps} steps in ONE lax.scan dispatch "
                  f"(device rate, relay-RTT-free)",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / V100_BASELINE_IMG_PER_SEC, 2),
    }))


def vgg_finetune_bench(args) -> None:
    """On-chip operating point of the second training entry point
    (cli/vgg16_finetune.py; reference: /root/reference/vgg_16_train.py) —
    the jitted forward+CE+Adam VGG-16 step on synthetic 256x256 batches.
    VERDICT r3 weak 7: the lane was CPU drive-tested but never timed on TPU."""
    import optax

    from semantic_pyramid_for_image_generation_tpu.cli.vgg16_finetune import (
        make_finetune_step,
    )
    from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
    from semantic_pyramid_for_image_generation_tpu.models import VGG16

    cfg = PyramidGANConfig(compute_dtype=args.dtype,
                           vgg_width_factor=args.vgg_width_factor)
    model = VGG16(cfg, return_output=True)
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32))
    params = variables["params"]
    tx = optax.adam(1e-4)  # reference lr (vgg_16_train.py:106)
    opt_state = tx.init(params)
    step = make_finetune_step(model, tx)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random(
        (args.batch_size, cfg.image_size, cfg.image_size, 3), np.float32))
    labels = jnp.asarray(rng.integers(0, cfg.num_classes, args.batch_size))

    key = jax.random.key(1)
    for _ in range(args.warmup):
        params, opt_state, loss, top1 = step(params, opt_state, images,
                                             labels, key, jnp.float32(1.0))
    float(jax.device_get(loss))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        params, opt_state, loss, top1 = step(params, opt_state, images,
                                             labels, key, jnp.float32(1.0))
        float(jax.device_get(loss))  # relay-reliable sync (see main lane)
    dt = time.perf_counter() - t0

    per_chip = args.batch_size * args.steps / dt / jax.device_count()
    print(json.dumps({
        "metric": "images/sec/chip, 256x256 VGG16 fine-tune step "
                  "(fwd + CE + Adam, cli/vgg16_finetune.py)",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / V100_BASELINE_IMG_PER_SEC, 2),
    }))


def check_pallas_bench(args) -> None:
    """On-chip Pallas attention assertion lane (VERDICT r4 item 4): compare
    pooled_kv_attention — forward AND all three input gradients — against the
    XLA einsum path at the full-width generator shape (32x32 map: q 1024x32,
    kv 256x(32/128)) on the CURRENT backend, in fp32 and bf16. The unit-test
    evidence for the grads is interpret-mode; this lane pins the `--pallas`
    TPU default with a command that runs the real Mosaic kernel."""
    from semantic_pyramid_for_image_generation_tpu.ops.pallas.attention import (
        pooled_kv_attention,
    )

    b, nq, nk, c8, c2 = args.batch_size // 64 or 2, 1024, 256, 32, 128
    host = np.random.default_rng(0)

    def xla_path(q, k, v):
        # the SelfAttention plain-XLA path (models/layers.py:338-343)
        prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None)
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32, precision=prec)
        p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bqk,bkc->bqc", p, v, precision=prec)

    # Each path gets its OWN jit, and the oracle's inputs are upcast to fp32
    # ON THE HOST. Not just hygiene — this lane caught a toolchain bug:
    # a HIGHEST-precision fp32 dot whose operands are in-graph bf16->f32
    # upcasts is lowered (via Mosaic) to a bf16-operand/fp32-contract
    # tpu.matmul that the kernel compiler rejects ('Bad lhs type').
    # Bisected on-chip: the Pallas kernel alone compiles, kernel + an
    # unrelated HIGHEST dot compiles, and a jit holding ONLY the upcasting
    # oracle (zero Pallas) fails. Host-side upcast sidesteps it; separate
    # jits also mirror how production dispatches each path and keep the
    # comparison free of cross-path CSE.
    def fwd_and_grads(fn):
        @jax.jit
        def run(q, k, v, ct):
            out, vjp = jax.vjp(fn, q, k, v)
            return (out,) + vjp(ct.astype(out.dtype))
        return run

    run_pallas = fwd_and_grads(pooled_kv_attention)
    run_xla = fwd_and_grads(xla_path)

    report = {}
    ok = True
    for dtype in (jnp.float32, jnp.bfloat16):
        qn = host.standard_normal((b, nq, c8))
        kn = host.standard_normal((b, nk, c8))
        vn = host.standard_normal((b, nk, c2))
        q, k, v = (jnp.asarray(x, dtype) for x in (qn, kn, vn))
        # fp32 copies of the SAME (dtype-rounded) values, upcast on host
        q32, k32, v32 = (
            jnp.asarray(np.asarray(jax.device_get(x), np.float32))
            for x in (q, k, v))
        ct = jnp.asarray(host.standard_normal((b, nq, c2)), jnp.float32)
        ref, got_p, got_x = (
            [np.asarray(jax.device_get(t), np.float64) for t in out]
            for out in (run_xla(q32, k32, v32, ct),
                        run_pallas(q, k, v, ct),
                        run_xla(q, k, v, ct)))
        e_pallas = np.asarray([np.abs(t - r).max() for t, r in zip(got_p, ref)])
        e_xla = np.asarray([np.abs(t - r).max() for t, r in zip(got_x, ref)])
        name = jnp.dtype(dtype).name
        # fp32 is the torch-parity mode: the kernel must sit AT the oracle
        # (association-level noise only). bf16 is the perf mode: the kernel
        # must be no farther from the oracle than the XLA path it replaces
        # (its f32-upcast backward is usually closer), up to one bf16 ulp of
        # the observed scale.
        if dtype == jnp.float32:
            passed = bool(e_pallas.max() <= 1e-3)
        else:
            passed = bool(e_pallas.max() <= 2.0 * e_xla.max() + 1e-2)
        report[name] = {
            "pallas_vs_oracle": round(float(e_pallas.max()), 6),
            "xla_vs_oracle": round(float(e_xla.max()), 6),
            "pass": passed}
        ok = ok and passed
    print(json.dumps({
        "metric": f"pallas attention fwd+grads vs fp32-HIGHEST oracle at "
                  f"generator shape (q {nq}x{c8}, kv {nk}x{c2}, batch {b}) "
                  f"on {jax.default_backend()}: "
                  f"{'PASS' if ok else 'FAIL'} {report}",
        "value": report["float32"]["pallas_vs_oracle"],
        "unit": "max abs diff (pallas vs oracle, fp32 fwd+grads)",
        "vs_baseline": 1.0 if ok else 0.0,
    }))
    if not ok:
        raise SystemExit(1)


def main():
    from semantic_pyramid_for_image_generation_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()  # reruns skip the multi-minute XLA compile
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--pallas", default=True,
                        action=argparse.BooleanOptionalAction,
                        help="fused Pallas attention kernel on TPU")
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
    parser.add_argument("--host-pipeline", dest="host_pipeline",
                        action="store_true", default=False,
                        help="measure end-to-end host-fed throughput (JPEG "
                             "tree + native mask/normalize kernels) instead "
                             "of the synthetic device-resident batch")
    parser.add_argument("--trainer", action="store_true", default=False,
                        help="measure the REAL Trainer.train loop host-fed "
                             "(production path, batched metric fetches)")
    parser.add_argument("--scan-steps", dest="scan_steps",
                        default=True, action=argparse.BooleanOptionalAction,
                        help="package --steps train steps into one lax.scan "
                             "dispatch: the pure device rate, decoupled from "
                             "the relay's per-call dispatch/sync cost "
                             "(DEFAULT headline lane since round 4)")
    parser.add_argument("--per-step", dest="scan_steps",
                        action="store_false",
                        help="conservative lane: one jit dispatch + one "
                             "device_get sync per step (couples the number "
                             "to relay RTT; the pre-round-4 headline)")
    parser.add_argument("--check-pallas", dest="check_pallas",
                        action="store_true", default=False,
                        help="assertion lane: compare the Pallas attention "
                             "kernel (fwd + grads) against the XLA einsum "
                             "path at the full-width generator shape on the "
                             "current backend; exits nonzero on FAIL")
    parser.add_argument("--vgg-finetune", dest="vgg_finetune",
                        action="store_true", default=False,
                        help="time the VGG16 fine-tune step on-chip "
                             "(cli/vgg16_finetune.py's jitted CE+Adam update)")
    parser.add_argument("--serving", action="store_true", default=False,
                        help="measure the eval-mode generation path "
                             "(cli/generate.py hot loop) chip-side; use "
                             "--batch_size 1 for the latency operating point")
    parser.add_argument("--serving-artifact", dest="serving_artifact",
                        action="store_true", default=False,
                        help="measure the EXPORTED StableHLO serving "
                             "artifact (serving/export.py) chip-side; "
                             "directly comparable to --serving")
    parser.add_argument("--log_every", type=int, default=50)
    parser.add_argument("--channel_factor", type=float, default=1.0,
                        help="shrink G/D widths (CPU smoke runs only; the "
                             "headline number is full width)")
    parser.add_argument("--vgg_width_factor", type=int, default=1,
                        help="shrink VGG widths (CPU smoke runs only)")
    parser.add_argument("--num_workers", type=int, default=16)
    parser.add_argument("--compact-feed", dest="compact_feed",
                        default=True, action=argparse.BooleanOptionalAction,
                        help="host-pipeline mode: uint8 images/masks, "
                             "normalize on device (~4x fewer feed bytes)")
    parser.add_argument("--float-feed", dest="compact_feed",
                        action="store_false",
                        help="alias for --no-compact-feed")
    args = parser.parse_args()

    if args.host_pipeline:
        host_pipeline_bench(args)
        return
    if args.trainer:
        trainer_bench(args)
        return
    if args.check_pallas:
        check_pallas_bench(args)
        return
    if args.vgg_finetune:
        vgg_finetune_bench(args)
        return
    if args.serving:
        serving_bench(args)
        return
    if args.serving_artifact:
        serving_artifact_bench(args)
        return
    if args.scan_steps:  # default headline; --per-step for the sync-per-step lane
        scan_steps_bench(args)
        return

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
