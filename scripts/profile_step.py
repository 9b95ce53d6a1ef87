"""Profile the fused train step on the TPU and emit a per-op roofline table.

VERDICT r2 task 3: settle the conv-bound-plateau claim with evidence —
(a) the explicit-copy share of step time post-rework (was ~8.5% in round 1),
(b) every >=2% HLO op vs its own roofline bound.

Captures a jax.profiler xplane around N steps at the operating point
(batch 128 bf16, full width), converts it with xprof's hlo_stats tool, and
prints: total step time, per-category shares (convolution / copy / fusion /
all-reduce / ...), and the top ops with their % of step time, FLOP rate and
bandwidth (so each can be checked against the 197 TFLOP/s bf16 MXU peak and
~800 GB/s HBM of a v5e chip).

Usage: python scripts/profile_step.py [--batch 128] [--steps 3] [--keep]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(args, log_dir: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

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

    use_pallas = jax.default_backend() == "tpu"
    cfg = PyramidGANConfig(compute_dtype=args.dtype)
    g_tx, d_tx = make_optimizers()
    state = init_train_state(jax.random.key(0), cfg, g_tx, d_tx,
                             use_pallas_attention=use_pallas)
    generator, discriminator, vgg = make_models(cfg, use_pallas)
    step = make_train_step(generator, discriminator, vgg, g_tx, d_tx)
    batch = jax.tree.map(
        jnp.asarray, synthetic_batch(cfg, args.batch, np.random.default_rng(0)))
    rng = jax.random.key(1)

    for _ in range(args.warmup):
        state, metrics = step(state, batch, rng)
    float(jax.device_get(metrics["loss_generator"]))
    jax.profiler.start_trace(log_dir)
    for _ in range(args.steps):
        state, metrics = step(state, batch, rng)
    float(jax.device_get(metrics["loss_generator"]))
    jax.profiler.stop_trace()


def analyze(log_dir: str, steps: int) -> dict:
    from xprof.convert import raw_to_tool_data

    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {log_dir}"
    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    table = json.loads(data)
    # hlo_stats JSON: gviz-style {cols: [...], rows: [{c: [{v: ...}...]}]}
    cols = [c["label"] for c in table["cols"]]
    rows = [[cell["v"] if cell else None for cell in r["c"]]
            for r in table["rows"]]

    def col(*names):
        """First matching column index (xprof label spelling varies)."""
        for name in names:
            for i, label in enumerate(cols):
                if name.lower() in label.lower():
                    return i
        return None

    i_cat = col("category")
    i_name = col("HLO op name", "op name")
    i_self = col("Total self time (us)")
    i_flops = col("Normalized GFLOP/s")
    i_bw = col("Measured memory BW")
    i_hbm = col("HBM BW")
    i_bound = col("Bound by")
    i_text = col("HLO op text")
    i_occ = col("#Occurrences")
    i_src = col("Source Info")
    assert i_cat is not None and i_name is not None and i_self is not None, cols
    total_us = sum(r[i_self] or 0.0 for r in rows)
    by_cat = {}
    for r in rows:
        by_cat[r[i_cat]] = by_cat.get(r[i_cat], 0.0) + (r[i_self] or 0.0)

    def fmt(r):
        share = (r[i_self] or 0.0) / max(total_us, 1e-9)
        d = {
            "op": (r[i_name] or "")[:80],
            "category": r[i_cat],
            "n": r[i_occ] if i_occ is not None else None,
            "self_us_per_step": round((r[i_self] or 0.0) / steps, 1),
            "share_pct": round(100 * share, 2),
            "bound_by": r[i_bound] if i_bound is not None else None,
            "gflops_per_s": (round(r[i_flops], 1)
                             if i_flops is not None and r[i_flops] else None),
            "mem_bw_gib_s": (round(r[i_bw], 1)
                             if i_bw is not None and r[i_bw] else None),
            "hbm_bw_gib_s": (round(r[i_hbm], 1)
                             if i_hbm is not None and r[i_hbm] else None),
            "text": (r[i_text] or "")[:220] if i_text is not None else None,
            "src": (r[i_src] or "")[:120] if i_src is not None else None,
        }
        return d

    ordered = sorted(rows, key=lambda r: -(r[i_self] or 0.0))
    top = [fmt(r) for r in ordered[:20]]
    format_ops = [fmt(r) for r in ordered
                  if r[i_cat] in ("data formatting", "copy", "broadcast",
                                  "pad", "slice", "concatenate")][:12]
    loop_ops = [fmt(r) for r in ordered if r[i_cat] == "loop fusion"][:10]
    return {
        "total_device_us_per_step": round(total_us / steps, 1),
        "category_shares_pct": {
            k: round(100 * v / max(total_us, 1e-9), 2)
            for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])},
        "top_ops": top,
        "data_formatting_ops": format_ops,
        "loop_fusion_ops": loop_ops,
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--keep", action="store_true",
                   help="keep the trace dir (prints its path)")
    p.add_argument("--log_dir", type=str, default=None)
    p.add_argument("--analyze_only", action="store_true",
                   help="re-analyze an existing --log_dir without capturing")
    args = p.parse_args()

    if args.log_dir:
        os.makedirs(args.log_dir, exist_ok=True)
        if not args.analyze_only:
            capture(args, args.log_dir)
        report = analyze(args.log_dir, args.steps)
        print(json.dumps(report, indent=1))
        return 0
    with tempfile.TemporaryDirectory() as td:
        log_dir = td
        if args.keep:
            log_dir = tempfile.mkdtemp(prefix="xplane_")
        capture(args, log_dir)
        report = analyze(log_dir, args.steps)
        print(json.dumps(report, indent=1))
        if args.keep:
            print("trace kept at", log_dir, file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
