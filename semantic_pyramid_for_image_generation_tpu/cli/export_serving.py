"""Export the generation path as a hermetic serving artifact.

Usage:
    spig-export --load_checkpoint runs/models_X/checkpoint_003 \
        --load_pretrained_vgg16 pre_trained_models/vgg_places_365_fine_tuned.pt \
        --out artifacts/generate --batch_sizes 1,8,64 --platforms tpu,cpu

Produces `<out>/manifest.json` + one `generate_b{N}.jaxexp` StableHLO
program per batch bucket (serving/export.py). The reference has no
equivalent — deploying it means shipping the torch source tree and
re-instantiating modules from a pickle (/root/reference/main.py:60-74);
this artifact is loadable by any jax host via `jax.export.deserialize`.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", type=str, required=True,
                   help="artifact output directory")
    p.add_argument("--batch_sizes", type=str, default="1",
                   help="comma-separated batch buckets to export")
    p.add_argument("--platforms", type=str, default=None,
                   help="comma-separated lowering targets, e.g. 'tpu,cpu' "
                        "(default: current jax backend)")
    p.add_argument("--weights", type=str, default="external",
                   choices=["external", "baked"],
                   help="'external' (default): KB-sized programs + one "
                        "weights.npz shared by all buckets; 'baked': "
                        "self-contained programs with weights as constants")
    p.add_argument("--classifier", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="also export classify_b1.jaxexp (images -> fc8 "
                        "logits) so serving can auto-derive class_id")
    p.add_argument("--load_checkpoint", type=str, default=None,
                   help="orbax TrainState dir or reference .pt checkpoint")
    p.add_argument("--load_pretrained_vgg16", type=str, default=None,
                   help="fine-tuned VGG16 .pt (vgg_places_365_fine_tuned)")
    p.add_argument("--seed", type=int, default=0,
                   help="init seed for any weights not covered by a load")
    p.add_argument("--device", type=str, default="tpu")
    p.add_argument("--channel_factor", type=float, default=1.0)
    p.add_argument("--vgg_width_factor", type=int, default=1)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from semantic_pyramid_for_image_generation_tpu.config import (
        PyramidGANConfig,
    )
    from semantic_pyramid_for_image_generation_tpu.serving import (
        save_artifact,
    )
    from semantic_pyramid_for_image_generation_tpu.train.state import (
        init_train_state,
        make_optimizers,
    )

    config = PyramidGANConfig(
        channels_factor=args.channel_factor, compute_dtype=args.dtype,
        vgg_width_factor=args.vgg_width_factor)

    g_variables = d_variables = vgg_variables = None
    if args.load_pretrained_vgg16:
        from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
            convert_vgg16_state_dict,
            load_torch_file,
        )

        vgg_variables = convert_vgg16_state_dict(
            load_torch_file(args.load_pretrained_vgg16))
    if args.load_checkpoint and args.load_checkpoint.endswith(".pt"):
        from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
            load_reference_gan_checkpoint,
        )

        g_variables, d_variables = load_reference_gan_checkpoint(
            args.load_checkpoint)
    g_tx, d_tx = make_optimizers()
    state = init_train_state(
        jax.random.key(args.seed), config, g_tx, d_tx,
        vgg_variables=vgg_variables, g_variables=g_variables,
        d_variables=d_variables)
    if args.load_checkpoint and not args.load_checkpoint.endswith(".pt"):
        from semantic_pyramid_for_image_generation_tpu.train.checkpoint import (
            restore_checkpoint,
        )

        state = restore_checkpoint(args.load_checkpoint, state)
    if not (args.load_checkpoint and args.load_pretrained_vgg16):
        print("WARNING: exporting with randomly initialized weights "
              "(no --load_checkpoint / --load_pretrained_vgg16) — "
              "artifact is a pipeline smoke, not a trained model",
              file=sys.stderr)

    platforms = args.platforms.split(",") if args.platforms else None
    manifest = save_artifact(
        state, config, args.out,
        batch_sizes=[int(b) for b in args.batch_sizes.split(",")],
        platforms=platforms, weights=args.weights,
        classifier=args.classifier)
    print(json.dumps({"out": args.out,
                      "batch_buckets": manifest["batch_buckets"],
                      "platforms": manifest["platforms"],
                      "weights": manifest["weights"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
