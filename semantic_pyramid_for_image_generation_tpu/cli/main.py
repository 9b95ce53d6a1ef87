"""Flag-compatible CLI (/root/reference/main.py:4-42) with TPU extensions.

Reference flags preserved: --train --test --batch_size --lr --channel_factor
--device --load_checkpoint --load_pretrained_vgg16 --path_to_places365
--epochs. GPU-specific flags (--gpus_to_use, --use_data_parallel) are accepted
for compatibility but parallelism here is always the data mesh over all
visible devices. TPU additions promote the reference's hidden defaults to
flags (SURVEY.md 5 'Config'): --w_rec --w_div --validate_after_n_iterations
--dtype --pallas --save_data_path --load_inception.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Semantic Pyramid for Image Generation — TPU-native")
    # --- reference-compatible flags (main.py:4-42) ---
    p.add_argument("--train", default=False, action="store_true",
                   help="Train network")
    p.add_argument("--test", default=False, action="store_true",
                   help="Test network (FID + sample grid)")
    p.add_argument("--batch_size", type=int, default=20)
    p.add_argument("--lr", type=float, default=1e-05)
    p.add_argument("--channel_factor", type=float, default=1.0)
    p.add_argument("--device", type=str, default="tpu",
                   help="tpu | cpu (reference default was cuda)")
    p.add_argument("--gpus_to_use", type=str, default="",
                   help="accepted for reference compatibility; ignored on TPU")
    p.add_argument("--use_data_parallel", default=False, action="store_true",
                   help="accepted for compatibility; the data mesh always "
                        "spans all visible devices")
    p.add_argument("--load_checkpoint", type=str, default=None,
                   help="orbax checkpoint dir or reference .pt checkpoint")
    p.add_argument("--load_pretrained_vgg16", type=str,
                   default="pre_trained_models/vgg_places_365_fine_tuned.pt")
    p.add_argument("--path_to_places365", type=str, default="places365_standard")
    p.add_argument("--epochs", type=int, default=50)
    # --- TPU-native additions ---
    p.add_argument("--w_rec", type=float, default=0.1)
    p.add_argument("--w_div", type=float, default=0.1)
    p.add_argument("--validate_after_n_iterations", type=int, default=100_000)
    p.add_argument("--log_every", type=int, default=50,
                   help="fetch step metrics in one device_get every N steps "
                        "(1 = reference's per-iteration sync; larger keeps "
                        "the host off the step critical path)")
    p.add_argument("--save_model_after_n_epochs", type=int, default=1,
                   help="checkpoint cadence in epochs (the reference's "
                        "hidden default, model_wrapper.py:94; a full "
                        "TrainState save is a device->host fetch, so raise "
                        "this on slow links)")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--pallas", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="fused Pallas attention kernel on TPU")
    p.add_argument("--save_data_path", type=str, default="saved_data")
    p.add_argument("--load_inception", type=str, default=None,
                   help="torchvision inception_v3 .pt state dict for FID "
                        "(scripts/download_inception.sh)")
    p.add_argument("--allow_random_fid", default=False, action="store_true",
                   help="permit FID with a RANDOMLY initialized Inception "
                        "backbone (pipeline smoke only — the number is not a "
                        "standard FID); without this flag, --test/validation "
                        "requires --load_inception")
    p.add_argument("--fid_images", type=int, default=6000)
    p.add_argument("--fid_device_stats", default=False, action="store_true",
                   help="finish the FID moments -> scalar reduction on "
                        "device (f32 eigh) instead of host f64 scipy; one "
                        "scalar crosses to host instead of 34 MB of moments")
    p.add_argument("--num_workers", type=int, default=16)
    p.add_argument("--vgg_width_factor", type=int, default=1,
                   help="debug: divide VGG widths (CPU-scale smoke runs)")
    p.add_argument("--auto_resume", type=str, default=None,
                   help="models dir to auto-restore the newest checkpoint from")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compat_inference_indices", default=False,
                   action="store_true",
                   help="bug-compat: draw the 7 grid samples from "
                        "range(n_val_batches) like the reference "
                        "(model_wrapper.py:258-260 indexes the dataset with "
                        "indices drawn from len(dataloader)); default draws "
                        "from the whole validation set")
    # --- perf modes (OPTIM.md measured; defaults preserve reference parity) ---
    p.add_argument("--canonical_projection", default=False, action="store_true",
                   help="canonical (B,1) projection-discriminator head instead "
                        "of the reference's (B,B,128) broadcast quirk "
                        "(models.py:146-155)")
    p.add_argument("--fused_d", default=False, action="store_true",
                   help="perf mode: one D(real++fake) 2B-batch pass per D "
                        "phase (implies --canonical_projection). Identical "
                        "per-element math; the one semantic difference is a "
                        "single spectral power-iteration advance per D phase "
                        "instead of two (proven the only one by "
                        "tests/test_train_step.py)")
    p.add_argument("--remat_vgg", default=False, action="store_true",
                   help="rematerialize the VGG-fake forward in the G backward "
                        "(bigger per-chip batches)")
    p.add_argument("--remat_blocks", default=False, action="store_true",
                   help="rematerialize G/D residual blocks (biggest batches)")
    p.add_argument("--compact_feed", default=False, action="store_true",
                   help="feed uint8 images/masks and normalize on device "
                        "(~4x fewer host->device bytes per batch)")
    p.add_argument("--tensorboard", default=False, action="store_true",
                   help="also stream metrics to TensorBoard under "
                        "<metrics dir>/tensorboard")
    p.add_argument("--multihost", default=False, action="store_true",
                   help="initialize the JAX distributed runtime (multi-host "
                        "pods; single-host pods need no flag)")
    p.add_argument("--fsdp", type=int, default=1,
                   help="shard params + Adam moments + frozen VGG over this "
                        "many devices (2-D data x fsdp mesh, ZeRO-3 style); "
                        "must divide the device count")
    return p


def config_from_args(args):
    """Flag → PyramidGANConfig plumbing (perf modes included)."""
    from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig

    return PyramidGANConfig(
        channels_factor=args.channel_factor, compute_dtype=args.dtype,
        vgg_width_factor=args.vgg_width_factor,
        compat_projection=not (args.canonical_projection or args.fused_d),
        remat_blocks=args.remat_blocks)


def build_trainer(args):
    """Flags → a fully-wired Trainer (loaders, weights imports, checkpoint
    restore) — everything main() does before train()/test(). Exposed so other
    entry points (scripts/artifact_selftest.py) drive the SAME wiring instead
    of re-implementing it."""
    import jax

    from semantic_pyramid_for_image_generation_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()  # reruns skip the multi-minute XLA compile

    if args.device == "cpu":
        # env vars are too late here (this image's sitecustomize imports jax
        # at interpreter startup); switch via config instead
        jax.config.update("jax_platforms", "cpu")
    if args.multihost:
        jax.distributed.initialize()

    from semantic_pyramid_for_image_generation_tpu.data.places365 import (
        Places365,
        Places365Loader,
    )
    from semantic_pyramid_for_image_generation_tpu.train.loop import Trainer
    from semantic_pyramid_for_image_generation_tpu.train.state import param_count

    n_dev = jax.device_count()
    if args.batch_size % n_dev != 0:
        rounded = max(n_dev, (args.batch_size // n_dev) * n_dev)
        print(f"batch_size {args.batch_size} -> {rounded} "
              f"(multiple of the {n_dev}-device data mesh)")
        args.batch_size = rounded

    config = config_from_args(args)

    g_variables = d_variables = vgg_variables = inception_variables = None
    import os

    if args.load_pretrained_vgg16 and os.path.exists(args.load_pretrained_vgg16):
        from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
            convert_vgg16_state_dict,
            load_torch_file,
        )

        vgg_variables = convert_vgg16_state_dict(
            load_torch_file(args.load_pretrained_vgg16))
        print(f"Loaded pretrained VGG16 from {args.load_pretrained_vgg16}")
    g_moments = d_moments = None
    if args.load_checkpoint and args.load_checkpoint.endswith(".pt"):
        from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
            load_reference_gan_checkpoint,
        )

        g_variables, d_variables, g_moments, d_moments = (
            load_reference_gan_checkpoint(args.load_checkpoint,
                                          include_optimizer=True))
        print(f"Imported reference checkpoint {args.load_checkpoint}"
              + (" (with Adam moments)" if g_moments or d_moments else ""))
    if args.load_inception and os.path.exists(args.load_inception):
        from semantic_pyramid_for_image_generation_tpu.models.inception import (
            convert_inception_state_dict,
        )
        from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
            load_torch_file,
        )

        inception_variables = convert_inception_state_dict(
            load_torch_file(args.load_inception))

    # multihost: every host decodes only its 1/process_count slice of each
    # global batch (shuffle + mask draws are seeded identically across hosts,
    # so the concatenated shards equal the single-host loader bit-for-bit)
    train_loader = Places365Loader(
        Places365(args.path_to_places365, "train.txt", config),
        batch_size=args.batch_size, shuffle=True, drop_last=True,
        num_workers=args.num_workers, compact_feed=args.compact_feed,
        num_shards=jax.process_count(), shard_id=jax.process_index())
    val_loader = Places365Loader(
        Places365(args.path_to_places365, "val.txt", config,
                  max_length=args.fid_images, validation=True),
        batch_size=2 * args.batch_size, shuffle=True, drop_last=False,
        num_workers=args.num_workers, compact_feed=args.compact_feed)

    trainer = Trainer(
        config, train_loader, val_loader,
        lr=args.lr, w_rec=args.w_rec, w_div=args.w_div, seed=args.seed,
        save_data_path=args.save_data_path,
        use_pallas_attention=args.pallas and jax.default_backend() == "tpu",
        fsdp=args.fsdp,
        process_sharded_data=jax.process_count() > 1,
        remat_vgg=args.remat_vgg, fused_discriminator=args.fused_d,
        tensorboard=args.tensorboard,
        g_variables=g_variables, d_variables=d_variables,
        vgg_variables=vgg_variables,
        inception_variables=inception_variables,
        allow_random_fid=args.allow_random_fid,
        fid_device_stats=args.fid_device_stats,
        compat_inference_indices=args.compat_inference_indices)

    if g_moments is not None or d_moments is not None:
        trainer.import_adam_moments(g_moments, d_moments)
    if args.auto_resume:
        trainer.auto_resume(args.auto_resume)
    if args.load_checkpoint and not args.load_checkpoint.endswith(".pt"):
        from semantic_pyramid_for_image_generation_tpu.train.checkpoint import (
            restore_checkpoint,
        )

        trainer.state = restore_checkpoint(args.load_checkpoint, trainer.state)
        print(f"Restored orbax checkpoint {args.load_checkpoint}")

    print("Number of generator parameters",
          param_count(trainer.state.g_params))
    print("Number of discriminator parameters",
          param_count(trainer.state.d_params))
    return trainer


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    trainer = build_trainer(args)

    if args.train:
        trainer.train(epochs=args.epochs,
                      validate_after_n_iterations=args.validate_after_n_iterations,
                      save_model_after_n_epochs=args.save_model_after_n_epochs,
                      log_every=args.log_every)
    if args.test:
        print("FID=", trainer.validate())
        trainer.inference()
    return 0


if __name__ == "__main__":
    sys.exit(main())
