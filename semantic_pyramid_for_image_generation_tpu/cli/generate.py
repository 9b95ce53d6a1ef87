"""Serving CLI: semantic-pyramid image generation from reference images.

The paper's core capability — re-generate an input image with conditioning
pinned at a chosen semantic level (deep = semantics only, shallow = near
copy) — exposed as a standalone batch tool. The reference only offers this
inside ModelWrapper.inference (/root/reference/model_wrapper.py:247-296).

For each input image and each requested level, draws `--num_samples` latents
and writes PNGs (plus an optional combined grid). The class conditioning
defaults to the VGG's own fc8 prediction of the input image (the logits are
already part of the pyramid), overridable with --class_id.
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", type=str, required=True,
                   help="input image file or directory")
    p.add_argument("--out", type=str, default="generated")
    p.add_argument("--levels", type=str, default="all",
                   help="comma-separated deep->shallow stage indices 0..6, "
                        "or 'all' (0 = fc8 semantics only, 6 = pool1 near-copy)")
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--class_id", type=int, default=None,
                   help="condition class (default: VGG fc8 argmax per image)")
    p.add_argument("--load_checkpoint", type=str, default=None,
                   help="orbax TrainState dir or reference .pt checkpoint")
    p.add_argument("--load_pretrained_vgg16", type=str,
                   default="pre_trained_models/vgg_places_365_fine_tuned.pt")
    p.add_argument("--grid", default=False, action="store_true",
                   help="also write one image x level sweep grid per input")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device", type=str, default="tpu")
    p.add_argument("--channel_factor", type=float, default=1.0)
    p.add_argument("--vgg_width_factor", type=int, default=1)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    return p


def _load_image(path: str, size: int):
    import numpy as np
    from PIL import Image

    with Image.open(path) as img:
        img = img.convert("RGB")
        if img.size != (size, size):
            img = img.resize((size, size), Image.BILINEAR)
        arr = np.asarray(img, dtype=np.float32) / 255.0
    mn, mx = arr.min(), arr.max()
    return 2.0 * (arr - mn) / max(mx - mn, 1e-12) - 1.0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
    from semantic_pyramid_for_image_generation_tpu.data.masks import MaskSchedule
    from semantic_pyramid_for_image_generation_tpu.eval.grid import (
        normalize_0_1_np,
        save_inference_grid,
    )
    from semantic_pyramid_for_image_generation_tpu.train.state import (
        init_train_state,
        make_models,
        make_optimizers,
    )
    from semantic_pyramid_for_image_generation_tpu.train.step import (
        make_generate_fn,
    )

    config = PyramidGANConfig(
        channels_factor=args.channel_factor, compute_dtype=args.dtype,
        vgg_width_factor=args.vgg_width_factor)

    # ---- weights -----------------------------------------------------------
    g_variables = d_variables = vgg_variables = None
    if args.load_pretrained_vgg16 and os.path.exists(args.load_pretrained_vgg16):
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
    generator, _, vgg = make_models(config)
    generate_fn = make_generate_fn(generator, vgg)
    vgg_logits = jax.jit(
        lambda params, x: vgg.apply({"params": params}, x)[-1])

    # ---- inputs --------------------------------------------------------------
    if os.path.isdir(args.images):
        paths = sorted(
            os.path.join(args.images, f) for f in os.listdir(args.images)
            if os.path.splitext(f)[1].lower() in
            {".jpg", ".jpeg", ".png", ".bmp", ".webp"})
    else:
        paths = [args.images]
    assert paths, f"no images under {args.images}"
    levels = (list(range(7)) if args.levels == "all"
              else [int(x) for x in args.levels.split(",")])

    schedule = MaskSchedule(config)
    os.makedirs(args.out, exist_ok=True)
    rng = jax.random.key(args.seed + 1)
    from PIL import Image

    for path in paths:
        name = os.path.splitext(os.path.basename(path))[0]
        image = _load_image(path, config.image_size)
        batch_img = jnp.asarray(image[None])
        if args.class_id is None:
            logits = np.asarray(vgg_logits(state.vgg_params, batch_img))
            class_id = int(logits[0].argmax())
        else:
            class_id = args.class_id
        onehot = np.zeros((1, config.num_classes), np.float32)
        onehot[0, class_id] = 1.0
        cells = []
        for level in levels:
            masks = tuple(m[None] for m in schedule.inference_masks(level))
            for s in range(args.num_samples):
                rng, step_rng = jax.random.split(rng)
                fake = np.asarray(generate_fn(
                    state, batch_img, jax.tree.map(jnp.asarray, masks),
                    jnp.asarray(onehot), step_rng))[0]
                cells.append(fake)
                out_img = (normalize_0_1_np(fake[None])[0] * 255.0
                           + 0.5).astype(np.uint8)
                out_path = os.path.join(
                    args.out, f"{name}_level{level}_s{s}.png")
                Image.fromarray(out_img).save(out_path)
                print(f"{out_path} (class {class_id})")
        if args.grid:
            grid_path = os.path.join(args.out, f"{name}_sweep.png")
            save_inference_grid(np.stack(cells), grid_path,
                                nrow=args.num_samples * len(levels))
            print(grid_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
