"""VGG-16 smoke test (/root/reference/vgg_16_inference.py): run one batch
through the fine-tuned classifier and print argmax / top-10 vs labels.

Quirk preserved: like the reference (:20-22), inputs are ImageNet-normalized
by the pipeline AND again inside VGG16.forward."""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, default="places365_standard")
    parser.add_argument("--load_vgg16", type=str,
                        default="pre_trained_models/vgg_places_365_fine_tuned.pt")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--device", type=str, default="tpu")
    parser.add_argument("--vgg_width_factor", type=int, default=1)
    parser.add_argument("--image_size", type=int, default=256)
    args = parser.parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
    from semantic_pyramid_for_image_generation_tpu.data.image_folder import (
        ImageFolder,
        ImageFolderLoader,
    )
    from semantic_pyramid_for_image_generation_tpu.models import VGG16

    config = PyramidGANConfig(vgg_width_factor=args.vgg_width_factor,
                              image_size=args.image_size)
    model = VGG16(config, return_output=True)
    if os.path.exists(args.load_vgg16):
        from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
            convert_vgg16_state_dict,
            load_torch_file,
        )

        variables = convert_vgg16_state_dict(load_torch_file(args.load_vgg16))
    else:
        print(f"{args.load_vgg16} not found; using random init")
        variables = model.init(jax.random.key(0), jnp.zeros((1, config.image_size, config.image_size, 3)))

    ds = ImageFolder(os.path.join(args.data, "train"), config.image_size)
    loader = ImageFolderLoader(ds, args.batch_size, num_workers=4)
    images, labels = next(iter(loader))
    logits = model.apply({"params": variables["params"]},
                         jnp.asarray(images), train=False)
    logits = jax.device_get(logits)
    print("predictions (argmax):", logits.argmax(-1))
    top10 = (-logits).argsort(axis=-1)[:, :10]
    print("predictions (top-10):", top10)
    print("labels:", labels)
    return 0


if __name__ == "__main__":
    sys.exit(main())
