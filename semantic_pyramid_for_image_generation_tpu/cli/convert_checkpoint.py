"""Checkpoint conversion tool — the caffe2pytorchvgg16.py analogue
(/root/reference/caffe2pytorchvgg16.py) plus round-trip GAN conversion.

Modes:
  pt-to-orbax   reference checkpoint_XXX.pt (G/D) -> orbax TrainState dir
  orbax-to-pt   orbax TrainState dir -> reference-format checkpoint .pt
                (pass --lr: torch adopts the exported param_groups' lr)
  vgg-pt        VGG .pt (state dict OR whole-model pickle) -> orbax params
  vgg-to-pt     orbax VGG params (cli/vgg16_finetune.py output) ->
                reference-loadable .pt state dict (main.py:61 consumes it)
  inception-pt  torchvision inception_v3 .pth state dict -> orbax FID params
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["pt-to-orbax", "orbax-to-pt", "vgg-pt",
                                    "vgg-to-pt", "inception-pt"])
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--channel_factor", type=float, default=1.0)
    p.add_argument("--lr", type=float, default=1e-5,
                   help="orbax-to-pt: learning rate written into the exported "
                        "torch Adam param_groups — torch's load_state_dict "
                        "adopts the saved groups, so a reference resume "
                        "trains at THIS lr; match the run's --lr")
    args = p.parse_args(argv)

    import jax
    import orbax.checkpoint as ocp

    from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
    from semantic_pyramid_for_image_generation_tpu.train.state import (
        init_train_state,
        make_optimizers,
    )

    config = PyramidGANConfig(channels_factor=args.channel_factor)

    if args.mode == "pt-to-orbax":
        from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
            load_reference_gan_checkpoint,
        )

        g_vars, d_vars = load_reference_gan_checkpoint(args.src)
        g_tx, d_tx = make_optimizers()
        state = init_train_state(jax.random.key(0), config, g_tx, d_tx,
                                 g_variables=g_vars, d_variables=d_vars)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(args.dst), state)
        print(f"wrote orbax checkpoint {args.dst}")
    elif args.mode == "orbax-to-pt":
        from semantic_pyramid_for_image_generation_tpu.train.checkpoint import (
            restore_checkpoint,
        )
        from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
            save_reference_gan_checkpoint,
        )

        g_tx, d_tx = make_optimizers()
        template = init_train_state(jax.random.key(0), config, g_tx, d_tx)
        state = restore_checkpoint(args.src, template)
        save_reference_gan_checkpoint(
            args.dst,
            {"params": state.g_params, "spectral": state.g_spectral,
             "batch_stats": state.g_batch_stats},
            {"params": state.d_params, "spectral": state.d_spectral,
             "batch_stats": {}},
            g_opt_state=state.g_opt_state, d_opt_state=state.d_opt_state,
            lr=args.lr)
        print(f"wrote reference-format checkpoint {args.dst} "
              f"(with Adam moments, param_groups lr={args.lr})")
    elif args.mode == "inception-pt":
        from semantic_pyramid_for_image_generation_tpu.models.inception import (
            convert_inception_state_dict,
        )
        from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
            load_torch_file,
        )

        variables = convert_inception_state_dict(load_torch_file(args.src))
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(args.dst), variables)
        print(f"wrote orbax Inception FID-backbone params {args.dst}")
    elif args.mode == "vgg-to-pt":
        import torch

        from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
            export_vgg16_state_dict,
        )

        with ocp.StandardCheckpointer() as ckptr:
            variables = ckptr.restore(os.path.abspath(args.src))
        torch.save(export_vgg16_state_dict(variables), args.dst)
        print(f"wrote reference-loadable VGG16 state dict {args.dst} "
              "(main.py:61 / VGG16().load_state_dict)")
    else:  # vgg-pt
        from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
            convert_vgg16_state_dict,
            load_torch_file,
        )

        variables = convert_vgg16_state_dict(load_torch_file(args.src))
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(args.dst), variables)
        print(f"wrote orbax VGG params {args.dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
