"""VGG-16 Places365 fine-tuning (/root/reference/vgg_16_train.py), TPU-native.

Reference behavior: 3 epochs, batch 256, Adam lr 1e-4, CrossEntropy, top-1/5
accuracy meters, best-checkpoint save, step lr decay /10 every 30 epochs
(vgg_16_train.py:28-50, :104-106, :227-230, :252-256). Here the whole
update is one jitted step (forward + CE + Adam) on a data mesh, with the same
flags, metrics and artifact semantics (orbax `latest`/`best` checkpoints, and
`.pt` import for the caffe-converted starting point via --load_vgg16).
"""

from __future__ import annotations

import argparse
import os
import time
from functools import partial

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="VGG16 Places365 fine-tune (TPU)")
    p.add_argument("--data", type=str, default="places365_standard")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--workers", type=int, default=16)
    p.add_argument("--resume", type=str, default=None,
                   help="resume a fine-tune losslessly: an orbax checkpoint "
                        "dir (latest_N / best) or a save_dir (picks the "
                        "newest latest_N). Restores params, Adam state, the "
                        "epoch offset and best_prec1 "
                        "(/root/reference/vgg_16_train.py:64-74 restores "
                        "state_dict/start_epoch/best_prec1; optimizer-state "
                        "restore is an upgrade over the reference)")
    p.add_argument("--load_vgg16", type=str,
                   default="pre_trained_models/vgg_places_365.pt",
                   help=".pt start point (caffe2pytorchvgg16 output)")
    p.add_argument("--save_dir", type=str, default="vgg16_finetune")
    p.add_argument("--export_pt", type=str, default=None,
                   help="also write the best params as a reference-loadable "
                        ".pt state dict (vgg16.* keys; the artifact "
                        "/root/reference/main.py:61 consumes as "
                        "vgg_places_365_fine_tuned.pt)")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--evaluate_only", action="store_true")
    p.add_argument("--device", type=str, default="tpu", help="tpu | cpu")
    p.add_argument("--vgg_width_factor", type=int, default=1,
                   help="debug: divide VGG widths (CPU-scale smoke runs)")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--num_classes", type=int, default=365)
    p.add_argument("--max_steps", type=int, default=None,
                   help="debug: cap train steps per epoch")
    return p


class AverageMeter:
    """Running averages (vgg_16_train.py:233-249)."""

    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)


def epoch_lr_scale(epoch: int) -> float:
    """Step decay /10 every 30 epochs (vgg_16_train.py:252-256). Threaded
    into the jitted step as an update scale so epochs never recompile;
    scaling Adam's updates by s is exactly Adam at lr*s."""
    return 0.1 ** (epoch // 30)


def resolve_resume_path(path: str):
    """Map --resume to one orbax checkpoint dir.

    Accepts a concrete checkpoint dir (latest_N / best) or a save_dir, in
    which case the newest latest_N wins (the reference points --resume at the
    single rolling _latest.pth.tar file, vgg_16_train.py:64-74; here every
    epoch keeps its own dir). Returns None when nothing is there."""
    if not os.path.isdir(path):
        return None
    base = os.path.basename(os.path.normpath(path))
    # digit check mirrors the save_dir scan below: a save_dir merely NAMED
    # latest_run must be scanned for latest_N subdirs, not treated as a
    # checkpoint dir itself
    if base == "best" or (base.startswith("latest_")
                          and base.split("_")[-1].isdigit()):
        return os.path.abspath(path)
    latest = [e for e in os.listdir(path)
              if e.startswith("latest_") and e.split("_")[-1].isdigit()]
    if not latest:
        return None
    latest.sort(key=lambda e: int(e.split("_")[-1]))
    return os.path.abspath(os.path.join(path, latest[-1]))


def save_finetune_checkpoint(path: str, params, opt_state, epoch_next: int,
                             best_prec1: float) -> None:
    """One orbax dir holding everything a lossless restart needs: params,
    Adam moments, the NEXT epoch index (reference semantics: it saves
    'epoch': epoch + 1 and resumes at start_epoch = checkpoint['epoch'],
    vgg_16_train.py:68, :125-131) and the best validation prec@1."""
    import jax
    import orbax.checkpoint as ocp

    # one host fetch before orbax (relay gotcha — see train/checkpoint.py)
    tree = jax.device_get({
        "params": params, "opt_state": opt_state,
        "epoch": np.asarray(epoch_next, np.int32),
        "best_prec1": np.asarray(best_prec1, np.float32)})
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree, force=True)


def restore_finetune_checkpoint(path: str, params, opt_state):
    """Restore into the live structures; returns
    (params, opt_state, start_epoch, best_prec1)."""
    import jax
    import orbax.checkpoint as ocp

    target = {
        "params": params, "opt_state": opt_state,
        "epoch": np.asarray(0, np.int32),
        "best_prec1": np.asarray(0.0, np.float32)}
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.abspath(path), abstract)
    return (tree["params"], tree["opt_state"], int(tree["epoch"]),
            float(tree["best_prec1"]))


def make_finetune_step(model, tx):
    """The jitted fine-tune update: forward + CE + Adam in one program
    (the loop body of /root/reference/vgg_16_train.py:134-179). `lr_scale`
    threads the /10-every-30-epochs decay without recompiles. Shared by the
    training loop below and bench.py's --vgg-finetune lane."""
    import jax
    import jax.numpy as jnp
    import optax

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, images, labels, rng, lr_scale):
        def loss_fn(p):
            logits = model.apply({"params": p}, images, train=True,
                                 rngs={"dropout": rng})
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels)
            return jnp.mean(ce), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(params, updates)
        top1 = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return params, opt_state, loss, top1

    return train_step


def make_eval_step(model):
    """Per-sample eval metrics — the body of the reference's validate()
    (/root/reference/vgg_16_train.py:182-224: CE loss + Prec@1/Prec@5 via
    accuracy(), :259-272) as ONE jitted program. Returns per-sample values so
    padded remainder rows can be trimmed host-side. Shared by main() and the
    live-reference trajectory parity test (tests/test_finetune_parity.py)."""
    import jax
    import jax.numpy as jnp
    import optax

    @jax.jit
    def eval_step(params, images, labels):
        logits = model.apply({"params": params}, images, train=False)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels)
        top1 = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
        k = min(5, logits.shape[-1])
        top5 = jnp.any(jax.lax.top_k(logits, k)[1] == labels[:, None],
                       axis=-1).astype(jnp.float32)
        return ce, top1, top5

    return eval_step


def run_validation(eval_step, params, loader, mesh, shard_batch):
    """The reference validate() walk (/root/reference/vgg_16_train.py:182-224)
    over an ImageFolderLoader: remainder batches are padded to the mesh
    multiple and trimmed host-side. Returns (ce_loss, prec1, prec5) as
    FRACTIONS (the reference meters are percentages — multiply by 100).
    Shared by main() and scripts/artifact_selftest.py."""
    import jax
    import jax.numpy as jnp

    n_dev = mesh.devices.size
    loss_m, top1_m, top5_m = AverageMeter(), AverageMeter(), AverageMeter()
    for images, labels in loader:
        n = images.shape[0]
        pad = (-n) % n_dev
        if pad:  # remainder batch: pad to the mesh multiple, trim below
            images = np.concatenate([images, np.repeat(images[:1], pad, 0)])
            labels = np.concatenate([labels, np.repeat(labels[:1], pad)])
        batch = shard_batch(
            {"i": jnp.asarray(images), "l": jnp.asarray(labels)}, mesh)
        ce, t1, t5 = jax.device_get(eval_step(params, batch["i"], batch["l"]))
        loss_m.update(float(ce[:n].mean()), n)
        top1_m.update(float(t1[:n].mean()), n)
        top5_m.update(float(t5[:n].mean()), n)
    print(f" * Prec@1 {top1_m.avg * 100:.3f} Prec@5 {top5_m.avg * 100:.3f}")
    return loss_m.avg, top1_m.avg, top5_m.avg


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
    from semantic_pyramid_for_image_generation_tpu.data.image_folder import (
        ImageFolder,
        ImageFolderLoader,
    )
    from semantic_pyramid_for_image_generation_tpu.models import VGG16
    from semantic_pyramid_for_image_generation_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
        shard_state,
    )

    config = PyramidGANConfig(
        compute_dtype=args.dtype, vgg_width_factor=args.vgg_width_factor,
        image_size=args.image_size, num_classes=args.num_classes)
    model = VGG16(config, return_output=True)

    if args.load_vgg16 and os.path.exists(args.load_vgg16):
        from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
            convert_vgg16_state_dict,
            load_torch_file,
        )

        variables = convert_vgg16_state_dict(load_torch_file(args.load_vgg16))
        print(f"Loaded {args.load_vgg16}")
    else:
        variables = model.init(
            jax.random.key(0),
            jnp.zeros((1, config.image_size, config.image_size, 3)))
        print("Cold start: random VGG16 init")
    params = variables["params"]

    # step lr decay /10 every 30 epochs (vgg_16_train.py:252-256); epoch is
    # threaded as a scale (epoch_lr_scale) so the jitted step never recompiles
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    start_epoch, best_prec1 = 0, 0.0
    if args.resume:
        resume_path = resolve_resume_path(args.resume)
        if resume_path is None:
            print(f"=> no checkpoint found at '{args.resume}'")
        else:
            print(f"=> loading checkpoint '{resume_path}'")
            params, opt_state, start_epoch, best_prec1 = (
                restore_finetune_checkpoint(resume_path, params, opt_state))
            print(f"=> loaded checkpoint '{resume_path}' "
                  f"(epoch {start_epoch}, best_prec1 {best_prec1:.3f})")

    train_step = make_finetune_step(model, tx)
    eval_step = make_eval_step(model)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    if args.batch_size % n_dev != 0:
        args.batch_size = max(n_dev, (args.batch_size // n_dev) * n_dev)
        print(f"batch_size rounded to {args.batch_size} for the {n_dev}-device mesh")
    params = shard_state(params, mesh)
    opt_state = shard_state(opt_state, mesh)

    train_ds = ImageFolder(os.path.join(args.data, "train"),
                           config.image_size)
    val_ds = ImageFolder(os.path.join(args.data, "val"), config.image_size)
    train_loader = ImageFolderLoader(train_ds, args.batch_size,
                                     num_workers=args.workers)
    # a resumed run must see epoch N's shuffle order, not epoch 0's — the
    # loader derives its order from (seed, epoch), so aligning the counter
    # makes restart-at-epoch-N replay the uninterrupted run exactly
    train_loader.epoch = start_epoch
    val_loader = ImageFolderLoader(val_ds, args.batch_size, shuffle=False,
                                   random_flip=False, drop_last=False,
                                   num_workers=args.workers)

    def validate():
        return run_validation(eval_step, params, val_loader, mesh,
                              shard_batch)[1]

    rng = jax.random.key(1)
    if args.evaluate_only:
        validate()
        return 0
    os.makedirs(args.save_dir, exist_ok=True)

    for epoch in range(start_epoch, args.epochs):
        loss_m, top1_m = AverageMeter(), AverageMeter()
        t0 = time.time()
        # dropout keys derive from (base key, epoch) so a resumed epoch
        # draws the same masks the uninterrupted run would have
        epoch_rng = jax.random.fold_in(rng, epoch)
        for it, (images, labels) in enumerate(train_loader):
            if args.max_steps is not None and it >= args.max_steps:
                break
            epoch_rng, step_rng = jax.random.split(epoch_rng)
            batch = shard_batch(
                {"i": jnp.asarray(images), "l": jnp.asarray(labels)}, mesh)
            params, opt_state, loss, top1 = train_step(
                params, opt_state, batch["i"], batch["l"], step_rng,
                jnp.float32(epoch_lr_scale(epoch)))
            loss_m.update(loss, images.shape[0])
            top1_m.update(top1, images.shape[0])
            if it % 50 == 0:
                rate = (it + 1) * args.batch_size / (time.time() - t0)
                print(f"epoch {epoch} it {it} loss {loss_m.avg:.4f} "
                      f"top1 {top1_m.avg * 100:.2f} ({rate:.1f} img/s)")
        prec1 = validate()
        is_best = prec1 > best_prec1
        best_prec1 = max(prec1, best_prec1)
        save_finetune_checkpoint(
            os.path.join(args.save_dir, f"latest_{epoch}"),
            params, opt_state, epoch + 1, best_prec1)
        if is_best:
            save_finetune_checkpoint(
                os.path.join(args.save_dir, "best"),
                params, opt_state, epoch + 1, best_prec1)
            if args.export_pt:
                import torch

                from semantic_pyramid_for_image_generation_tpu.utils \
                    .pt_interop import export_vgg16_state_dict

                if args.vgg_width_factor != 1:
                    raise SystemExit(
                        "--export_pt needs full-width VGG16 "
                        "(--vgg_width_factor 1): the reference loads "
                        "torchvision shapes")
                torch.save(export_vgg16_state_dict({"params": params}),
                           args.export_pt)
                print(f"exported reference-loadable {args.export_pt}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
