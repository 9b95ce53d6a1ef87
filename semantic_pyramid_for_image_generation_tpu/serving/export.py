"""AOT serving export: the generation path as a hermetic StableHLO artifact.

The reference deploys by shipping its Python model code plus a
`checkpoint_XXX.pt` and re-instantiating torch modules at load time
(/root/reference/model_wrapper.py:215-223, /root/reference/main.py:60-74) —
every serving host needs the full source tree and an eval()-able pickle.
A TPU serving fleet wants the opposite: one version-checked artifact that any
host with jax can load and run WITHOUT this package on the import path.

`jax.export` gives exactly that. We lower the jitted generate function
(per-image min-max normalize -> frozen-VGG 7-tap pyramid -> mask gating ->
eval-mode Generator with the batched spectral-sigma pass,
train/step.py::make_generate_fn semantics) to StableHLO with all weights
captured as constants, and serialize it together with its calling
convention. Callers pass latent noise explicitly, so serving is fully
deterministic and the artifact contains no PRNG state.

Artifact layout (a directory):

    manifest.json           config echo, batch buckets, shapes/dtypes,
                            jax version, target platforms
    generate_b{N}.jaxexp    serialized `jax.export.Exported`, one per bucket

TPU serving wants static shapes, so we export one program per requested
batch size ("bucketing", the standard serving practice) and
`ServingArtifact.generate` routes a live call to the smallest bucket that
fits, zero-padding the batch and slicing the output (safe: every per-sample
path — min-max, VGG, attention, eval-mode BN — is batch-independent).

Weights ship in one of two modes (`weights=` on export/save):

  * "baked"    — captured as StableHLO constants; one self-contained file
                 per bucket. Right for small/width-reduced models.
  * "external" — the program takes the weight pytree as its first argument
                 and `save_artifact` writes the leaves to `weights.npz`
                 keyed by pytree path. The program stays KB-sized no matter
                 the model (the full-width model is ~0.7 GB of fp32 weights
                 — baking that made the module exceed compiler request
                 limits on relay-attached dev hosts and bloats compile time
                 everywhere), weights upload to device once at load, and
                 buckets share them. The production default.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.export
import jax.numpy as jnp
import numpy as np

from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig

_MANIFEST = "manifest.json"
_FORMAT_VERSION = 1


def _generate_spec(config: PyramidGANConfig, batch_size: int):
    """ShapeDtypeStructs of the exported calling convention:
    (images, masks 7-tuple, labels, noise) — all float32, shallow->deep mask
    order exactly as the data pipeline emits them (data/masks.py)."""
    s = config.image_size
    images = jax.ShapeDtypeStruct(
        (batch_size, s, s, config.out_channels), jnp.float32)
    masks = tuple(
        jax.ShapeDtypeStruct((batch_size,) + tuple(shape), jnp.float32)
        for shape in config.mask_shapes)
    labels = jax.ShapeDtypeStruct((batch_size, config.num_classes),
                                  jnp.float32)
    noise = jax.ShapeDtypeStruct((batch_size, config.latent_dim),
                                 jnp.float32)
    return images, masks, labels, noise


def serving_weights(state) -> Dict:
    """The serving-time weight pytree: generator variable collections with
    the eval-mode spectral sigmas folded in (deterministic function of the
    captured u/v state, matching make_generate_fn's update=False pass) plus
    the frozen VGG params. This is everything generation needs — no
    optimizer or discriminator state."""
    from semantic_pyramid_for_image_generation_tpu.ops.spectral_norm import (
        compute_sigma_tree,
    )

    sigmas, _ = compute_sigma_tree(state.g_params, state.g_spectral,
                                   update=False)
    return {
        "g": {"params": state.g_params, "spectral": state.g_spectral,
              "batch_stats": state.g_batch_stats, "sigmas": sigmas},
        "vgg": state.vgg_params,
    }


def export_generate(state, config: PyramidGANConfig, batch_size: int,
                    *, platforms: Optional[Sequence[str]] = None,
                    use_pallas_attention: bool = False,
                    weights: str = "baked") -> "jax.export.Exported":
    """Lower + serialize-ready export of the generate path at one batch size.

    weights="baked" captures `serving_weights(state)` as constants, so the
    exported program is self-contained: generate(images, masks, labels,
    noise). weights="external" makes the pytree the program's first argument:
    generate(weights, images, masks, labels, noise) — the module stays tiny
    and the caller supplies the weights (see `save_artifact`/
    `ServingArtifact`, which handle that plumbing). `platforms` defaults to
    the current jax backend; pass e.g. ("tpu", "cpu") for a multi-platform
    artifact.
    """
    from semantic_pyramid_for_image_generation_tpu.train.state import (
        make_models,
    )
    from semantic_pyramid_for_image_generation_tpu.train.step import (
        ensure_m11_images,
    )

    if weights not in ("baked", "external"):
        raise ValueError(f"weights must be 'baked' or 'external': {weights}")
    generator, _, vgg = make_models(config, use_pallas_attention)
    weight_tree = serving_weights(state)

    def run(w, images, masks, labels, noise):
        images = ensure_m11_images(images)
        features = vgg.apply({"params": w["vgg"]}, images)
        return generator.apply(
            w["g"], noise, features,
            [m.astype(jnp.float32) for m in masks],
            labels.astype(jnp.float32), train=False)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    specs = _generate_spec(config, batch_size)
    if weights == "baked":
        fn = lambda images, masks, labels, noise: run(  # noqa: E731
            weight_tree, images, masks, labels, noise)
        return jax.export.export(jax.jit(fn), **kwargs)(*specs)
    weight_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        weight_tree)
    return jax.export.export(jax.jit(run), **kwargs)(weight_specs, *specs)


def export_classify(state, config: PyramidGANConfig, batch_size: int,
                    *, platforms: Optional[Sequence[str]] = None,
                    weights: str = "baked") -> "jax.export.Exported":
    """Companion classifier export: images -> VGG fc8 Places365 logits.

    Serving uses it to auto-derive the class conditioning from the input
    image when the caller omits class_id — the same UX cli/generate.py
    offers live (the fc8 logits are already the pyramid's deepest tap,
    reference models.py:209-216). In external mode the program takes only
    the `vgg` subtree of the shared weights.npz.
    """
    from semantic_pyramid_for_image_generation_tpu.train.state import (
        make_models,
    )
    from semantic_pyramid_for_image_generation_tpu.train.step import (
        ensure_m11_images,
    )

    if weights not in ("baked", "external"):
        raise ValueError(f"weights must be 'baked' or 'external': {weights}")
    _, _, vgg = make_models(config)
    vgg_params = state.vgg_params

    def run(w, images):
        return vgg.apply({"params": w}, ensure_m11_images(images))[-1]

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    s = config.image_size
    img_spec = jax.ShapeDtypeStruct(
        (batch_size, s, s, config.out_channels), jnp.float32)
    if weights == "baked":
        fn = lambda images: run(vgg_params, images)  # noqa: E731
        return jax.export.export(jax.jit(fn), **kwargs)(img_spec)
    weight_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        vgg_params)
    return jax.export.export(jax.jit(run), **kwargs)(weight_specs, img_spec)


def _flatten_with_paths(tree) -> Dict[str, np.ndarray]:
    """Nested-dict pytree -> {'a/b/c': leaf} (all our weight trees are
    string-keyed nested dicts, so '/'-joined paths are lossless)."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                assert "/" not in str(k), f"path separator in key {k!r}"
                walk(f"{prefix}/{k}" if prefix else str(k), v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", tree)
    return flat


def _unflatten_paths(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for path, leaf in flat.items():
        node = tree
        *parents, last = path.split("/")
        for k in parents:
            node = node.setdefault(k, {})
        node[last] = leaf
    return tree


def save_artifact(state, config: PyramidGANConfig, out_dir: str,
                  batch_sizes: Sequence[int] = (1,),
                  *, platforms: Optional[Sequence[str]] = None,
                  use_pallas_attention: bool = False,
                  weights: str = "external",
                  classifier: bool = True) -> Dict:
    """Export one program per batch bucket and write the artifact directory.

    weights="external" (default) writes the weight leaves once to
    `weights.npz` and exports KB-sized programs that take them as an
    argument; "baked" produces self-contained per-bucket programs.
    classifier=True also exports a batch-1 `classify_b1.jaxexp` (images ->
    fc8 logits) so serving can auto-derive class conditioning.
    Returns the manifest dict (also written to `<out_dir>/manifest.json`).
    """
    buckets = sorted(set(int(b) for b in batch_sizes))
    if not buckets or buckets[0] < 1:
        raise ValueError(f"batch_sizes must be positive, got {batch_sizes}")
    os.makedirs(out_dir, exist_ok=True)

    if weights == "external":
        np.savez(os.path.join(out_dir, "weights.npz"),
                 **_flatten_with_paths(jax.device_get(
                     serving_weights(state))))

    exported_platforms = None
    for b in buckets:
        exported = export_generate(
            state, config, b, platforms=platforms,
            use_pallas_attention=use_pallas_attention, weights=weights)
        exported_platforms = list(exported.platforms)
        with open(os.path.join(out_dir, f"generate_b{b}.jaxexp"), "wb") as f:
            f.write(exported.serialize())
    if classifier:
        exported = export_classify(state, config, 1, platforms=platforms,
                                   weights=weights)
        with open(os.path.join(out_dir, "classify_b1.jaxexp"), "wb") as f:
            f.write(exported.serialize())

    cfg = dataclasses.asdict(config)
    manifest = {
        "format_version": _FORMAT_VERSION,
        "entry": ("generate(images, masks[7], labels, noise) -> fakes"
                  if weights == "baked" else
                  "generate(weights, images, masks[7], labels, noise) "
                  "-> fakes"),
        "weights": weights,
        "classifier": classifier,
        "batch_buckets": buckets,
        "platforms": exported_platforms,
        "jax_version": jax.__version__,
        "config": cfg,
        "shapes": {
            "images": [None, config.image_size, config.image_size,
                       config.out_channels],
            "masks": [[None] + list(s) for s in config.mask_shapes],
            "labels": [None, config.num_classes],
            "noise": [None, config.latent_dim],
        },
        "notes": (
            "masks are the shallow->deep 7-tuple the data pipeline emits "
            "(data/masks.py); noise is caller-provided N(0,1) so serving is "
            "deterministic; images may be float in [-1,1] (passed through) "
            "or any float range (per-image min-max normalized on device)."
        ),
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ServingArtifact:
    """Loaded artifact: routes `generate` calls to the right batch bucket.

    Deserialization uses only `jax.export` — no model code from this package
    runs at load time (the class itself lives here for convenience; the
    manifest documents the layout so third-party loaders can reimplement it
    in a few lines).
    """

    def __init__(self, path: str):
        with open(os.path.join(path, _MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest["format_version"] != _FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.manifest['format_version']} != "
                f"supported {_FORMAT_VERSION}")
        self.buckets: Dict[int, jax.export.Exported] = {}
        for b in self.manifest["batch_buckets"]:
            with open(os.path.join(path, f"generate_b{b}.jaxexp"), "rb") as f:
                self.buckets[b] = jax.export.deserialize(bytearray(f.read()))
        self.weights = None
        if self.manifest.get("weights", "baked") == "external":
            with np.load(os.path.join(path, "weights.npz")) as z:
                # device_put once at load; every bucket call reuses them
                self.weights = jax.device_put(
                    _unflatten_paths({k: z[k] for k in z.files}))
        self.classifier = None
        if self.manifest.get("classifier"):
            with open(os.path.join(path, "classify_b1.jaxexp"), "rb") as f:
                self.classifier = jax.export.deserialize(
                    bytearray(f.read()))

    def bucket_for(self, batch: int) -> int:
        fitting = [b for b in self.buckets if b >= batch]
        if not fitting:
            raise ValueError(
                f"batch {batch} exceeds largest exported bucket "
                f"{max(self.buckets)}; re-export with a bigger bucket")
        return min(fitting)

    def generate(self, images, masks, labels, noise) -> jax.Array:
        """Run the exported program; zero-pads into the chosen bucket and
        slices the padding back off (all per-sample compute)."""
        batch = int(np.shape(images)[0])
        bucket = self.bucket_for(batch)

        def pad(x):
            x = jnp.asarray(x, jnp.float32)
            if bucket == batch:
                return x
            widths = [(0, bucket - batch)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths)

        call_args = (pad(images), tuple(pad(m) for m in masks), pad(labels),
                     pad(noise))
        if self.weights is not None:
            call_args = (self.weights,) + call_args
        out = self.buckets[bucket].call(*call_args)
        return out[:batch]

    def classify(self, image) -> int:
        """fc8 argmax class of ONE conditioning image (classifier program;
        raises if the artifact was exported with classifier=False)."""
        if self.classifier is None:
            raise ValueError("artifact exported without a classifier "
                             "program; pass class_id explicitly")
        image = jnp.asarray(image, jnp.float32)[None]
        if self.weights is not None:
            logits = self.classifier.call(self.weights["vgg"], image)
        else:
            logits = self.classifier.call(image)
        return int(np.asarray(logits)[0].argmax())


def load_artifact(path: str) -> ServingArtifact:
    return ServingArtifact(path)
