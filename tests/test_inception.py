"""InceptionV3 FID backbone: shapes, converter plumbing, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from semantic_pyramid_for_image_generation_tpu.models.inception import (
    InceptionV3Features,
    convert_inception_state_dict,
)


def test_feature_shapes_and_determinism(rng):
    model = InceptionV3Features()
    x = jnp.asarray(rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    a = model.apply(variables, x)
    b = model.apply(variables, x)
    assert a.shape == (2, 2048)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torchvision_state_dict_converter(rng):
    """Synthesize a torchvision-keyed state dict from our own param shapes and
    verify the converter rebuilds the exact variable tree."""
    model = InceptionV3Features()
    x = jnp.zeros((1, 299, 299, 3), jnp.float32)
    variables = jax.eval_shape(lambda: model.init(jax.random.key(0), x))

    sd = {}
    gen = np.random.default_rng(0)

    def walk(params, stats, prefix):
        for name, node in params.items():
            if name == "conv":
                o = node["kernel"].shape[3]
                i = node["kernel"].shape[2]
                kh, kw = node["kernel"].shape[0], node["kernel"].shape[1]
                sd[f"{prefix}.conv.weight"] = torch.from_numpy(
                    gen.standard_normal((o, i, kh, kw)).astype(np.float32))
                sd[f"{prefix}.bn.weight"] = torch.from_numpy(
                    gen.standard_normal(o).astype(np.float32))
                sd[f"{prefix}.bn.bias"] = torch.from_numpy(
                    gen.standard_normal(o).astype(np.float32))
                sd[f"{prefix}.bn.running_mean"] = torch.from_numpy(
                    gen.standard_normal(o).astype(np.float32))
                sd[f"{prefix}.bn.running_var"] = torch.from_numpy(
                    np.abs(gen.standard_normal(o)).astype(np.float32))
            elif isinstance(node, dict):
                walk(node, stats.get(name, {}),
                     f"{prefix}.{name}" if prefix else name)

    walk(variables["params"], variables["batch_stats"], "")
    converted = convert_inception_state_dict(sd)

    # tree structures line up with the model's own variables
    want_paths = {jax.tree_util.keystr(p)
                  for p, _ in jax.tree_util.tree_leaves_with_path(
                      variables["params"])}
    got_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(
                     converted["params"])}
    assert want_paths == got_paths
    # and weights landed transposed correctly
    k = converted["params"]["Conv2d_1a_3x3"]["conv"]["kernel"]
    np.testing.assert_allclose(
        k, sd["Conv2d_1a_3x3.conv.weight"].numpy().transpose(2, 3, 1, 0))
    # converted variables actually run
    model.apply(converted, jnp.zeros((1, 75, 75, 3)))
