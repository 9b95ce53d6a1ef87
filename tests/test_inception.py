"""InceptionV3 FID backbone: elementwise parity vs an executing torch mirror
of torchvision's Inception3, converter plumbing, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from semantic_pyramid_for_image_generation_tpu.models.inception import (
    InceptionV3Features,
    convert_inception_state_dict,
)
from torch_inception import randomized_mirror


class TestInceptionParity:
    """models/inception.py vs the genuine torchvision Inception3 semantics
    (tests/torch_inception.py executes the architecture with torchvision
    module names, so state_dict() keys ARE torchvision keys). Ref:
    /root/reference/frechet_inception_distance.py:12-42."""

    def test_fid_features_parity_299(self):
        mirror = randomized_mirror(seed=0)
        variables = convert_inception_state_dict(mirror.state_dict())
        ours = InceptionV3Features()

        rng = np.random.default_rng(5)
        images = (rng.random((2, 3, 299, 299)).astype(np.float32) * 2.0) - 1.0
        with torch.no_grad():
            want = mirror(torch.from_numpy(images)).numpy()
        got = np.asarray(ours.apply(
            variables, jnp.asarray(images.transpose(0, 2, 3, 1))))
        assert got.shape == (2, 2048)
        scale = np.abs(want).mean()
        np.testing.assert_allclose(got, want, atol=3e-4 * max(scale, 1.0),
                                   rtol=2e-4)

    def test_fid_features_parity_odd_size(self):
        """75x75 (min inception size) exercises every VALID pool/stride edge
        case differently from 299."""
        mirror = randomized_mirror(seed=1)
        variables = convert_inception_state_dict(mirror.state_dict())
        ours = InceptionV3Features()

        rng = np.random.default_rng(6)
        images = rng.standard_normal((1, 3, 75, 75)).astype(np.float32)
        with torch.no_grad():
            want = mirror(torch.from_numpy(images)).numpy()
        got = np.asarray(ours.apply(
            variables, jnp.asarray(images.transpose(0, 2, 3, 1))))
        scale = np.abs(want).mean()
        np.testing.assert_allclose(got, want, atol=3e-4 * max(scale, 1.0),
                                   rtol=2e-4)


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
