"""Round-trip `.pt` interop: our variables -> reference state dict -> back."""

import jax
import numpy as np
import pytest

from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
from semantic_pyramid_for_image_generation_tpu.train.state import (
    init_train_state,
    make_optimizers,
)
from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
    convert_discriminator_state_dict,
    convert_generator_state_dict,
    export_discriminator_state_dict,
    export_generator_state_dict,
)

CFG = PyramidGANConfig(channels_factor=8.0)


@pytest.fixture(scope="module")
def state():
    g_tx, d_tx = make_optimizers()
    return init_train_state(jax.random.key(3), CFG, g_tx, d_tx)


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    lb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(la) == len(lb)
    for path, leaf in la:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(lb[key]),
                                   atol=1e-6, err_msg=key)


def test_generator_roundtrip(state):
    variables = {"params": state.g_params, "spectral": state.g_spectral,
                 "batch_stats": state.g_batch_stats}
    sd = export_generator_state_dict(variables)
    back = convert_generator_state_dict(sd)
    _trees_equal(variables["params"], back["params"])
    _trees_equal(variables["spectral"], back["spectral"])
    _trees_equal(variables["batch_stats"], back["batch_stats"])
    # exported keys look like genuine reference keys
    assert "main_path.3.query_convolution.weight_orig" in sd
    assert "final_block.1.running_mean" in sd


def test_discriminator_roundtrip(state):
    variables = {"params": state.d_params, "spectral": state.d_spectral}
    sd = export_discriminator_state_dict(variables)
    back = convert_discriminator_state_dict(sd)
    _trees_equal(variables["params"], back["params"])
    _trees_equal(variables["spectral"], back["spectral"])
    assert "embedding.weight_orig" in sd
    assert "layers.0.main_block.0.weight_orig" in sd


@pytest.mark.slow
def test_adam_moment_import_matches_torch_update():
    """Resume-from-reference continues with identical updates
    (/root/reference/main.py:68-73): populate torch Adam on the live reference
    Discriminator, import weights + moments, then apply torch's own step-3
    gradients through optax — parameter-for-parameter equality with torch's
    step-3 result."""
    import copy

    import optax
    import torch

    from semantic_pyramid_for_image_generation_tpu.train.state import (
        inject_adam_moments,
    )
    from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
        convert_adam_moments,
    )
    from torch_ref import import_reference

    ref_models = import_reference("models")
    torch.manual_seed(0)
    d_ref = ref_models.Discriminator(channel_factor=8)
    d_ref.train()
    lr = 1e-3
    opt = torch.optim.Adam(d_ref.parameters(), lr=lr)
    x = torch.randn(2, 3, 256, 256)
    y = torch.eye(365)[torch.tensor([3, 42])]
    for _ in range(2):  # populate exp_avg / exp_avg_sq / step
        opt.zero_grad()
        d_ref(x, y).mean().backward()
        opt.step()
    d_ref.eval()  # freeze spectral u/v so both sides see the same weights
    sd2 = copy.deepcopy(d_ref.state_dict())
    opt_sd = copy.deepcopy(opt.state_dict())

    # torch step 3
    opt.zero_grad()
    d_ref(x, y).mean().backward()
    grads = {name: p.grad.detach().clone()
             for name, p in d_ref.named_parameters()}
    opt.step()
    sd3 = d_ref.state_dict()

    # optax step 3 from the imported moments, using torch's own gradients
    # (converted through the same layout converter as the weights)
    params2 = convert_discriminator_state_dict(sd2)["params"]
    moments = convert_adam_moments(opt_sd, sd2,
                                   convert_discriminator_state_dict)
    assert moments is not None and moments["count"] == 2
    grads_sd = dict(sd2)
    grads_sd.update(grads)
    grad_tree = convert_discriminator_state_dict(grads_sd)["params"]

    tx = optax.adam(lr)
    opt_state = inject_adam_moments(tx.init(params2), moments)
    updates, _ = tx.update(jax.tree.map(np.asarray, grad_tree), opt_state,
                           params2)
    new_params = optax.apply_updates(
        jax.tree.map(np.asarray, params2), updates)
    _trees_equal(new_params, convert_discriminator_state_dict(sd3)["params"])


def test_caffe_vgg16_keys_convert_like_torchvision():
    """The caffemodel2pytorch h5 dump uses caffe layer names; the converter
    must remap them onto torchvision indices the way the reference's
    caffe2pytorchvgg16.py named-Sequential load does."""
    import torch

    from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
        _CAFFE_VGG16_LAYERS,
        convert_vgg16_state_dict,
    )

    torch.manual_seed(0)
    conv_plan = {  # torchvision vgg16 conv indices -> (out, in)
        0: (64, 3), 2: (64, 64), 5: (128, 64), 7: (128, 128),
        10: (256, 128), 12: (256, 256), 14: (256, 256),
        17: (512, 256), 19: (512, 512), 21: (512, 512),
        24: (512, 512), 26: (512, 512), 28: (512, 512),
    }
    fc_plan = {0: (4096, 25088), 3: (4096, 4096), 6: (365, 4096)}
    tv_sd = {}
    for i, (o, c) in conv_plan.items():
        tv_sd[f"features.{i}.weight"] = torch.randn(o, c, 3, 3)
        tv_sd[f"features.{i}.bias"] = torch.randn(o)
    for i, (o, c) in fc_plan.items():
        tv_sd[f"classifier.{i}.weight"] = torch.randn(o, c)
        tv_sd[f"classifier.{i}.bias"] = torch.randn(o)
    caffe_sd = {}
    inverse = {v: k for k, v in _CAFFE_VGG16_LAYERS.items()}
    for key, value in tv_sd.items():
        module, _, tail = key.rpartition(".")
        caffe_sd[f"{inverse[module]}.{tail}"] = value
    _trees_equal(convert_vgg16_state_dict(caffe_sd)["params"],
                 convert_vgg16_state_dict(tv_sd)["params"])


def test_adam_moment_export_roundtrip(state):
    """Export optax Adam moments to a torch optimizer state dict and import
    them back: mu/nu/count must survive exactly, and a genuine torch Adam on
    the live reference Discriminator must accept the exported dict."""
    import jax.numpy as jnp
    import optax
    import torch

    from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
        convert_adam_moments,
        export_adam_state_dict,
    )
    from torch_ref import import_reference

    variables = {"params": state.d_params, "spectral": state.d_spectral}
    # synthetic non-trivial moments shaped like the params
    mu = jax.tree.map(lambda x: 0.01 * jnp.asarray(x), state.d_params)
    nu = jax.tree.map(lambda x: jnp.square(jnp.asarray(x)), state.d_params)
    sd_model = export_discriminator_state_dict(variables)
    opt_sd = export_adam_state_dict(
        {"params": mu, "spectral": state.d_spectral},
        {"params": nu, "spectral": state.d_spectral},
        count=7, export_fn=export_discriminator_state_dict)
    back = convert_adam_moments(opt_sd, sd_model,
                                convert_discriminator_state_dict)
    assert back is not None and back["count"] == 7
    _trees_equal(mu, back["mu"])
    _trees_equal(nu, back["nu"])
    # torch accepts the exported dict on a real Adam over the live reference
    ref_models = import_reference("models")
    d_ref = ref_models.Discriminator(channel_factor=8)
    d_ref.load_state_dict(sd_model)
    opt = torch.optim.Adam(d_ref.parameters(), lr=1e-5)
    opt.load_state_dict(opt_sd)
    assert len(opt.state) == len(opt_sd["state"])


def test_adam_moment_import_empty_state_is_none():
    from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
        convert_adam_moments,
    )

    assert convert_adam_moments({"state": {}, "param_groups": []}, {},
                                convert_discriminator_state_dict) is None


def test_vgg16_export_roundtrip_and_reference_strict_load():
    """export_vgg16_state_dict is the exact inverse of
    convert_vgg16_state_dict, and its output loads STRICT into the live
    reference wrapper — the /root/reference/main.py:61 consumption path
    (`VGG16().load_state_dict(torch.load(...))`) for a VGG fine-tuned with
    cli/vgg16_finetune.py (--export_pt / convert_checkpoint vgg-to-pt)."""
    import torch

    from semantic_pyramid_for_image_generation_tpu.utils.pt_interop import (
        convert_vgg16_state_dict,
        export_vgg16_state_dict,
    )

    torch.manual_seed(1)
    conv_plan = {  # torchvision vgg16 conv indices -> (out, in)
        0: (64, 3), 2: (64, 64), 5: (128, 64), 7: (128, 128),
        10: (256, 128), 12: (256, 256), 14: (256, 256),
        17: (512, 256), 19: (512, 512), 21: (512, 512),
        24: (512, 512), 26: (512, 512), 28: (512, 512),
    }
    fc_plan = {0: (4096, 25088), 3: (4096, 4096), 6: (365, 4096)}
    tv_sd = {}
    for i, (o, c) in conv_plan.items():
        tv_sd[f"features.{i}.weight"] = torch.randn(o, c, 3, 3)
        tv_sd[f"features.{i}.bias"] = torch.randn(o)
    for i, (o, c) in fc_plan.items():
        tv_sd[f"classifier.{i}.weight"] = torch.randn(o, c)
        tv_sd[f"classifier.{i}.bias"] = torch.randn(o)

    variables = convert_vgg16_state_dict(tv_sd)
    exported = export_vgg16_state_dict(variables)
    assert all(k.startswith("vgg16.") for k in exported)
    # exact inverse: converting the export reproduces the flax variables
    _trees_equal(convert_vgg16_state_dict(exported)["params"],
                 variables["params"])
    # byte-level: every exported tensor equals the original torchvision one
    for key, value in tv_sd.items():
        assert torch.equal(exported[f"vgg16.{key}"], value), key

    from torch_ref import import_reference

    ref_models = import_reference("models")
    vgg_ref = ref_models.VGG16()  # 365-way head, as in the reference
    vgg_ref.load_state_dict(exported)  # strict: full key/shape agreement
