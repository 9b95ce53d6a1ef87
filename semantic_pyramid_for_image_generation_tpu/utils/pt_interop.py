"""torch `.pt` checkpoint interop.

The reference trains/loads torch state dicts: the fine-tuned VGG-16
(/root/reference/main.py:61), full GAN checkpoints with G/D + optimizer states
(/root/reference/model_wrapper.py:215-223, main.py:68-73), and the whole-model
pickle produced by caffe2pytorchvgg16.py. These functions convert torch state
dicts into this framework's flax variable pytrees (params / spectral /
batch_stats), so reference-trained weights run on TPU unchanged.

Weight layout conversions:
    conv   torch OIHW         -> flax HWIO   (transpose 2,3,1,0)
    linear torch (out, in)    -> flax (in, out) (transpose)
    spectral u/v, embeddings, BN stats: copied as-is (see models/layers.py for
    the matching (out, in*kh*kw) power-iteration view).

torch is only imported inside these functions; the TPU training path never
needs it.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    # copy=True: torch mutates spectral u/v buffers IN PLACE on forward;
    # a numpy view would silently track the live module.
    return np.array(x.detach().cpu().numpy(), dtype=np.float32, copy=True)


def _set(tree: Dict[str, Any], path: str, leaf: Mapping[str, np.ndarray]) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = dict(leaf)


class _Converter:
    def __init__(self, sd: Mapping[str, Any]):
        self.sd = sd
        self.params: Dict[str, Any] = {}
        self.spectral: Dict[str, Any] = {}
        self.batch_stats: Dict[str, Any] = {}

    def sn_conv(self, dst: str, src: str) -> None:
        w = _t(self.sd[f"{src}.weight_orig"])
        _set(self.params, dst,
             {"kernel": w.transpose(2, 3, 1, 0), "bias": _t(self.sd[f"{src}.bias"])})
        _set(self.spectral, dst,
             {"u": _t(self.sd[f"{src}.weight_u"]), "v": _t(self.sd[f"{src}.weight_v"])})

    def sn_dense(self, dst: str, src: str) -> None:
        w = _t(self.sd[f"{src}.weight_orig"])
        _set(self.params, dst, {"kernel": w.T, "bias": _t(self.sd[f"{src}.bias"])})
        _set(self.spectral, dst,
             {"u": _t(self.sd[f"{src}.weight_u"]), "v": _t(self.sd[f"{src}.weight_v"])})

    def sn_embedding(self, dst: str, src: str) -> None:
        _set(self.params, dst, {"embedding": _t(self.sd[f"{src}.weight_orig"])})
        _set(self.spectral, dst,
             {"u": _t(self.sd[f"{src}.weight_u"]), "v": _t(self.sd[f"{src}.weight_v"])})

    def cbn(self, dst: str, src: str) -> None:
        _set(self.params, dst, {"embedding": _t(self.sd[f"{src}.embedding.weight"])})
        _set(self.batch_stats, dst,
             {"mean": _t(self.sd[f"{src}.batch_norm.running_mean"]),
              "var": _t(self.sd[f"{src}.batch_norm.running_var"])})

    def bn(self, dst: str, src: str) -> None:
        _set(self.params, dst,
             {"scale": _t(self.sd[f"{src}.weight"]), "bias": _t(self.sd[f"{src}.bias"])})
        _set(self.batch_stats, dst,
             {"mean": _t(self.sd[f"{src}.running_mean"]),
              "var": _t(self.sd[f"{src}.running_var"])})

    def attention(self, dst: str, src: str) -> None:
        for name in ("query_convolution", "key_convolution", "value_convolution",
                     "attention_convolution"):
            self.sn_conv(f"{dst}/{name}", f"{src}.{name}")
        _set_leaf(self.params, f"{dst}/gamma", _t(self.sd[f"{src}.gamma"]))

    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "spectral": self.spectral,
                "batch_stats": self.batch_stats}


def _set_leaf(tree: Dict[str, Any], path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert_generator_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference Generator state dict -> flax variables
    (module map per /root/reference/models.py:28-61)."""
    c = _Converter(sd)
    c.sn_dense("linear_layer", "linear_layer")
    for i in (1, 2):
        c.sn_dense(f"linear_block_{i}/linear", f"linear_block_{i}.main_block.1")
        c.sn_dense(f"linear_block_{i}/masked_feature_mapping",
                   f"linear_block_{i}.masked_feature_mapping")
    c.sn_conv("convolution_layer", "convolution_layer.1")
    # main_path indices 0,1,2,4,5 are residual blocks; 3 is self-attention.
    for block_idx, path_idx in enumerate((0, 1, 2, 4, 5)):
        src = f"main_path.{path_idx}"
        dst = f"block_{block_idx}"
        c.cbn(f"{dst}/cbn_1", f"{src}.main_block.0")
        c.sn_conv(f"{dst}/conv_1", f"{src}.main_block.3")
        c.cbn(f"{dst}/cbn_2", f"{src}.main_block.4")
        c.sn_conv(f"{dst}/conv_2", f"{src}.main_block.6")
        c.sn_conv(f"{dst}/residual_conv", f"{src}.residual_mapping.1")
        c.sn_conv(f"{dst}/masked_feature_mapping", f"{src}.masked_feature_mapping")
    c.attention("self_attention", "main_path.3")
    c.bn("final_bn", "final_block.1")
    c.sn_conv("final_conv_1", "final_block.3")
    c.sn_conv("final_conv_2", "final_block.5")
    return c.variables()


def convert_discriminator_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference Discriminator state dict -> flax variables
    (module map per /root/reference/models.py:116-136)."""
    c = _Converter(sd)
    c.sn_conv("block_0/conv_1", "layers.0.main_block.0")
    c.sn_conv("block_0/conv_2", "layers.0.main_block.2")
    c.sn_conv("block_0/residual_conv", "layers.0.residual_mapping")
    for block_idx, path_idx in enumerate((1, 2, 4, 5, 6, 7), start=1):
        src = f"layers.{path_idx}"
        dst = f"block_{block_idx}"
        c.sn_conv(f"{dst}/conv_1", f"{src}.main_block.1")
        c.sn_conv(f"{dst}/conv_2", f"{src}.main_block.3")
        c.sn_conv(f"{dst}/residual_conv", f"{src}.residual_mapping")
    c.attention("self_attention", "layers.3")
    c.sn_dense("linear", "layers.11")
    c.sn_dense("classification", "classification")
    c.sn_embedding("embedding", "embedding")
    return c.variables()


# caffe layer names -> torchvision vgg16 module indices: the mapping
# /root/reference/caffe2pytorchvgg16.py encodes by renaming the torchvision
# Sequentials to caffe names before loading the caffemodel2pytorch h5 dump.
_CAFFE_VGG16_LAYERS = {
    "conv1_1": "features.0", "conv1_2": "features.2",
    "conv2_1": "features.5", "conv2_2": "features.7",
    "conv3_1": "features.10", "conv3_2": "features.12",
    "conv3_3": "features.14",
    "conv4_1": "features.17", "conv4_2": "features.19",
    "conv4_3": "features.21",
    "conv5_1": "features.24", "conv5_2": "features.26",
    "conv5_3": "features.28",
    "fc6": "classifier.0", "fc7": "classifier.3", "fc8a": "classifier.6",
}


def remap_caffe_vgg16_keys(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """caffe-style keys (conv1_1.weight .. fc8a.bias, as produced by the
    caffemodel2pytorch h5 dump in scripts/download_pretrained_vgg16.sh) ->
    torchvision vgg16 keys (features.{i}./classifier.{i}.)."""
    out: Dict[str, Any] = {}
    for key, value in sd.items():
        layer, _, tail = key.partition(".")
        mapped = _CAFFE_VGG16_LAYERS.get(layer)
        if mapped is None:
            raise KeyError(f"unknown caffe VGG16 layer in key: {key}")
        out[f"{mapped}.{tail}"] = value
    return out


def convert_vgg16_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference VGG16 (or raw torchvision vgg16) state dict -> flax variables.

    Accepts the reference wrapper's `vgg16.features.*` prefix
    (/root/reference/models.py:174-181), bare `features.*` keys, and
    caffe-style `conv1_1.*`..`fc8a.*` keys (auto-remapped).
    """
    if any(k.startswith("conv1_1") for k in sd):
        sd = remap_caffe_vgg16_keys(sd)
    params: Dict[str, Any] = {}
    prefix = "vgg16." if any(k.startswith("vgg16.") for k in sd) else ""
    conv_indices = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    for i in conv_indices:
        w = _t(sd[f"{prefix}features.{i}.weight"])
        _set(params, f"features_{i}",
             {"kernel": w.transpose(2, 3, 1, 0),
              "bias": _t(sd[f"{prefix}features.{i}.bias"])})
    for i in (0, 3, 6):
        w = _t(sd[f"{prefix}classifier.{i}.weight"])
        _set(params, f"classifier_{i}",
             {"kernel": w.T, "bias": _t(sd[f"{prefix}classifier.{i}.bias"])})
    return {"params": params}


def export_vgg16_state_dict(variables: Mapping[str, Any],
                            prefix: str = "vgg16.") -> Dict[str, Any]:
    """flax VGG16 variables -> reference-loadable torch state dict (exact
    inverse of convert_vgg16_state_dict).

    The default `vgg16.` prefix matches the reference wrapper module
    (/root/reference/models.py:174-181), so the output loads directly via
    `VGG16().load_state_dict(torch.load(path))` — the consumption path at
    /root/reference/main.py:61. This closes the fine-tune interop loop: a VGG
    fine-tuned with cli/vgg16_finetune.py can go back to the reference.
    Tensors are copied (torch mutates buffers in place)."""
    import torch

    params = _flat(variables.get("params", variables))
    sd: Dict[str, Any] = {}

    def _pt(arr):
        return torch.from_numpy(np.ascontiguousarray(arr).copy())

    for i in (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28):
        sd[f"{prefix}features.{i}.weight"] = _pt(
            params[f"features_{i}/kernel"].transpose(3, 2, 0, 1))
        sd[f"{prefix}features.{i}.bias"] = _pt(params[f"features_{i}/bias"])
    for i in (0, 3, 6):
        sd[f"{prefix}classifier.{i}.weight"] = _pt(
            params[f"classifier_{i}/kernel"].T)
        sd[f"{prefix}classifier.{i}.bias"] = _pt(
            params[f"classifier_{i}/bias"])
    return sd


_BUFFER_SUFFIXES = ("weight_u", "weight_v", "running_mean", "running_var",
                    "num_batches_tracked")


def _parameter_keys(model_sd: Mapping[str, Any]):
    """Ordered *parameter* keys of a reference state dict.

    torch's state_dict lists each module's parameters before its buffers and
    recurses children in registration order — restricted to parameters that is
    exactly the order `net.parameters()` yields, which is the order torch
    Adam's param_groups ids follow (/root/reference/main.py:64-65). Buffers
    (spectral u/v, BN running stats) are the only non-parameter entries in the
    reference G/D state dicts.
    """
    return [k for k in model_sd if not k.endswith(_BUFFER_SUFFIXES)]


def convert_adam_moments(opt_sd: Mapping[str, Any], model_sd: Mapping[str, Any],
                         convert_fn) -> Optional[Dict[str, Any]]:
    """torch Adam optimizer state dict -> optax-ready moment trees.

    torch keys Adam slots by integer param ids in param_groups order
    (= parameter order, see _parameter_keys); exp_avg / exp_avg_sq have the
    parameters' own shapes, so substituting them for the weights in a copy of
    the model state dict and running it through the SAME layout converter used
    for the weights yields mu/nu pytrees that match the flax params pytree
    leaf-for-leaf, transposes included.

    Returns {"mu": params_tree, "nu": params_tree, "count": int}, or None when
    the optimizer state is empty (fresh optimizer, nothing to import).
    Ref: /root/reference/main.py:68-73, model_wrapper.py:215-223.
    """
    state = opt_sd.get("state") or {}
    if not state:
        return None
    param_keys = _parameter_keys(model_sd)
    order = [pid for group in opt_sd["param_groups"]
             for pid in group["params"]]
    if len(order) != len(param_keys):
        raise ValueError(
            f"optimizer state covers {len(order)} params but the model state "
            f"dict has {len(param_keys)} parameters — not a matching "
            "reference checkpoint")
    mu_sd, nu_sd = dict(model_sd), dict(model_sd)
    count = 0
    for key, pid in zip(param_keys, order):
        slot = state[pid]
        mu_sd[key] = slot["exp_avg"]
        nu_sd[key] = slot["exp_avg_sq"]
        step = slot["step"]
        count = int(step.item() if hasattr(step, "item") else step)
    return {"mu": convert_fn(mu_sd)["params"],
            "nu": convert_fn(nu_sd)["params"], "count": count}


def load_torch_file(path: str) -> Mapping[str, Any]:
    """torch.load a `.pt` file; unwraps whole-module pickles
    (caffe2pytorchvgg16.py:21) into state dicts."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return obj


def load_reference_gan_checkpoint(
        path: str, include_optimizer: bool = False) -> Tuple[Any, ...]:
    """Load a reference `checkpoint_XXX.pt` (model_wrapper.py:215-223) and
    return (generator_variables, discriminator_variables). With
    `include_optimizer=True` also returns (g_moments, d_moments) — converted
    Adam exp_avg/exp_avg_sq/step trees (None when the checkpoint's optimizer
    state is empty), matching main.py:68-73's full optimizer restore."""
    ckpt = load_torch_file(path)
    g_vars = convert_generator_state_dict(ckpt["generator"])
    d_vars = convert_discriminator_state_dict(ckpt["discriminator"])
    if not include_optimizer:
        return g_vars, d_vars
    g_moments = convert_adam_moments(
        ckpt.get("generator_optimizer") or {}, ckpt["generator"],
        convert_generator_state_dict)
    d_moments = convert_adam_moments(
        ckpt.get("discriminator_optimizer") or {}, ckpt["discriminator"],
        convert_discriminator_state_dict)
    return g_vars, d_vars, g_moments, d_moments


# ---------------------------------------------------------------------------
# Reverse direction: flax variables -> torch state dicts, so TPU-trained
# checkpoints drop back into the reference implementation unchanged.
# ---------------------------------------------------------------------------

def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flat(v, path))
        else:
            out[path] = np.asarray(v)
    return out


class _Exporter:
    def __init__(self, variables):
        import torch

        self.torch = torch
        self.params = _flat(variables.get("params", {}))
        self.spectral = _flat(variables.get("spectral", {}))
        self.stats = _flat(variables.get("batch_stats", {}))
        self.sd = {}

    def _t(self, arr):
        return self.torch.from_numpy(np.ascontiguousarray(arr).copy())

    def sn_conv(self, src, dst):
        k = self.params[f"{src}/kernel"]
        self.sd[f"{dst}.weight_orig"] = self._t(k.transpose(3, 2, 0, 1))
        self.sd[f"{dst}.bias"] = self._t(self.params[f"{src}/bias"])
        self.sd[f"{dst}.weight_u"] = self._t(self.spectral[f"{src}/u"])
        self.sd[f"{dst}.weight_v"] = self._t(self.spectral[f"{src}/v"])

    def sn_dense(self, src, dst):
        self.sd[f"{dst}.weight_orig"] = self._t(self.params[f"{src}/kernel"].T)
        self.sd[f"{dst}.bias"] = self._t(self.params[f"{src}/bias"])
        self.sd[f"{dst}.weight_u"] = self._t(self.spectral[f"{src}/u"])
        self.sd[f"{dst}.weight_v"] = self._t(self.spectral[f"{src}/v"])

    def sn_embedding(self, src, dst):
        self.sd[f"{dst}.weight_orig"] = self._t(self.params[f"{src}/embedding"])
        self.sd[f"{dst}.weight_u"] = self._t(self.spectral[f"{src}/u"])
        self.sd[f"{dst}.weight_v"] = self._t(self.spectral[f"{src}/v"])

    def cbn(self, src, dst):
        self.sd[f"{dst}.embedding.weight"] = self._t(
            self.params[f"{src}/embedding"])
        self.sd[f"{dst}.batch_norm.running_mean"] = self._t(
            self.stats[f"{src}/mean"])
        self.sd[f"{dst}.batch_norm.running_var"] = self._t(
            self.stats[f"{src}/var"])
        self.sd[f"{dst}.batch_norm.num_batches_tracked"] = self.torch.tensor(0)

    def bn(self, src, dst):
        self.sd[f"{dst}.weight"] = self._t(self.params[f"{src}/scale"])
        self.sd[f"{dst}.bias"] = self._t(self.params[f"{src}/bias"])
        self.sd[f"{dst}.running_mean"] = self._t(self.stats[f"{src}/mean"])
        self.sd[f"{dst}.running_var"] = self._t(self.stats[f"{src}/var"])
        self.sd[f"{dst}.num_batches_tracked"] = self.torch.tensor(0)

    def attention(self, src, dst):
        for name in ("query_convolution", "key_convolution",
                     "value_convolution", "attention_convolution"):
            self.sn_conv(f"{src}/{name}", f"{dst}.{name}")
        self.sd[f"{dst}.gamma"] = self._t(self.params[f"{src}/gamma"])


def export_generator_state_dict(variables: Mapping[str, Any]) -> Dict[str, Any]:
    """flax Generator variables -> reference Generator state dict
    (inverse of convert_generator_state_dict)."""
    e = _Exporter(variables)
    e.sn_dense("linear_layer", "linear_layer")
    for i in (1, 2):
        e.sn_dense(f"linear_block_{i}/linear", f"linear_block_{i}.main_block.1")
        e.sn_dense(f"linear_block_{i}/masked_feature_mapping",
                   f"linear_block_{i}.masked_feature_mapping")
    e.sn_conv("convolution_layer", "convolution_layer.1")
    for block_idx, path_idx in enumerate((0, 1, 2, 4, 5)):
        src, dst = f"block_{block_idx}", f"main_path.{path_idx}"
        e.cbn(f"{src}/cbn_1", f"{dst}.main_block.0")
        e.sn_conv(f"{src}/conv_1", f"{dst}.main_block.3")
        e.cbn(f"{src}/cbn_2", f"{dst}.main_block.4")
        e.sn_conv(f"{src}/conv_2", f"{dst}.main_block.6")
        e.sn_conv(f"{src}/residual_conv", f"{dst}.residual_mapping.1")
        e.sn_conv(f"{src}/masked_feature_mapping",
                  f"{dst}.masked_feature_mapping")
    e.attention("self_attention", "main_path.3")
    e.bn("final_bn", "final_block.1")
    e.sn_conv("final_conv_1", "final_block.3")
    e.sn_conv("final_conv_2", "final_block.5")
    return e.sd


def export_discriminator_state_dict(variables: Mapping[str, Any]) -> Dict[str, Any]:
    e = _Exporter(variables)
    e.sn_conv("block_0/conv_1", "layers.0.main_block.0")
    e.sn_conv("block_0/conv_2", "layers.0.main_block.2")
    e.sn_conv("block_0/residual_conv", "layers.0.residual_mapping")
    for block_idx, path_idx in enumerate((1, 2, 4, 5, 6, 7), start=1):
        src, dst = f"block_{block_idx}", f"layers.{path_idx}"
        e.sn_conv(f"{src}/conv_1", f"{dst}.main_block.1")
        e.sn_conv(f"{src}/conv_2", f"{dst}.main_block.3")
        e.sn_conv(f"{src}/residual_conv", f"{dst}.residual_mapping")
    e.attention("self_attention", "layers.3")
    e.sn_dense("linear", "layers.11")
    e.sn_dense("classification", "classification")
    e.sn_embedding("embedding", "embedding")
    return e.sd


def export_adam_state_dict(variables_mu: Mapping[str, Any],
                           variables_nu: Mapping[str, Any],
                           count: int, export_fn, lr: float = 1e-5) -> Dict[str, Any]:
    """optax Adam moments -> a torch Adam optimizer state dict.

    Inverse of convert_adam_moments: the mu/nu pytrees (shaped like the
    params) run through the SAME layout exporter as the weights, then the
    parameter-order keys become torch's integer param ids. `variables_*`
    carry the moment trees in the "params" slot (spectral/batch_stats only
    supply the exporter's buffer keys, which are dropped here).

    `lr` lands in the exported param_groups and torch's Adam.load_state_dict
    ADOPTS saved param_groups — a reference resume trains at this lr
    regardless of its own --lr flag, so pass the actual training lr
    (cli/convert_checkpoint.py --lr plumbs it).
    Ref: /root/reference/main.py:64-73 (Adam(params, lr), full restore)."""
    import torch

    sd_mu = export_fn(variables_mu)
    sd_nu = export_fn(variables_nu)
    keys = _parameter_keys(sd_mu)
    state = {
        i: {"step": torch.tensor(float(count)),
            "exp_avg": sd_mu[k], "exp_avg_sq": sd_nu[k]}
        for i, k in enumerate(keys)
    }
    param_groups = [{
        "lr": lr, "betas": (0.9, 0.999), "eps": 1e-8, "weight_decay": 0,
        "amsgrad": False, "maximize": False, "foreach": None,
        "capturable": False, "differentiable": False, "fused": None,
        "params": list(range(len(keys))),
    }]
    return {"state": state, "param_groups": param_groups}


def _adam_moments_from_opt_state(opt_state):
    """(mu, nu, count) out of an optax.adam state (chain slot 0)."""
    inner = opt_state[0]
    return inner.mu, inner.nu, int(inner.count)


def save_reference_gan_checkpoint(path: str, generator_variables,
                                  discriminator_variables,
                                  g_opt_state=None, d_opt_state=None,
                                  lr: float = 1e-5) -> None:
    """Write a reference-format checkpoint_XXX.pt
    (model_wrapper.py:215-223 layout). When the optax Adam states are given,
    the optimizer slots carry converted torch Adam moments, so the reference
    resumes with identical updates *provided `lr` matches the original
    training lr* (torch adopts the exported param_groups, overriding the
    resume-side --lr); otherwise they are empty."""
    import torch

    def adam_sd(opt_state, variables, export_fn):
        if opt_state is None:
            return {}
        mu, nu, count = _adam_moments_from_opt_state(opt_state)
        aux = {k: v for k, v in variables.items() if k != "params"}
        return export_adam_state_dict(
            {"params": mu, **aux}, {"params": nu, **aux}, count, export_fn,
            lr=lr)

    torch.save(
        {"generator": export_generator_state_dict(generator_variables),
         "discriminator": export_discriminator_state_dict(
             discriminator_variables),
         "generator_optimizer": adam_sd(
             g_opt_state, generator_variables, export_generator_state_dict),
         "discriminator_optimizer": adam_sd(
             d_opt_state, discriminator_variables,
             export_discriminator_state_dict)}, path)
