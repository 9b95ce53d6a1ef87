"""Flax building blocks for the semantic-pyramid GAN.

Every spectrally-normalized layer carries its power-iteration vectors in the
`spectral` variable collection and its normalization statistics in
`batch_stats`; both are threaded functionally through jitted train steps
(see ops/spectral_norm.py for the design rationale).

Reference architecture: /root/reference/models.py (SelfAttention :219-275,
GeneratorResidualBlock :278-339, LinearBlock :342-375, discriminator blocks
:378-466, ConditionalBatchNorm :469-506, init :509-519).

All spatial tensors are NHWC (TPU-native; the reference is NCHW).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# Fold the discriminator blocks' trailing avg-pools into their convs
# (SNConv.fold_avg_pool) in the bf16 perf mode. 0 keeps the literal
# conv -> pool order everywhere (the fp32 parity mode always keeps it).
_FOLD_DPOOL = int(os.environ.get("SPIG_FOLD_DPOOL", "1") or 0)

# Commute the generator residual path conv1x1(up2(x)) -> up2(conv1x1(x)) in
# the bf16 perf mode: a 1x1 conv is pure channel mixing and commutes exactly
# with the per-channel bilinear upsample, so the conv runs at coarse
# resolution (1/4 the FLOPs) and the upsample shrinks when out < in channels.
_COMMUTE_GRES = int(os.environ.get("SPIG_COMMUTE_GRES", "1") or 0)

from semantic_pyramid_for_image_generation_tpu.ops.spectral_norm import (
    l2_normalize,
    spectral_norm_weight,
)
from semantic_pyramid_for_image_generation_tpu.ops.pool import avg_pool_2d, max_pool_2d
from semantic_pyramid_for_image_generation_tpu.ops.resize import (
    upsample_bilinear_align_corners,
)

LEAKY_SLOPE = 0.2


def lrelu(x: jax.Array) -> jax.Array:
    return nn.leaky_relu(x, LEAKY_SLOPE)


def _xavier_uniform():
    return nn.initializers.xavier_uniform()


def matmul_precision(dtype) -> jax.lax.Precision | None:
    """fp32 mode is the torch-parity mode: force fp32 MXU accumulation.
    bf16 mode is the TPU perf mode: let XLA use native bf16 MXU passes."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


class _SpectralMixin:
    """Shared helper: spectral-normalize a 2D weight view with state threading."""

    def _spectral_scale(self, w2d: jax.Array, update: bool) -> jax.Array:
        rows, cols = w2d.shape

        def init_u():
            return l2_normalize(
                jax.random.normal(self.make_rng("params"), (rows,), jnp.float32))

        def init_v():
            return l2_normalize(
                jax.random.normal(self.make_rng("params"), (cols,), jnp.float32))

        u_var = self.variable("spectral", "u", init_u)
        v_var = self.variable("spectral", "v", init_v)
        if self.has_variable("sigmas", "sigma"):
            # precomputed batched sigma pass (ops/spectral_norm.py::
            # compute_sigma_tree): the train step computes every layer's
            # sigma in a few stacked matmuls and advances u/v outside the
            # apply — this inline path would serialize ~6 tiny ops per layer
            return self.get_variable("sigmas", "sigma")
        do_update = update and not self.is_initializing()
        sigma, u_new, v_new = spectral_norm_weight(
            w2d, u_var.value, v_var.value, update=do_update)
        if do_update:
            u_var.value = u_new
            v_var.value = v_new
        return sigma


class SNConv(nn.Module, _SpectralMixin):
    """Spectrally-normalized 2D convolution (NHWC), torch-parity semantics.

    The power iteration runs on the weight viewed as (out, in*kh*kw), matching
    torch's reshape of its OIHW kernel, so converted `.pt` checkpoints resume
    with identical sigma trajectories.

    `x` may be a tuple of NHWC tensors treated as channel groups of one input
    (i.e. conv(concat(xs))): the kernel param keeps the unified concat layout
    (checkpoint-identical), but the conv runs as a sum of per-group convs.
    For the generator's feature-injection convs this keeps the big group at a
    clean 64/128/256/512 input-channel count for MXU lane tiling and never
    materializes the (C+1)-channel concat (OPTIM.md lever 2).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 1
    use_bias: bool = True
    # Algebraic pool fold: compute avg_pool_2x2(conv(x)) as ONE 4x4 (or
    # (kh+1, kw+1)) stride-2 conv with kernel 1/4 * (k convolved with
    # ones(2,2)) — exact by linearity (bias commutes: the pooled average of a
    # constant is the constant). 44% of the conv-then-pool FLOPs for 3x3
    # kernels, and the full-resolution conv output is never materialized.
    # Param shape, spectral norm view, and sigma trajectory are unchanged:
    # the fold happens after normalization at apply time. Used by the
    # discriminator blocks' trailing convs in the bf16 perf mode (the fp32
    # torch-parity mode keeps the literal conv -> pool order).
    fold_avg_pool: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True) -> jax.Array:
        xs = tuple(x) if isinstance(x, (tuple, list)) else (x,)
        in_ch = sum(t.shape[-1] for t in xs)
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", _xavier_uniform(), (kh, kw, in_ch, self.features), jnp.float32)
        # HWIO -> OIHW -> (O, I*kh*kw): the exact matrix torch iterates on.
        w2d = kernel.transpose(3, 2, 0, 1).reshape(self.features, -1)
        sigma = self._spectral_scale(w2d, update=train)
        kernel = kernel / sigma
        strides = self.strides
        if self.fold_avg_pool:
            folded = jnp.zeros((kh + 1, kw + 1) + kernel.shape[2:], jnp.float32)
            for di in (0, 1):
                for dj in (0, 1):
                    folded = folded.at[di:di + kh, dj:dj + kw].add(kernel)
            kernel = folded * 0.25
            strides = (2, 2)
        kernel = kernel.astype(self.dtype)
        if in_ch < 8 and len(xs) == 1:
            # zero-pad sub-8-channel inputs (RGB image convs): identical math
            # (0 * k contributes nothing, fp-exact). In isolation the padded
            # backward-to-input conv is ~20% faster (the 3-channel image-grad
            # convs were the largest single-op wastes in the step profile);
            # end-to-end it measures neutral at batch 128 — kept because it
            # can only help tiling and costs one fused pad
            grow = 8 - in_ch
            xs = (jnp.pad(xs[0], ((0, 0), (0, 0), (0, 0), (0, grow))),)
            kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, grow), (0, 0)))
        pad = [(self.padding, self.padding)] * 2
        prec = matmul_precision(self.dtype)
        y = None
        offset = 0
        for t in xs:
            c = t.shape[-1]
            part = jax.lax.conv_general_dilated(
                t.astype(self.dtype), kernel[:, :, offset:offset + c],
                window_strides=strides, padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=prec)
            y = part if y is None else y + part
            offset += c
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class SNDense(nn.Module, _SpectralMixin):
    """Spectrally-normalized linear layer; iterates on the (out, in) matrix."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        in_f = x.shape[-1]
        kernel = self.param(
            "kernel", _xavier_uniform(), (in_f, self.features), jnp.float32)
        sigma = self._spectral_scale(kernel.T, update=train)
        y = jnp.matmul(x.astype(self.dtype), (kernel / sigma).astype(self.dtype),
                       precision=matmul_precision(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class SNEmbedding(nn.Module, _SpectralMixin):
    """Spectrally-normalized embedding (discriminator class projection,
    /root/reference/models.py:135-136). Iterates on the (num, dim) table."""

    num_embeddings: int
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, idx: jax.Array, train: bool = True) -> jax.Array:
        table = self.param(
            "embedding", nn.initializers.normal(stddev=1.0),
            (self.num_embeddings, self.features), jnp.float32)
        sigma = self._spectral_scale(table, update=train)
        # one-hot matmul row select: exact in fp32 (1.0*v + zeros), and its
        # backward is a dense MXU matmul instead of a scatter, which XLA:TPU
        # lowers to a ~1 ms serial while-loop over the batch (profiled)
        onehot = jax.nn.one_hot(idx, self.num_embeddings, dtype=jnp.float32)
        row = jnp.matmul(onehot, table / sigma,
                         precision=jax.lax.Precision.HIGHEST)
        return row.astype(self.dtype)


class ConditionalBatchNorm(nn.Module):
    """Class-conditional batch norm (/root/reference/models.py:469-506):
    affine-free BN (momentum 0.001) + per-class (scale, bias) from an embedding
    table initialized to (1, 0). Under a sharded batch, jit/GSPMD computes the
    batch moments over the *global* batch (a free upgrade over the reference's
    per-replica DataParallel stats)."""

    features: int
    num_classes: int
    momentum: float = 0.001
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, class_onehot: jax.Array,
                 train: bool = True) -> jax.Array:
        c = self.features
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        if train:
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(x32), axis=(0, 1, 2)) - jnp.square(mean)
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.eps)
        y = (x.astype(jnp.float32) - mean) * inv

        def init_embedding(_key):
            return jnp.concatenate(
                [jnp.ones((self.num_classes, c), jnp.float32),
                 jnp.zeros((self.num_classes, c), jnp.float32)], axis=1)

        emb = self.param("embedding", init_embedding)
        idx = jnp.argmax(class_onehot, axis=-1)
        # one-hot matmul row select (exact in fp32): the gather's backward is
        # a scatter into the (365, 2C) table that XLA:TPU lowers to a serial
        # 256-iteration while-loop (~1 ms each, ~30 per step profiled); the
        # matmul backward is one dense MXU op
        onehot = jax.nn.one_hot(idx, self.num_classes, dtype=jnp.float32)
        row = jnp.matmul(onehot, emb, precision=jax.lax.Precision.HIGHEST)
        scale = row[:, None, None, :c]
        bias = row[:, None, None, c:]
        return (scale * y + bias).astype(self.dtype)


class BatchNorm(nn.Module):
    """Plain torch-semantics BatchNorm2d (affine, momentum 0.1) for the
    generator's final block (/root/reference/models.py:53)."""

    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        c = self.features
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        if train:
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(x32), axis=(0, 1, 2)) - jnp.square(mean)
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return ((x.astype(jnp.float32) - mean) * inv + bias).astype(self.dtype)


class SelfAttention(nn.Module):
    """SAGAN self-attention with 2x max-pooled keys/values and learned gamma
    initialized to 1.0 (/root/reference/models.py:219-275; gamma quirk :247).

    Plain-XLA path: two batched matmuls + softmax; `use_pallas=True` dispatches
    the fused Pallas TPU kernel (ops/pallas/attention.py).
    """

    channels: int
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        b, h, w, c = x.shape
        c_qk, c_v = c // 8, c // 2
        conv = lambda feats, name: SNConv(  # noqa: E731
            feats, kernel_size=(1, 1), padding=0, dtype=self.dtype, name=name)
        pooled = max_pool_2d(x, 2)
        q = conv(c_qk, "query_convolution")(x, train)
        k = conv(c_qk, "key_convolution")(pooled, train)
        v = conv(c_v, "value_convolution")(pooled, train)
        q = q.reshape(b, h * w, c_qk)
        k = k.reshape(b, (h * w) // 4, c_qk)
        v = v.reshape(b, (h * w) // 4, c_v)
        if self.use_pallas and not self.is_initializing():
            from semantic_pyramid_for_image_generation_tpu.ops.pallas.attention import (
                pooled_kv_attention,
            )
            attn_out = pooled_kv_attention(q, k, v)
        else:
            prec = matmul_precision(self.dtype)
            logits = jnp.einsum(
                "bqc,bkc->bqk", q, k,
                preferred_element_type=jnp.float32, precision=prec)
            attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            attn_out = jnp.einsum("bqk,bkc->bqc", attn, v, precision=prec)
        attn_out = attn_out.reshape(b, h, w, c_v)
        out = conv(c, "attention_convolution")(attn_out, train)
        gamma = self.param("gamma", nn.initializers.ones, (1,), jnp.float32)
        return gamma.astype(self.dtype) * out + x


class GeneratorResidualBlock(nn.Module):
    """Upsampling generator block (/root/reference/models.py:278-339):
    main: CBN -> lrelu -> up2x -> SN3x3 -> CBN -> lrelu -> SN3x3;
    residual: up2x -> SN1x1;  feature branch: SN3x3 on (masked feats ++ mask);
    output = main + residual + mapped_features."""

    in_channels: int
    out_channels: int
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, masked_features: jax.Array,
                 class_onehot: jax.Array, train: bool = True) -> jax.Array:
        cbn = lambda c, name: ConditionalBatchNorm(  # noqa: E731
            c, self.num_classes, dtype=self.dtype, name=name)
        y = cbn(self.in_channels, "cbn_1")(x, class_onehot, train)
        y = lrelu(y)
        y = upsample_bilinear_align_corners(y, 2)
        y = SNConv(self.out_channels, dtype=self.dtype, name="conv_1")(y, train)
        y = cbn(self.out_channels, "cbn_2")(y, class_onehot, train)
        y = lrelu(y)
        y = SNConv(self.out_channels, dtype=self.dtype, name="conv_2")(y, train)
        res_conv = SNConv(self.out_channels, kernel_size=(1, 1), padding=0,
                          dtype=self.dtype, name="residual_conv")
        if _COMMUTE_GRES and self.dtype != jnp.float32:
            res = upsample_bilinear_align_corners(res_conv(x, train), 2)
        else:
            res = res_conv(upsample_bilinear_align_corners(x, 2), train)
        feat = SNConv(self.out_channels, dtype=self.dtype,
                      name="masked_feature_mapping")(masked_features, train)
        return y + res + feat


class LinearBlock(nn.Module):
    """Feature-injecting linear block for the fc8/fc7 pyramid levels
    (/root/reference/models.py:342-375)."""

    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, masked_features: jax.Array,
                 train: bool = True) -> jax.Array:
        y = SNDense(self.out_features, dtype=self.dtype, name="linear")(
            lrelu(x), train)
        feat = SNDense(self.out_features, dtype=self.dtype,
                       name="masked_feature_mapping")(masked_features, train)
        return y + feat


class DiscriminatorInputResidualBlock(nn.Module):
    """Input block (/root/reference/models.py:378-419): main SN3x3 -> lrelu ->
    SN3x3 -> avgpool2; residual avgpool2 -> SN1x1 (pool *before* the 1x1)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        fold = _FOLD_DPOOL and self.dtype != jnp.float32
        y = SNConv(self.out_channels, dtype=self.dtype, name="conv_1")(x, train)
        y = lrelu(y)
        y = SNConv(self.out_channels, dtype=self.dtype, name="conv_2",
                   fold_avg_pool=fold)(y, train)
        if not fold:
            y = avg_pool_2d(y, 2)
        # residual: conv1x1(avgpool(x)) == the folded 2x2 stride-2 conv by
        # linearity, so both orders share one code path when folding
        res_in = x if fold else avg_pool_2d(x, 2)
        res = SNConv(self.out_channels, kernel_size=(1, 1), padding=0,
                     dtype=self.dtype, name="residual_conv",
                     fold_avg_pool=fold)(res_in, train)
        return y + res


class DiscriminatorResidualBlock(nn.Module):
    """Downsampling block (/root/reference/models.py:422-466): lrelu -> SN3x3
    -> lrelu -> SN3x3 (+ SN1x1 residual), then avgpool2."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        # avgpool(main + residual) == foldedconv(main_in) + foldedconv(x):
        # the pool distributes over the sum and folds into each conv.
        fold = _FOLD_DPOOL and self.dtype != jnp.float32
        y = lrelu(x)
        y = SNConv(self.out_channels, dtype=self.dtype, name="conv_1")(y, train)
        y = lrelu(y)
        y = SNConv(self.out_channels, dtype=self.dtype, name="conv_2",
                   fold_avg_pool=fold)(y, train)
        res = SNConv(self.out_channels, kernel_size=(1, 1), padding=0,
                     dtype=self.dtype, name="residual_conv",
                     fold_avg_pool=fold)(x, train)
        if fold:
            return y + res
        return avg_pool_2d(y + res, 2)
