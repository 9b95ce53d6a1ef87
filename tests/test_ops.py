"""Parity tests for core ops against torch primitives (SURVEY.md 4b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from semantic_pyramid_for_image_generation_tpu.ops import (
    adaptive_avg_pool_2d,
    avg_pool_2d,
    interpolate_nearest,
    max_pool_1d,
    max_pool_2d,
    resize_bilinear_half_pixel,
    spectral_norm_weight,
    upsample_bilinear_align_corners,
)
from semantic_pyramid_for_image_generation_tpu.ops.resize import (
    interpolate_nearest_np,
    resize_bilinear_align_corners,
)


def _nhwc(rng, b=2, h=8, w=8, c=3):
    return rng.standard_normal((b, h, w, c)).astype(np.float32)


def _to_torch(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def _from_torch(t):
    return t.numpy().transpose(0, 2, 3, 1)


class TestSpectralNorm:
    def test_matches_torch_power_iteration(self, rng):
        """One power iteration + sigma must match torch.nn.utils.spectral_norm."""
        out_f, in_f = 12, 7
        w = rng.standard_normal((out_f, in_f)).astype(np.float32)
        lin = torch.nn.Linear(in_f, out_f, bias=False)
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(w))
        lin = torch.nn.utils.spectral_norm(lin)
        u0 = lin.weight_u.detach().numpy().copy()
        v0 = lin.weight_v.detach().numpy().copy()
        x = torch.from_numpy(rng.standard_normal((3, in_f)).astype(np.float32))
        y_torch = lin(x)  # training-mode forward: updates u, v then normalizes

        sigma, u1, v1 = spectral_norm_weight(
            jnp.asarray(w), jnp.asarray(u0), jnp.asarray(v0), update=True)
        np.testing.assert_allclose(u1, lin.weight_u.detach().numpy(), atol=1e-5)
        np.testing.assert_allclose(v1, lin.weight_v.detach().numpy(), atol=1e-5)
        y_ours = x.numpy() @ (w / np.asarray(sigma)).T
        np.testing.assert_allclose(y_ours, y_torch.detach().numpy(), atol=1e-5)

    def test_eval_mode_keeps_vectors(self, rng):
        w = rng.standard_normal((5, 4)).astype(np.float32)
        u = rng.standard_normal(5).astype(np.float32)
        v = rng.standard_normal(4).astype(np.float32)
        sigma, u1, v1 = spectral_norm_weight(
            jnp.asarray(w), jnp.asarray(u), jnp.asarray(v), update=False)
        np.testing.assert_array_equal(u1, u)
        np.testing.assert_array_equal(v1, v)
        np.testing.assert_allclose(sigma, u @ w @ v, rtol=1e-6)

    def test_sigma_gradient_is_rank_one(self, rng):
        """d(sigma)/dW must be u v^T (vectors treated as constants)."""
        w = jnp.asarray(rng.standard_normal((6, 3)).astype(np.float32))
        u = jnp.asarray(rng.standard_normal(6).astype(np.float32))
        v = jnp.asarray(rng.standard_normal(3).astype(np.float32))
        grad = jax.grad(lambda w_: spectral_norm_weight(w_, u, v, True)[0])(w)
        _, u1, v1 = spectral_norm_weight(w, u, v, True)
        np.testing.assert_allclose(grad, np.outer(u1, v1), atol=1e-6)


class TestResize:
    @pytest.mark.parametrize("size", [(4, 8), (8, 16), (5, 10)])
    def test_upsample_align_corners_matches_torch(self, rng, size):
        h, out = size
        x = _nhwc(rng, h=h, w=h)
        want = F.interpolate(_to_torch(x), scale_factor=out // h,
                             mode="bilinear", align_corners=True)
        got = upsample_bilinear_align_corners(jnp.asarray(x), out // h)
        np.testing.assert_allclose(got, _from_torch(want), atol=1e-5)

    def test_resize_align_corners_arbitrary(self, rng):
        x = _nhwc(rng, h=7, w=5)
        want = F.interpolate(_to_torch(x), size=(13, 9), mode="bilinear",
                             align_corners=True)
        got = resize_bilinear_align_corners(jnp.asarray(x), 13, 9)
        np.testing.assert_allclose(got, _from_torch(want), atol=1e-5)

    def test_half_pixel_matches_torch_align_corners_false(self, rng):
        x = _nhwc(rng, h=16, w=16)
        want = F.interpolate(_to_torch(x), size=(299, 299), mode="bilinear",
                             align_corners=False)
        got = resize_bilinear_half_pixel(jnp.asarray(x), 299, 299)
        np.testing.assert_allclose(got, _from_torch(want), atol=1e-4)

    @pytest.mark.parametrize("out", [(16, 16), (32, 8)])
    def test_nearest_matches_torch(self, rng, out):
        x = _nhwc(rng, h=8, w=8)
        want = F.interpolate(_to_torch(x), size=out, mode="nearest")
        got = interpolate_nearest(jnp.asarray(x), *out)
        np.testing.assert_allclose(got, _from_torch(want), atol=1e-6)
        # numpy host variant agrees
        got_np = interpolate_nearest_np(x[0, :, :, 0], *out)
        np.testing.assert_allclose(got_np, want.numpy()[0, 0], atol=1e-6)


class TestPool:
    def test_max_pool_2d(self, rng):
        x = _nhwc(rng, h=8, w=8)
        want = F.max_pool2d(_to_torch(x), 2)
        np.testing.assert_allclose(
            max_pool_2d(jnp.asarray(x), 2), _from_torch(want), atol=1e-6)

    def test_avg_pool_2d(self, rng):
        x = _nhwc(rng, h=8, w=8)
        want = F.avg_pool2d(_to_torch(x), 2)
        np.testing.assert_allclose(
            avg_pool_2d(jnp.asarray(x), 2), _from_torch(want), atol=1e-6)

    def test_max_pool_1d(self, rng):
        x = rng.standard_normal((2, 1, 64)).astype(np.float32)
        want = F.max_pool1d(torch.from_numpy(x), 2)
        np.testing.assert_allclose(
            max_pool_1d(jnp.asarray(x), 2), want.numpy(), atol=1e-6)

    @pytest.mark.parametrize("in_out", [(8, 7), (8, 1), (7, 3), (2, 7)])
    def test_adaptive_avg_pool(self, rng, in_out):
        size, out = in_out
        x = _nhwc(rng, h=size, w=size)
        want = F.adaptive_avg_pool2d(_to_torch(x), (out, out))
        got = adaptive_avg_pool_2d(jnp.asarray(x), out, out)
        np.testing.assert_allclose(got, _from_torch(want), atol=1e-5)


class TestAvgPoolCustomVJP:
    def test_gradient_matches_reshape_reference(self, rng):
        """avg_pool 2x2 uses a custom broadcast transpose; check vs autodiff
        of the reshape-mean formulation."""
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))

        def ref(x):
            b, h, w, c = x.shape
            return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))

        g_ours = jax.grad(lambda x: jnp.sum(jnp.sin(avg_pool_2d(x))))(x)
        g_ref = jax.grad(lambda x: jnp.sum(jnp.sin(ref(x))))(x)
        np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                                   atol=1e-6)


class TestMaxPoolEqsplitVJP:
    """The bf16 perf path's custom max-pool backward (_max_pool_2x2_eqsplit):
    forward identical to max_pool_2d, backward identical on untied data, and a
    valid subgradient (window sums conserve the cotangent) on ties."""

    def test_forward_identical(self, rng):
        from semantic_pyramid_for_image_generation_tpu.ops import pool
        x = jnp.asarray(_nhwc(rng, h=8, w=8))
        np.testing.assert_array_equal(
            np.asarray(pool._max_pool_2x2_eqsplit(x)),
            np.asarray(max_pool_2d(x)))

    def test_backward_matches_on_untied(self, rng):
        from semantic_pyramid_for_image_generation_tpu.ops import pool
        x = jnp.asarray(_nhwc(rng, h=8, w=8))
        g = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
        gr = jax.vjp(max_pool_2d, x)[1](g)[0]
        gn = jax.vjp(pool._max_pool_2x2_eqsplit, x)[1](g)[0]
        np.testing.assert_array_equal(np.asarray(gr), np.asarray(gn))

    def test_tied_windows_conserve_cotangent(self, rng):
        from semantic_pyramid_for_image_generation_tpu.ops import pool
        x = jnp.asarray(np.round(_nhwc(rng, h=8, w=8) * 2) / 2)
        g = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
        gx = jax.vjp(pool._max_pool_2x2_eqsplit, x)[1](g)[0]
        sums = jax.lax.reduce_window(
            gx, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        np.testing.assert_allclose(np.asarray(sums), np.asarray(g), atol=1e-6)


class TestAlgebraicFolds:
    """Perf-mode algebraic rewrites must be numerically equivalent to the
    literal reference order (models/layers.py SNConv.fold_avg_pool and the
    generator residual commute)."""

    @pytest.mark.parametrize("ks,pad", [((3, 3), 1), ((1, 1), 0)])
    def test_snconv_pool_fold_matches_conv_then_pool(self, rng, ks, pad):
        from semantic_pyramid_for_image_generation_tpu.models.layers import SNConv
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 12)).astype(np.float32))
        plain = SNConv(10, kernel_size=ks, padding=pad, dtype=jnp.float32)
        folded = SNConv(10, kernel_size=ks, padding=pad, dtype=jnp.float32,
                        fold_avg_pool=True)
        variables = plain.init(jax.random.PRNGKey(0), x)
        y0 = avg_pool_2d(plain.apply(variables, x, mutable=["spectral"])[0], 2)
        y1 = folded.apply(variables, x, mutable=["spectral"])[0]
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-6)

    def test_conv1x1_commutes_with_upsample(self, rng):
        from semantic_pyramid_for_image_generation_tpu.models.layers import SNConv
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 12)).astype(np.float32))
        conv = SNConv(6, kernel_size=(1, 1), padding=0, dtype=jnp.float32)
        variables = conv.init(jax.random.PRNGKey(0), x)
        apply = lambda t: conv.apply(variables, t, mutable=["spectral"])[0]
        y0 = apply(upsample_bilinear_align_corners(x, 2))
        y1 = upsample_bilinear_align_corners(apply(x), 2)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-6)


class TestBatchedSigmaPass:
    """compute_sigma_tree must reproduce the inline per-layer spectral path
    exactly: same sigmas (same outputs) and same u/v trajectories — it is the
    train step's production path (train/step.py)."""

    def test_matches_inline_on_discriminator(self):
        from semantic_pyramid_for_image_generation_tpu.config import (
            PyramidGANConfig,
        )
        from semantic_pyramid_for_image_generation_tpu.models import (
            Discriminator,
        )
        from semantic_pyramid_for_image_generation_tpu.ops.spectral_norm import (
            compute_sigma_tree,
        )

        cfg = PyramidGANConfig().tiny()
        disc = Discriminator(cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(
            (2, cfg.image_size, cfg.image_size, 3)).astype(np.float32))
        y = jnp.asarray(np.eye(cfg.num_classes, dtype=np.float32)[[1, 5]])
        variables = disc.init(jax.random.key(0), x, y, train=False)
        params, spectral = variables["params"], variables["spectral"]

        out_inline, mut = disc.apply(
            {"params": params, "spectral": spectral}, x, y, train=True,
            mutable=["spectral"])
        sigmas, new_spectral = compute_sigma_tree(params, spectral,
                                                  update=True)
        out_batched = disc.apply(
            {"params": params, "spectral": spectral, "sigmas": sigmas},
            x, y, train=True)
        np.testing.assert_allclose(np.asarray(out_inline),
                                   np.asarray(out_batched), atol=1e-5)
        flat_a = jax.tree_util.tree_leaves_with_path(mut["spectral"])
        flat_b = {jax.tree_util.keystr(k): v for k, v in
                  jax.tree_util.tree_leaves_with_path(new_spectral)}
        assert len(flat_a) == len(flat_b)
        for path, leaf in flat_a:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_b[jax.tree_util.keystr(path)]),
                atol=1e-6, err_msg=jax.tree_util.keystr(path))

    def test_eval_mode_no_update(self):
        from semantic_pyramid_for_image_generation_tpu.ops.spectral_norm import (
            compute_sigma_tree,
            spectral_norm_weight,
        )

        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.standard_normal((4, 6)).astype(np.float32))
        u = jnp.asarray(rng.standard_normal(4).astype(np.float32))
        v = jnp.asarray(rng.standard_normal(6).astype(np.float32))
        params = {"layer": {"kernel": w.T}}  # dense: (in, out) -> w2d = W
        spectral = {"layer": {"u": u, "v": v}}
        sigmas, new_spec = compute_sigma_tree(params, spectral, update=False)
        sigma_ref, u_ref, v_ref = spectral_norm_weight(w, u, v, update=False)
        np.testing.assert_allclose(float(sigmas["layer"]["sigma"]),
                                   float(sigma_ref), atol=1e-6)
        np.testing.assert_allclose(np.asarray(new_spec["layer"]["u"]),
                                   np.asarray(u_ref), atol=1e-6)
