"""Serving-export artifact: exported program == live generate, bucket routing.

The exported StableHLO program (serving/export.py) must reproduce the live
`make_generate_fn` path elementwise — same min-max normalize, VGG pyramid,
mask gating, eval-mode spectral sigmas — and survive a serialize ->
deserialize round trip, since that is the whole point of the artifact
(deploy without this package's model code). The reference has no export
path; its deploy story is re-instantiating torch modules from a pickle
(/root/reference/main.py:60-74, model_wrapper.py:215-223).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
from semantic_pyramid_for_image_generation_tpu.data.synthetic import (
    synthetic_batch,
)
from semantic_pyramid_for_image_generation_tpu.serving import (
    export_generate,
    load_artifact,
    save_artifact,
)
from semantic_pyramid_for_image_generation_tpu.train.state import (
    init_train_state,
    make_models,
    make_optimizers,
)
from semantic_pyramid_for_image_generation_tpu.train.step import (
    make_generate_fn,
)

CF = 8
WF = 8


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = PyramidGANConfig(channels_factor=CF, vgg_width_factor=WF)
    g_tx, d_tx = make_optimizers()
    state = init_train_state(jax.random.key(0), cfg, g_tx, d_tx)
    return cfg, state


def _example(cfg, batch):
    ex = synthetic_batch(cfg, batch, np.random.default_rng(1),
                         validation=True)
    noise = np.asarray(
        jax.random.normal(jax.random.key(7), (batch, cfg.latent_dim)),
        np.float32)
    return ex, noise


def test_exported_matches_live_generate(tiny_setup):
    cfg, state = tiny_setup
    ex, noise = _example(cfg, 2)

    generator, _, vgg = make_models(cfg)
    live = make_generate_fn(generator, vgg)(
        state, jnp.asarray(ex["images"]),
        tuple(jnp.asarray(m) for m in ex["masks"]),
        jnp.asarray(ex["labels"]), jax.random.key(0),
        noise=jnp.asarray(noise))

    exported = export_generate(state, cfg, batch_size=2)
    # serialize -> deserialize round trip, as a deployment would
    restored = jax.export.deserialize(bytearray(exported.serialize()))
    out = restored.call(
        jnp.asarray(ex["images"]),
        tuple(jnp.asarray(m, jnp.float32) for m in ex["masks"]),
        jnp.asarray(ex["labels"]), jnp.asarray(noise))

    np.testing.assert_allclose(np.asarray(out), np.asarray(live),
                               rtol=1e-5, atol=1e-5)


def test_multiplatform_export_runs_on_cpu(tiny_setup):
    """--platforms tpu,cpu artifacts lower both targets on any host and pick
    the live backend's branch at call time (jax.export multi-platform)."""
    cfg, state = tiny_setup
    ex, noise = _example(cfg, 1)
    exported = export_generate(state, cfg, batch_size=1,
                               platforms=("tpu", "cpu"))
    assert set(exported.platforms) == {"tpu", "cpu"}
    restored = jax.export.deserialize(bytearray(exported.serialize()))
    out = restored.call(
        jnp.asarray(ex["images"]),
        tuple(jnp.asarray(m, jnp.float32) for m in ex["masks"]),
        jnp.asarray(ex["labels"]), jnp.asarray(noise))
    assert np.isfinite(np.asarray(out)).all()


def test_http_server_generate_roundtrip(tmp_path, tiny_setup):
    """cli.serve's HTTP layer: export -> serve -> POST /generate returns
    decodable PNGs of the right geometry; /healthz reports the buckets;
    malformed requests get 400s, oversize batches too."""
    import base64
    import io
    import json
    import threading
    import urllib.request
    import urllib.error

    from PIL import Image

    from semantic_pyramid_for_image_generation_tpu.serving.server import (
        serve_artifact,
    )

    cfg, state = tiny_setup
    out_dir = str(tmp_path / "artifact")
    save_artifact(state, cfg, out_dir, batch_sizes=[2])

    server = serve_artifact(out_dir, port=0)  # ephemeral port
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{port}"
        health = json.loads(urllib.request.urlopen(
            f"{base}/healthz", timeout=30).read())
        assert health["status"] == "ok"
        assert health["batch_buckets"] == [2]

        buf = io.BytesIO()
        Image.fromarray(
            (np.random.default_rng(0).random((cfg.image_size, cfg.image_size,
                                              3)) * 255).astype(np.uint8)
        ).save(buf, format="PNG")
        body = json.dumps({
            "image_b64": base64.b64encode(buf.getvalue()).decode(),
            "level": 3, "class_id": 5, "num_samples": 1, "seed": 3,
        }).encode()
        reply = json.loads(urllib.request.urlopen(urllib.request.Request(
            f"{base}/generate", data=body, method="POST"),
            timeout=300).read())
        assert reply["bucket"] == 2
        assert reply["class_id"] == 5
        assert len(reply["images"]) == 1
        png = Image.open(io.BytesIO(base64.b64decode(reply["images"][0])))
        assert png.size == (cfg.image_size, cfg.image_size)

        # omit class_id -> auto-conditioning on the image's fc8 argmax
        body_auto = json.dumps({
            "image_b64": base64.b64encode(buf.getvalue()).decode(),
            "level": 0, "num_samples": 1, "seed": 3,
        }).encode()
        reply_auto = json.loads(urllib.request.urlopen(
            urllib.request.Request(f"{base}/generate", data=body_auto,
                                   method="POST"), timeout=300).read())
        assert 0 <= reply_auto["class_id"] < cfg.num_classes

        for bad in ({"level": 0},                      # missing image
                    {"image_b64": "aGk=", "num_samples": 99}):  # > bucket
            with pytest.raises(urllib.error.HTTPError) as err:
                urllib.request.urlopen(urllib.request.Request(
                    f"{base}/generate", data=json.dumps(bad).encode(),
                    method="POST"), timeout=30)
            assert err.value.code == 400
    finally:
        server.shutdown()
        thread.join(timeout=10)


def test_artifact_save_load_and_bucket_padding(tmp_path, tiny_setup):
    cfg, state = tiny_setup
    out_dir = str(tmp_path / "artifact")
    # default mode: external weights — KB programs + one shared weights.npz
    manifest = save_artifact(state, cfg, out_dir, batch_sizes=[2, 4])
    assert manifest["batch_buckets"] == [2, 4]
    assert manifest["weights"] == "external"
    assert (tmp_path / "artifact" / "weights.npz").exists()
    import os
    assert os.path.getsize(
        str(tmp_path / "artifact" / "generate_b2.jaxexp")) < 2_000_000, \
        "external-weights program should be small (no baked constants)"

    art = load_artifact(out_dir)
    assert art.bucket_for(1) == 2
    assert art.bucket_for(3) == 4
    with pytest.raises(ValueError):
        art.bucket_for(5)

    # batch 3 routes to the 4-bucket: padded rows must not leak into outputs
    ex, noise = _example(cfg, 3)
    out3 = np.asarray(art.generate(ex["images"], ex["masks"], ex["labels"],
                                   noise))
    assert out3.shape == (3, cfg.image_size, cfg.image_size,
                          cfg.out_channels)

    generator, _, vgg = make_models(cfg)
    live = make_generate_fn(generator, vgg)(
        state, jnp.asarray(ex["images"]),
        tuple(jnp.asarray(m) for m in ex["masks"]),
        jnp.asarray(ex["labels"]), jax.random.key(0),
        noise=jnp.asarray(noise))
    np.testing.assert_allclose(out3, np.asarray(live), rtol=1e-5, atol=1e-5)

    # companion classifier program == live VGG fc8 argmax
    live_logits = np.asarray(vgg.apply(
        {"params": state.vgg_params}, jnp.asarray(ex["images"][:1]))[-1])
    assert art.classify(ex["images"][0]) == int(live_logits[0].argmax())
