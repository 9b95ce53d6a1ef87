"""Minimal production HTTP server over an exported serving artifact.

One command from `cli.export_serving`'s artifact directory to a generate
endpoint — stdlib-only (http.server + json + base64), no web framework. The
reference has no serving story at all (its inference lives inside the
training loop, /root/reference/model_wrapper.py:247-296); this plus the
hermetic artifact is the deploy path: export once, serve anywhere.

    python -m semantic_pyramid_for_image_generation_tpu.cli.serve \
        --artifact artifacts/generate --port 8000

API (JSON over HTTP):

    GET  /healthz   -> {"status": "ok", "batch_buckets": [...], ...}
    GET  /manifest  -> the artifact's manifest.json
    POST /generate  -> body {
        "image_b64":   base64 PNG/JPEG conditioning image (required),
        "level":       0..6 semantic level, deep->shallow (default 0),
        "class_id":    Places365 class for the projection/CBN conditioning
                       (default: the image's own fc8 argmax via the
                       artifact's classifier program, as cli/generate.py
                       does live),
        "num_samples": latents to draw (default 1; routed to the smallest
                       fitting batch bucket),
        "seed":        latent RNG seed (default 0),
    }                -> {"images": [base64 PNG, ...], "bucket": N,
                         "class_id": the class actually used}

Requests are serialized through one lock: the device runs one program at a
time anyway, and bucketing already batches the parallelism that matters.
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
from semantic_pyramid_for_image_generation_tpu.data.masks import MaskSchedule
from semantic_pyramid_for_image_generation_tpu.serving.export import (
    ServingArtifact,
)


def config_from_manifest(manifest: dict) -> PyramidGANConfig:
    """The manifest's `config` echo is exactly the dataclass's init fields
    (dataclasses.asdict), so it round-trips."""
    return PyramidGANConfig(**manifest["config"])


def decode_image_m11(data: bytes, size: int) -> np.ndarray:
    """PNG/JPEG bytes -> (size, size, 3) float32 in [-1, 1] (per-image
    min-max, the reference's data.py:53 semantics)."""
    from PIL import Image

    with Image.open(io.BytesIO(data)) as img:
        img = img.convert("RGB")
        if img.size != (size, size):
            img = img.resize((size, size), Image.BILINEAR)
        arr = np.asarray(img, dtype=np.float32) / 255.0
    mn, mx = float(arr.min()), float(arr.max())
    return (2.0 * (arr - mn) / max(mx - mn, 1e-12) - 1.0).astype(np.float32)


def encode_png(image_m11: np.ndarray) -> bytes:
    """(H, W, 3) float -> PNG bytes via per-image min-max to [0, 255]."""
    from PIL import Image

    mn, mx = float(image_m11.min()), float(image_m11.max())
    u8 = ((image_m11 - mn) / max(mx - mn, 1e-12) * 255.0 + 0.5).astype(
        np.uint8)
    buf = io.BytesIO()
    Image.fromarray(u8).save(buf, format="PNG")
    return buf.getvalue()


class GenerateService:
    """Request -> artifact call plumbing, independent of the HTTP layer."""

    def __init__(self, artifact: ServingArtifact):
        self.artifact = artifact
        self.config = config_from_manifest(artifact.manifest)
        self.schedule = MaskSchedule(self.config)
        self._lock = threading.Lock()

    def generate(self, request: dict) -> dict:
        if "image_b64" not in request:
            raise ValueError("missing required field 'image_b64'")
        level = int(request.get("level", 0))
        if not 0 <= level < len(self.config.mask_shapes):
            raise ValueError(f"level must be in [0, "
                             f"{len(self.config.mask_shapes) - 1}]: {level}")
        class_id = request.get("class_id")
        if class_id is not None and not (
                0 <= int(class_id) < self.config.num_classes):
            raise ValueError(f"class_id must be in [0, "
                             f"{self.config.num_classes - 1}]: {class_id}")
        n = int(request.get("num_samples", 1))
        if n < 1:
            raise ValueError(f"num_samples must be >= 1: {n}")
        bucket = self.artifact.bucket_for(n)  # raises if n exceeds buckets
        try:
            image = decode_image_m11(
                base64.b64decode(request["image_b64"]),
                self.config.image_size)
        except Exception as e:  # undecodable upload is a caller error
            raise ValueError(f"image_b64 did not decode to an image: {e}")

        images = np.broadcast_to(image, (n,) + image.shape)
        per_sample = self.schedule.inference_masks(level)
        masks = self.schedule.batch([per_sample] * n)
        if class_id is None:
            # auto-conditioning on the image's own fc8 prediction, the
            # cli/generate.py default (needs the classifier program)
            with self._lock:
                class_id = self.artifact.classify(image)
        class_id = int(class_id)
        labels = np.zeros((n, self.config.num_classes), np.float32)
        labels[:, class_id] = 1.0
        noise = np.random.default_rng(
            int(request.get("seed", 0))).standard_normal(
                (n, self.config.latent_dim)).astype(np.float32)

        with self._lock:
            fakes = np.asarray(
                self.artifact.generate(images, masks, labels, noise))
        return {
            "images": [base64.b64encode(encode_png(f)).decode("ascii")
                       for f in fakes],
            "bucket": bucket,
            "class_id": class_id,
        }


def make_handler(service: GenerateService):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path == "/healthz":
                m = service.artifact.manifest
                self._reply(200, {"status": "ok",
                                  "batch_buckets": m["batch_buckets"],
                                  "platforms": m["platforms"],
                                  "weights": m.get("weights", "baked")})
            elif self.path == "/manifest":
                self._reply(200, service.artifact.manifest)
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/generate":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                request = json.loads(self.rfile.read(length) or b"{}")
                self._reply(200, service.generate(request))
            except ValueError as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # surface, don't kill the server
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def serve_artifact(artifact_dir: str, host: str = "127.0.0.1",
                   port: int = 8000) -> ThreadingHTTPServer:
    """Build the server (not yet serving). Call .serve_forever() to run, or
    drive it from a thread in tests; .server_address has the bound port
    (pass port=0 for an ephemeral one)."""
    service = GenerateService(ServingArtifact(artifact_dir))
    return ThreadingHTTPServer((host, port), make_handler(service))
