"""Serve an exported generation artifact over HTTP.

    python -m semantic_pyramid_for_image_generation_tpu.cli.serve \
        --artifact artifacts/generate --port 8000

    curl -s localhost:8000/healthz
    curl -s -X POST localhost:8000/generate -d '{
        "image_b64": "<base64 PNG/JPEG>", "level": 3, "class_id": 42,
        "num_samples": 4, "seed": 7}'

Endpoints and payload schema: serving/server.py. Export artifacts with
cli/export_serving.py. The reference has no serving entry point (inference
only exists inside its training loop, model_wrapper.py:247-296).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", type=str, required=True,
                   help="artifact directory from cli.export_serving")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--device", type=str, default="tpu")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from semantic_pyramid_for_image_generation_tpu.serving.server import (
        serve_artifact,
    )

    server = serve_artifact(args.artifact, args.host, args.port)
    host, port = server.server_address[:2]
    print(f"serving {args.artifact} on http://{host}:{port} "
          f"(endpoints: /healthz /manifest POST /generate)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
