"""Production serving: hermetic AOT export of the generation path.

`export.py` turns the jitted generate function (VGG pyramid -> masks ->
eval-mode Generator) into a self-contained StableHLO artifact via
`jax.export` — loadable on any jax host without this package's model code.
"""

from semantic_pyramid_for_image_generation_tpu.serving.export import (  # noqa: F401
    ServingArtifact,
    export_classify,
    export_generate,
    load_artifact,
    save_artifact,
)
