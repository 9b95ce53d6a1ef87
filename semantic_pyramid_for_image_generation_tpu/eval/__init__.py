from semantic_pyramid_for_image_generation_tpu.eval.fid import (  # noqa: F401
    fid_from_statistics,
    fid_from_activations,
    FIDEvaluator,
)
