from semantic_pyramid_for_image_generation_tpu.data.masks import (  # noqa: F401
    MaskSchedule,
    get_masks_for_training,
    get_masks_for_validation,
    get_masks_for_inference,
)
