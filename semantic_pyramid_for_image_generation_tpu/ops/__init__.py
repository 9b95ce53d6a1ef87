from semantic_pyramid_for_image_generation_tpu.ops.spectral_norm import (  # noqa: F401
    l2_normalize,
    spectral_norm_weight,
)
from semantic_pyramid_for_image_generation_tpu.ops.resize import (  # noqa: F401
    upsample_bilinear_align_corners,
    resize_bilinear_half_pixel,
    interpolate_nearest,
)
from semantic_pyramid_for_image_generation_tpu.ops.pool import (  # noqa: F401
    max_pool_2d,
    avg_pool_2d,
    max_pool_1d,
    adaptive_avg_pool_2d,
    global_avg_pool,
)
