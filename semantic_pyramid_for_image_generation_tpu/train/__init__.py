from semantic_pyramid_for_image_generation_tpu.train.losses import (  # noqa: F401
    semantic_reconstruction_loss,
    diversity_loss,
    lsgan_generator_loss,
    lsgan_discriminator_loss,
)
