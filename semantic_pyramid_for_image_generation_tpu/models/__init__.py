from semantic_pyramid_for_image_generation_tpu.models.layers import (  # noqa: F401
    SNConv,
    SNDense,
    SNEmbedding,
    ConditionalBatchNorm,
    BatchNorm,
    SelfAttention,
    GeneratorResidualBlock,
    LinearBlock,
    DiscriminatorInputResidualBlock,
    DiscriminatorResidualBlock,
)
from semantic_pyramid_for_image_generation_tpu.models.generator import Generator  # noqa: F401
from semantic_pyramid_for_image_generation_tpu.models.discriminator import (  # noqa: F401
    Discriminator,
)
from semantic_pyramid_for_image_generation_tpu.models.vgg16 import VGG16  # noqa: F401
