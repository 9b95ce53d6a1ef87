from semantic_pyramid_for_image_generation_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    FSDP_AXIS,
    make_mesh,
    batch_sharding,
    fsdp_spec,
    replicated_sharding,
    shard_batch,
    shard_state,
)
