from clsurvey_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    get_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    set_mesh,
)
