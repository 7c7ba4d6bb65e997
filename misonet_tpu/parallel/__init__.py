from misonet_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_spec,
)
