from pharmaforge_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    pad_batch_to_multiple,
)
