from pharmaforge_tpu.data.batch import (
    PharmComplexBatch,
    pad_to,
    collate_complexes,
    tile_pocket,
    bucket_size,
)
