from alignnet3d_tpu.data.provider import (  # noqa: F401
    getDataFiles,
    load_batch,
    load_from_separate_files,
    jitter_point_cloud,
    PackedDataset,
)
