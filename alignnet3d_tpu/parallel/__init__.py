from alignnet3d_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    state_shardings,
    leaf_pspec,
)
