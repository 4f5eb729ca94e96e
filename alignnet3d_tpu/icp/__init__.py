from alignnet3d_tpu.icp.p2point import (  # noqa: F401
    icp_p2point_batch,
    refine_predictions,
    multistart_global_registration,
)
from alignnet3d_tpu.icp.p2plane import (  # noqa: F401
    icp_p2plane_batch,
    estimate_normals_batch,
)
from alignnet3d_tpu.icp.fpfh import fpfh_ransac_pair, fpfh_features  # noqa: F401
from alignnet3d_tpu.icp.runner import evaluate  # noqa: F401
