from alignnet3d_tpu.ops.angle_codec import (  # noqa: F401
    angle2class,
    class2angle,
    logits_to_angle,
    class_logits_to_angle_np,
    soft_angle_targets,
    jax_angle_diff,
)
from alignnet3d_tpu.ops.transforms import (  # noqa: F401
    rotation_matrix_z,
    rotate_points_z,
    transform_pcs,
)
