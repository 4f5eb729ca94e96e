from alignnet3d_tpu.evaluation.metrics import (  # noqa: F401
    evaluate,
    evaluate_held,
    eval_translation,
    eval_angle,
    eval_transform,
)
