from alignnet3d_tpu.training.trainer import Trainer  # noqa: F401
from alignnet3d_tpu.training.schedules import learning_rate, bn_decay  # noqa: F401
