from alignnet3d_tpu.models.alignnet import AlignNet, ModelSpec  # noqa: F401
from alignnet3d_tpu.models.losses import get_loss, LossSpec  # noqa: F401
