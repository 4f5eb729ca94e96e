from alignnet3d_tpu.utils.platform import force_cpu  # noqa: F401
