"""Platform helpers.

On hosts where a TPU plugin is pre-registered via sitecustomize (jax is
already imported before user code runs), the JAX_PLATFORMS env var is
ineffective; the platform must be forced through jax.config before the
first backend use.
"""

from __future__ import annotations

import os


def force_cpu(num_devices: int | None = None) -> None:
    """Force the CPU backend, optionally with N virtual devices.

    Must be called before any JAX computation runs. ``num_devices`` only
    takes effect if the CPU client has not initialized yet.
    """
    if num_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={num_devices}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
