"""Platform helpers.

On hosts where a TPU plugin is pre-registered via sitecustomize (jax is
already imported before user code runs), the JAX_PLATFORMS env var is
ineffective; the platform must be forced through jax.config before the
first backend use.
"""

from __future__ import annotations

import os
import re


def jax_backend_initialized() -> bool:
    """True if any JAX backend client has already been created.

    Once a backend exists, platform switches (``jax.config.update``,
    ``JAX_PLATFORMS``) are inert for this process — callers that need a
    different platform/device count must re-exec in a clean subprocess.
    """
    try:
        from jax._src import xla_bridge

        return bool(xla_bridge._backends)
    except Exception:  # pragma: no cover - private API moved
        return False


def force_cpu(num_devices: int | None = None) -> None:
    """Force the CPU backend, optionally with N virtual devices.

    Must be called before any JAX computation runs. ``num_devices`` only
    takes effect if the CPU client has not initialized yet; an existing
    ``xla_force_host_platform_device_count`` flag is raised (never
    lowered) to the requested count.
    """
    if num_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        m = re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
        if m is None:
            flags = (
                flags + f" --xla_force_host_platform_device_count={num_devices}"
            ).strip()
        elif int(m.group(1)) < num_devices:
            flags = (
                flags[: m.start()]
                + f"--xla_force_host_platform_device_count={num_devices}"
                + flags[m.end() :]
            )
        os.environ["XLA_FLAGS"] = flags
    import jax

    jax.config.update("jax_platforms", "cpu")
