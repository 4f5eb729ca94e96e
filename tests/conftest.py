"""Test configuration: run everything on a virtual 8-device CPU mesh.

This substitutes for multi-chip TPU hardware (SURVEY.md §4): sharding and
collective behavior compile and execute identically on the CPU backend with
``xla_force_host_platform_device_count``.

NOTE: this box's sitecustomize pre-imports jax and registers the axon TPU
backend, so the JAX_PLATFORMS env var is NOT enough — the platform must be
forced via jax.config before first backend use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
