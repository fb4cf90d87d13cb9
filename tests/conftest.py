"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip code paths (pjit/GSPMD shardings) are validated without TPU
hardware via XLA's host-platform device-count override — the TPU-native
substitute for a distributed test harness (SURVEY.md §4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu"
# at interpreter start, overriding the env var — pin it back to cpu so the
# suite runs on the virtual 8-device host platform.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
