"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip code paths (pjit/GSPMD shardings) are validated without TPU
hardware via XLA's host-platform device-count override — the TPU-native
substitute for a distributed test harness (SURVEY.md §4).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
