"""Test config: run everything on a simulated 8-device CPU mesh.

The reference has no testing infrastructure at all (SURVEY.md §4); here every
unit runs on CPU JAX and multi-chip sharding is validated via
xla_force_host_platform_device_count — the capability the torch reference
lacks entirely.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
