"""Test config: run everything on a simulated 8-device CPU mesh.

NOTE: in this environment the JAX_PLATFORMS env var is overridden by the
preinstalled TPU plugin — the programmatic config below is the only
override that sticks. Without it, tests silently run on the tunneled TPU.

The reference has no testing infrastructure at all (SURVEY.md §4); here every
unit runs on CPU JAX and multi-chip sharding is validated via a virtual
8-device CPU mesh — a capability the torch reference lacks entirely.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
