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

import os

import numpy as np
import pytest

# The `quick` tier: the load-bearing core-parity + parallelism/serving
# subset (golden parity vs the torch reference; every multi-device path on
# the virtual 8-mesh). `pytest -m quick` runs in <10 min on this 1-core
# host; everything else is the full tier (`pytest tests/`, ~30 min).
_QUICK_FILES = {
    # golden parity vs the reference (inference/denoise/integration/...)
    "test_inference_parity.py",
    "test_denoise_parity.py",
    "test_bagel_integration.py",
    "test_taylorseer.py",
    "test_speculative.py",
    # parallelism + serving on the 8-device CPU mesh
    "test_expert.py",
    "test_pipeline.py",
    "test_ring.py",
    "test_sharded_inference.py",
    "test_multihost_serving.py",
    "test_serving_runtime.py",
    "test_chat_batch.py",
    "test_kv_quant.py",
    # headline-dtype fidelity gate (w8a8 / int8 KV end-to-end)
    "test_fidelity_w8a8.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _QUICK_FILES:
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
