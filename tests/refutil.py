"""Import helpers for golden tests against the PyTorch reference.

The reference at /root/reference is used *only* as a numerical oracle on CPU
(its CUDA kernels are stubbed out). Nothing is copied from it.
"""

import importlib.machinery
import sys
import types

REFERENCE = "/root/reference"


def install_reference_path():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    if "flash_attn" not in sys.modules:
        fa = types.ModuleType("flash_attn")
        fa.flash_attn_varlen_func = None
        fa.__spec__ = importlib.machinery.ModuleSpec("flash_attn", None)
        sys.modules["flash_attn"] = fa


install_reference_path()
