"""Source-hash-keyed on-demand builds for the native helper libraries.

Binaries are never committed (unauditable, and a foreign-host -march=native
build can SIGILL on first call). Each library builds on first use into
``lib<name>-<srchash>.so`` — the source hash in the filename guarantees the
loaded binary matches the checked-in source and was compiled on THIS host.
Callers degrade to pure-Python fallbacks when no toolchain is available.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
from typing import Optional, Sequence


def build_library(src: str, name: str,
                  extra_flags: Sequence[str] = ()) -> Optional[str]:
    """Compile `src` into a source-hashed .so next to it; returns the path,
    or None when g++/deps are unavailable. Reuses an existing binary only
    when its embedded hash matches the current source bytes."""
    src_dir = os.path.dirname(os.path.abspath(src))
    try:
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
    except OSError:
        return None
    lib_path = os.path.join(src_dir, f"lib{name}-{digest}.so")
    if os.path.exists(lib_path):
        return lib_path
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
             "-o", lib_path, *extra_flags],
            check=True, capture_output=True,
        )
    except (OSError, subprocess.CalledProcessError):
        return None
    # drop stale builds of older source revisions
    prefix = f"lib{name}-"
    for entry in os.listdir(src_dir):
        if (entry.startswith(prefix) and entry.endswith(".so")
                and entry != os.path.basename(lib_path)):
            try:
                os.remove(os.path.join(src_dir, entry))
            except OSError:
                pass
    return lib_path
