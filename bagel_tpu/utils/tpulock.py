"""Single-tenant TPU chip lock.

The tunneled v5e chip serves exactly one JAX client; a second concurrent
client (or a lingering probe process from an earlier session) wedges the
chip — the new client's first dispatch hangs for many minutes and the
wedge takes ~5 min to clear after the offender exits (NOTES r4). Round
4's bench recorded nothing for exactly this failure signature.

Protocol: every process that opens a TPU session takes the lock first
(`acquire`); the benchmark parent — whose budget is a hard driver
deadline — instead *clears* the lock (`clear_stale(kill=True)`): a live
holder is sent SIGTERM/SIGKILL **by its exact recorded pid** (never by
pattern) so no builder probe can linger into the driver's bench window.
"""

from __future__ import annotations

import json
import os
import sys
import time

LOCK_PATH = os.environ.get(
    "BAGEL_TPU_LOCK",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".tpu_lock"),
)


def _read():
    try:
        with open(LOCK_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _alive(pid: int) -> bool:
    if pid <= 0 or pid == os.getpid():
        return False
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


def acquire(tag: str = "", wait_s: float = 900.0, poll_s: float = 5.0) -> bool:
    """Take the lock, waiting up to wait_s for a live holder to finish.
    A dead holder's lock is stale and taken over immediately. Returns
    False (without touching the chip) on timeout."""
    deadline = time.monotonic() + wait_s
    while True:
        cur = _read()
        if cur is None or not _alive(int(cur.get("pid", -1))):
            try:
                with open(LOCK_PATH, "w") as f:
                    json.dump({"pid": os.getpid(), "tag": tag,
                               "t": time.time()}, f)
                return True
            except OSError:
                return True  # unwritable lock dir: proceed unguarded
        if time.monotonic() > deadline:
            print(f"# tpulock: holder pid={cur.get('pid')} "
                  f"tag={cur.get('tag')!r} still alive after {wait_s:.0f}s",
                  file=sys.stderr)
            return False
        time.sleep(poll_s)


def release() -> None:
    cur = _read()
    if cur and int(cur.get("pid", -1)) == os.getpid():
        try:
            os.remove(LOCK_PATH)
        except OSError:
            pass


def clear_stale(kill: bool = False, wait_s: float = 30.0) -> bool:
    """Benchmark-priority path: remove a stale lock; optionally terminate a
    LIVE holder by its exact recorded pid (SIGTERM, grace, SIGKILL) so the
    bench window starts with a quiet chip. Returns True when the lock is
    clear afterwards."""
    import signal

    cur = _read()
    if cur is None:
        return True
    pid = int(cur.get("pid", -1))
    if _alive(pid):
        if not kill:
            return False
        print(f"# tpulock: terminating lingering TPU client pid={pid} "
              f"tag={cur.get('tag')!r} (bench priority)", file=sys.stderr)
        try:
            os.kill(pid, signal.SIGTERM)
        except OSError:
            pass
        deadline = time.monotonic() + wait_s
        while _alive(pid) and time.monotonic() < deadline:
            time.sleep(1.0)
        if _alive(pid):
            try:
                os.kill(pid, signal.SIGKILL)
            except OSError:
                pass
            time.sleep(2.0)
    try:
        os.remove(LOCK_PATH)
    except OSError:
        pass
    return True
