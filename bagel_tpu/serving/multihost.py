"""Multi-host request routing for the continuous-batching runtime.

The reference serves from a single process (app.py builds the model with
`device_map` over local GPUs and runs Gradio callbacks in-process:
/root/reference/app.py:75-113,205-246). On a TPU pod slice the weights and
the slot KV cache are GSPMD-sharded over a multi-process mesh, and XLA's
single-program model requires EVERY process to issue the SAME jitted calls
in the SAME order — but clients only talk to one frontend.

The TPU-native design exploits a property the scheduler was built with
(`ServingRuntime._tick`): a tick is deterministic given (a) the request
queues at entry and (b) device outputs. (b) is identical on every process
(same global computation on the same sharded state), so multi-host serving
reduces to replicating (a). The leader (process 0) stages client requests,
broadcasts the staged ingress batch before every tick, and all processes —
leader included — then run the identical tick body in lockstep. No RPC
layer, no per-request routing table: two `broadcast_one_to_all` collectives
per tick carry the whole control plane over the JAX distributed runtime.

Usage (every process runs the same program):

    frontend = serve_multihost(engine, slots=8, mesh=mesh)
    frontend.start()
    if frontend.leader:          # process 0: accept traffic
        serve(frontend, port=8000)   # serving/server.py HTTP API
    else:                         # followers tick until the leader stops
        frontend.join()
    frontend.stop()

Streaming callbacks (`on_tokens`) fire on the leader only — followers run
the same decode chunks but hold dummy futures nobody reads.
"""

from __future__ import annotations

import pickle
import queue
import threading
from typing import List, Optional

import numpy as np

from bagel_tpu.serving.runtime import (Future, ServingRuntime, _ChatRequest,
                                       _GenRequest)


class LocalBus:
    """In-memory leader->followers fanout. Single-host deployments and the
    lockstep-determinism tests use it; a real pod uses JaxHostBus."""

    def __init__(self, n_followers: int = 0):
        self._qs = [queue.Queue() for _ in range(n_followers)]

    def send(self, payload: bytes):
        for q in self._qs:
            q.put(payload)

    def recv(self, follower_idx: int = 0) -> bytes:
        return self._qs[follower_idx].get()


class JaxHostBus:
    """Leader->all broadcast over the JAX distributed runtime.

    `broadcast_one_to_all` needs same-shaped operands on every process, so a
    variable-length pickle travels in two phases: an int64 length, then a
    uint8 buffer of that length (followers contribute zeros placeholders).
    """

    def send(self, payload: bytes):
        from jax.experimental import multihost_utils as mhu

        buf = np.frombuffer(payload, np.uint8)
        mhu.broadcast_one_to_all(np.int64(buf.size))
        if buf.size:
            mhu.broadcast_one_to_all(buf)

    def recv(self, follower_idx: int = 0) -> bytes:
        from jax.experimental import multihost_utils as mhu

        n = int(mhu.broadcast_one_to_all(np.int64(0)))
        if n == 0:
            return b""
        return np.asarray(
            mhu.broadcast_one_to_all(np.zeros(n, np.uint8))
        ).tobytes()


def _pack_chat(req: _ChatRequest) -> tuple:
    return ("chat", req.prompt, req.image, req.max_new_tokens)


def _pack_gen(req: _GenRequest) -> tuple:
    return ("gen", req.kwargs)


def _unpack(rec: tuple):
    if rec[0] == "chat":
        return _ChatRequest(rec[1], rec[2], rec[3], Future())
    return _GenRequest(rec[1], Future())


class MultiHostFrontend:
    """Lockstep driver around a ServingRuntime.

    Leader: `submit_chat` / `submit_generate` stage requests; the drive loop
    broadcasts `(staged, stop)` then runs `runtime._tick()`. Followers:
    receive, enqueue the same requests (dummy futures), run the same tick.
    Every process executes the identical jitted-call sequence, so the
    GSPMD-sharded cache and weights stay coherent without any other
    synchronization.
    """

    def __init__(self, runtime: ServingRuntime, bus=None, leader: bool = True,
                 follower_idx: int = 0, idle_wait: float = 0.05):
        self.runtime = runtime
        self.bus = bus
        self.leader = leader
        self.follower_idx = follower_idx
        self.idle_wait = idle_wait
        self._staged: List[tuple] = []
        self._staged_reqs: List[object] = []
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._wake = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # -- client API (leader only) -------------------------------------------

    def submit_chat(self, prompt: str, image=None,
                    max_new_tokens: Optional[int] = None,
                    on_tokens=None) -> Future:
        assert self.leader, "followers take no client traffic"
        req = _ChatRequest(prompt, image,
                           max_new_tokens or self.runtime.max_new_default,
                           Future(), on_tokens)
        with self._lock:
            self._staged.append(_pack_chat(req))
            self._staged_reqs.append(req)
        self._wake.set()
        return req.future

    def submit_generate(self, prompt: Optional[str] = None, image=None,
                        **kwargs) -> Future:
        assert self.leader, "followers take no client traffic"
        kw = dict(kwargs)
        if prompt is not None:
            kw["text"] = prompt
        if image is not None:
            kw["image"] = image
        req = _GenRequest(kw, Future())
        with self._lock:
            self._staged.append(_pack_gen(req))
            self._staged_reqs.append(req)
        self._wake.set()
        return req.future

    @property
    def stats(self):
        return self.runtime.stats

    # the HTTP server (serving/server.py) reads these off its runtime for
    # /v1/stats and tokenizer access — delegate so `serve(frontend)` works
    @property
    def engine(self):
        return self.runtime.engine

    @property
    def slots(self):
        return self.runtime.slots

    @property
    def slot_state(self):
        return self.runtime.slot_state

    @property
    def chat_q(self):
        return self.runtime.chat_q

    @property
    def gen_q(self):
        return self.runtime.gen_q

    # -- lifecycle ------------------------------------------------------------

    def start(self):
        assert self._thread is None
        self._thread = threading.Thread(target=self._drive, daemon=True)
        self._thread.start()

    def stop(self, timeout: float = 60.0):
        self._stop.set()
        self._wake.set()
        self.join(timeout)

    def join(self, timeout: Optional[float] = None):
        if self._thread is not None:
            self._thread.join(timeout)
            self._thread = None

    # -- lockstep loop ---------------------------------------------------------

    def _enqueue(self, packed: List[tuple], reqs: Optional[List[object]]):
        rt = self.runtime
        for i, rec in enumerate(packed):
            req = reqs[i] if reqs is not None else _unpack(rec)
            (rt.chat_q if rec[0] == "chat" else rt.gen_q).put(req)

    def _drive(self):
        rt = self.runtime
        while True:
            if self.leader:
                with self._lock:
                    packed, reqs = self._staged, self._staged_reqs
                    self._staged, self._staged_reqs = [], []
                stop = self._stop.is_set()
                if self.bus is not None:
                    self.bus.send(pickle.dumps((packed, stop)))
                self._enqueue(packed, reqs)
            else:
                packed, stop = pickle.loads(self.bus.recv(self.follower_idx))
                self._enqueue(packed, None)
            if stop:
                rt._drain()
                return
            busy = rt._tick()
            # leader throttles empty ticks; followers stay blocked in recv()
            # until the leader's next broadcast, so they never spin
            if self.leader and not busy and rt.chat_q.empty():
                with self._lock:
                    idle = not self._staged
                if idle:
                    self._wake.wait(timeout=self.idle_wait)
                    self._wake.clear()


def serve_multihost(engine, bus=None, **runtime_kwargs) -> MultiHostFrontend:
    """Build the lockstep frontend for this process. In a multi-process JAX
    deployment (jax.distributed.initialize already called, weights sharded
    over a global mesh) process 0 is the leader; single-process falls back
    to a plain leader with no bus (zero overhead vs ServingRuntime)."""
    import jax

    n = jax.process_count()
    rt = ServingRuntime(engine, **runtime_kwargs)
    if n == 1:
        return MultiHostFrontend(rt, bus=bus, leader=True)
    return MultiHostFrontend(rt, bus=bus or JaxHostBus(),
                             leader=jax.process_index() == 0)
