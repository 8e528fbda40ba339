"""JaxHostBus over a REAL 2-process jax.distributed runtime (CPU backend).

test_multihost_serving.py proves the lockstep replay contract over an
in-memory bus; this test proves the wire: two OS processes join a
`jax.distributed` cluster, process 0 serves as the leader (accepting
client traffic and broadcasting the ingress batch via
`multihost_utils.broadcast_one_to_all`), process 1 ticks in lockstep from
the broadcasts alone. Replaces the reference's single-process serving
assumption (app.py:75-113) with the pod-slice control plane at the actual
process boundary.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys

port, pid = sys.argv[1], int(sys.argv[2])

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2

import jax.numpy as jnp

from bagel_tpu.configs import tiny_bagel
from bagel_tpu.data.tokenizer import MockTokenizer
from bagel_tpu.inference.engine import BagelEngine
from bagel_tpu.models.bagel import init_bagel_params
from bagel_tpu.serving.multihost import serve_multihost

# identical deterministic weights on both processes (a real deployment
# GSPMD-shards one copy; replication is the 1-device-per-process analogue)
cfg = tiny_bagel()
tok = MockTokenizer(cfg.llm.vocab_size)
params = init_bagel_params(jax.random.PRNGKey(0), cfg, jnp.float32)
params["llm"]["lm_head"]["w"] = params["llm"]["lm_head"]["w"] * 8.0
engine = BagelEngine(params, cfg, tok, tok.new_token_ids, max_kv=512)

fe = serve_multihost(engine, slots=2, decode_chunk=3, max_new_default=6)
assert fe.leader == (pid == 0)
fe.start()
if fe.leader:
    prompts = ["what is this?", "just text", "third request"]
    futs = [fe.submit_chat(p) for p in prompts]
    got = [f.result(timeout=600) for f in futs]
    for p, g in zip(prompts, got):
        ctx = engine.init_context()
        ctx = engine.update_context_text(p, ctx)
        ref = engine.gen_text(ctx, max_length=6)
        assert g == ref, (p, g, ref)
    fe.stop()
else:
    fe.join(timeout=600)
print(f"RANK{pid}_OK chat_done={fe.stats['chat_done']}", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("BAGEL_SKIP_DISTRIBUTED") == "1",
    reason="distributed smoke disabled",
)
def test_two_process_jaxhostbus(tmp_path):
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    # Keep the socket bound (SO_REUSEADDR) until just before launch to
    # shrink the claim-before-coordinator-binds race window.
    sock = socket.socket()
    sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # worker.py lives in tmp_path, so the script dir — not cwd — lands on
    # sys.path; the package import needs the repo root on PYTHONPATH.
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    sock.close()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo_root,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-3000:]}"
    # both ranks completed the identical schedule
    assert "RANK0_OK chat_done=3" in outs[0], outs[0][-2000:]
    assert "RANK1_OK chat_done=3" in outs[1], outs[1][-2000:]
