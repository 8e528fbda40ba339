"""HTTP serving API (serving/server.py): endpoints over the
continuous-batching runtime, parity with direct submission, error paths."""

import base64
import http.client
import io
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bagel_tpu.configs import tiny_bagel
from bagel_tpu.data.tokenizer import MockTokenizer
from bagel_tpu.data.transforms import ImageTransform
from bagel_tpu.inference.engine import BagelEngine
from bagel_tpu.models.bagel import init_bagel_params
from bagel_tpu.serving.runtime import ServingRuntime
from bagel_tpu.serving.server import BagelServer, serve_in_thread


@pytest.fixture(scope="module")
def stack():
    cfg = tiny_bagel()
    tok = MockTokenizer(cfg.llm.vocab_size)
    params = init_bagel_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    params["llm"]["lm_head"]["w"] = params["llm"]["lm_head"]["w"] * 8.0
    engine = BagelEngine(params, cfg, tok, tok.new_token_ids, max_kv=512)
    rt = ServingRuntime(engine, slots=2, decode_chunk=3, max_new_default=6)
    rt.start()
    vae_tf = ImageTransform(64, 16, cfg.latent_downsample,
                            max_pixels=64 * 64)
    vit_tf = ImageTransform(56, 28, cfg.vit.patch_size, max_pixels=56 * 56)
    httpd, thread = serve_in_thread(BagelServer(rt, vae_tf, vit_tf))
    host, port = httpd.server_address
    yield engine, rt, host, port
    httpd.shutdown()
    rt.stop()


def _request(host, port, method, path, body=None, timeout=600):
    conn = http.client.HTTPConnection(host, port, timeout=timeout)
    try:
        conn.request(method, path,
                     body=json.dumps(body) if body is not None else None,
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        return resp.status, json.loads(resp.read())
    finally:
        conn.close()


def _png_b64(arr: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def test_healthz_and_stats(stack):
    _, rt, host, port = stack
    status, body = _request(host, port, "GET", "/healthz")
    assert status == 200 and body == {"ok": True}
    status, body = _request(host, port, "GET", "/v1/stats")
    assert status == 200
    assert body["slots"] == 2 and "tokens_out" in body


def test_chat_parity_with_direct_submit(stack):
    engine, rt, host, port = stack
    status, body = _request(
        host, port, "POST", "/v1/chat",
        {"prompt": "what is this?", "max_tokens": 5},
    )
    assert status == 200
    want = rt.submit_chat("what is this?", max_new_tokens=5).result(
        timeout=600
    )
    assert body["text"] == want


def test_chat_with_image(stack):
    _, _, host, port = stack
    rng = np.random.default_rng(0)
    img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    status, body = _request(
        host, port, "POST", "/v1/chat",
        {"prompt": "describe", "image": _png_b64(img), "max_tokens": 4},
    )
    assert status == 200 and isinstance(body["text"], str)


def test_chat_with_multiple_images(stack):
    """'images' list rides the runtime's interleaved multi-image prefill
    and matches the engine's chat_batch on the same (images, prompt) row."""
    engine, _, host, port = stack
    rng = np.random.default_rng(1)
    raw = [(rng.random((40, 40, 3)) * 255).astype(np.uint8)
           for _ in range(2)]
    status, body = _request(
        host, port, "POST", "/v1/chat",
        {"prompt": "compare these", "images": [_png_b64(x) for x in raw],
         "max_tokens": 5},
    )
    assert status == 200 and isinstance(body["text"], str)
    vit_tf = ImageTransform(56, 28, engine.cfg.vit.patch_size,
                            max_pixels=56 * 56)
    from bagel_tpu.data.transforms import pil_img2rgb
    from PIL import Image

    imgs = [vit_tf(pil_img2rgb(Image.fromarray(x))) for x in raw]
    want = engine.chat_batch([imgs], ["compare these"], max_length=5)[0]
    assert body["text"] == want


def test_generate_returns_png(stack):
    from PIL import Image

    _, _, host, port = stack
    status, body = _request(
        host, port, "POST", "/v1/generate",
        {"prompt": "a thing", "image_size": 64, "num_timesteps": 3,
         "cfg_text_scale": 1.0, "cfg_img_scale": 1.0, "seed": 0},
    )
    assert status == 200
    img = Image.open(io.BytesIO(base64.b64decode(body["image"])))
    assert img.size == (64, 64) and body["shape"] == [64, 64]


def test_error_paths(stack):
    _, _, host, port = stack
    status, body = _request(host, port, "POST", "/v1/chat", {})
    assert status == 400 and "prompt" in body["error"]
    status, _ = _request(host, port, "GET", "/nope")
    assert status == 404
    # malformed json body
    conn = http.client.HTTPConnection(host, port, timeout=60)
    try:
        conn.request("POST", "/v1/chat", body="{not json",
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
    finally:
        conn.close()


def test_concurrent_chats_share_batch(stack):
    """Two simultaneous HTTP chats must both complete (continuous batching
    across connection threads)."""
    import threading

    _, rt, host, port = stack
    before = rt.stats["chat_done"]
    results = {}

    def go(i):
        results[i] = _request(host, port, "POST", "/v1/chat",
                              {"prompt": f"q{i}", "max_tokens": 4})

    threads = [threading.Thread(target=go, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert all(results[i][0] == 200 for i in range(2))
    assert rt.stats["chat_done"] >= before + 2


def test_chat_think_mode(stack):
    """think=true routes through the exclusive-job queue
    (engine understanding with the think system prompt)."""
    _, _, host, port = stack
    status, body = _request(
        host, port, "POST", "/v1/chat",
        {"prompt": "why?", "think": True, "max_tokens": 8},
    )
    assert status == 200 and isinstance(body["text"], str)


def test_chat_streaming(stack):
    """stream=true returns chunked NDJSON: text_delta events whose
    concatenation equals the final done event's text."""
    _, rt, host, port = stack
    conn = http.client.HTTPConnection(host, port, timeout=600)
    try:
        conn.request("POST", "/v1/chat",
                     body=json.dumps({"prompt": "stream me",
                                      "max_tokens": 6, "stream": True}),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "application/x-ndjson"
        events = [json.loads(line) for line in resp.read().splitlines()
                  if line.strip()]
    finally:
        conn.close()
    assert events[-1].get("done") is True
    deltas = [e["text_delta"] for e in events[:-1]]
    assert len(deltas) >= 2  # decode_chunk=3, max_tokens=6 -> >=2 chunks
    assert "".join(deltas) == events[-1]["text"]
    want = rt.submit_chat("stream me", max_new_tokens=6).result(timeout=600)
    assert events[-1]["text"] == want


def test_chat_streaming_missing_prompt_is_400(stack):
    _, _, host, port = stack
    status, body = _request(host, port, "POST", "/v1/chat",
                            {"stream": True})
    assert status == 400 and "prompt" in body["error"]
