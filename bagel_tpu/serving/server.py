"""HTTP serving API over the continuous-batching runtime.

The reference serves through a Gradio UI only (app.py:146-613). Production
deployment needs a programmatic surface: this module exposes the
`ServingRuntime` scheduler (serving/runtime.py — slot-batched KV cache,
chunked decode, mixed und/gen scheduling) over plain HTTP using only the
standard library, so a reference user migrating here gets an API endpoint
the original never had without adding a framework dependency.

Endpoints (JSON in / JSON out; images are base64-encoded PNG):

  GET  /healthz      -> {"ok": true}
  GET  /v1/stats     -> runtime counters + slot occupancy
  POST /v1/chat      {"prompt", "image"? | "images"? (list),
                      "max_tokens"?}                             -> {"text"}
  POST /v1/generate  {"prompt", "image"? (edit), "image_size"?,
                      "num_timesteps"?, "cfg_text_scale"?,
                      "cfg_img_scale"?, "cfg_renorm_type"?, "seed"?}
                                                               -> {"image"}

Requests run concurrently: the ThreadingHTTPServer hands each connection a
thread that enqueues into the runtime and blocks on its Future, so chat
requests from many clients share decode chunks (continuous batching) while
generate jobs interleave between chunks.

  python -m bagel_tpu.serving.server --checkpoint /path/to/BAGEL-7B-MoT \
      [--mesh 1,8,1] [--quant w8a8] [--slots 16] [--port 8000]
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

_GEN_KEYS = {
    "image_size", "num_timesteps", "cfg_text_scale", "cfg_img_scale",
    "cfg_interval", "cfg_renorm_type", "cfg_renorm_min", "timestep_shift",
}


class BagelServer:
    """Owns the runtime + transforms and translates HTTP payloads."""

    def __init__(self, runtime, vae_tf, vit_tf,
                 request_timeout: float = 3600.0):
        self.runtime = runtime
        self.vae_tf = vae_tf
        self.vit_tf = vit_tf
        self.request_timeout = request_timeout

    # -- payload translation -------------------------------------------------

    def _decode_image(self, b64: str, transform) -> np.ndarray:
        from PIL import Image

        from bagel_tpu.data.transforms import pil_img2rgb

        img = Image.open(io.BytesIO(base64.b64decode(b64)))
        return transform(pil_img2rgb(img))

    @staticmethod
    def _encode_image(arr: np.ndarray) -> str:
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode("ascii")

    def _chat_images(self, body: dict):
        """'image' (one b64 PNG) or 'images' (list) -> runtime image arg.
        Multi-image requests map to the interleaved-chat prefill shape:
        each image is its own non-causal block advancing rope by 1
        (runtime._prefill_rows; reference bagel.py:1004-1055)."""
        if body.get("images"):
            return [self._decode_image(b, self.vit_tf)
                    for b in body["images"]]
        if body.get("image"):
            return self._decode_image(body["image"], self.vit_tf)
        return None

    def chat(self, body: dict) -> dict:
        prompt = body.get("prompt")
        if not prompt:
            raise ValueError("'prompt' is required")
        image = self._chat_images(body)
        if body.get("think"):
            # think-mode decodes one session at a time — route through the
            # runtime's exclusive-job queue (engine.__call__ understanding)
            if isinstance(image, list):
                if len(image) != 1:
                    raise ValueError("think mode supports a single image")
                image = image[0]
            fut = self.runtime.submit_generate(
                prompt, image=image, understanding_output=True, think=True,
                max_think_token_n=body.get("max_tokens") or 512,
            )
            return {"text": fut.result(timeout=self.request_timeout)["text"]}
        fut = self.runtime.submit_chat(
            prompt, image=image, max_new_tokens=body.get("max_tokens"),
        )
        return {"text": fut.result(timeout=self.request_timeout)}

    def chat_stream_events(self, body: dict):
        """Generator of NDJSON events for a streaming chat: {"text_delta"}
        per decode chunk, then {"done": true, "text": full}. Token ids are
        forwarded from the scheduler thread through a queue so a slow
        client never blocks the decode loop."""
        import queue as _q

        prompt = body.get("prompt")
        if not prompt:
            raise ValueError("'prompt' is required")
        if body.get("think"):
            # think mode runs on the exclusive queue with no token hook —
            # degrade to a single final event
            yield {"done": True, "text": self.chat(body)["text"]}
            return
        image = self._chat_images(body)
        chunks: "_q.Queue[list]" = _q.Queue()
        # the callback runs on the runtime's scheduler thread — keep it to
        # an enqueue; decoding happens here on the handler thread
        fut = self.runtime.submit_chat(
            prompt, image=image, max_new_tokens=body.get("max_tokens"),
            on_tokens=chunks.put,
        )
        import time as _time

        tok = self.runtime.engine.tokenizer
        produced: list = []
        seen = ""

        def drain(ids):
            nonlocal seen
            produced.extend(ids)
            text = tok.decode(produced)
            if len(text) > len(seen):
                delta, seen = text[len(seen):], text
                return {"text_delta": delta}
            return None

        deadline = _time.monotonic() + self.request_timeout
        while True:
            try:
                ev = drain(chunks.get(timeout=0.05))
                if ev:
                    yield ev
            except _q.Empty:
                if fut.done():
                    break
                if _time.monotonic() > deadline:
                    raise TimeoutError("stream timed out")
        while not chunks.empty():
            ev = drain(chunks.get_nowait())
            if ev:
                yield ev
        yield {"done": True, "text": fut.result(timeout=5)}

    def generate(self, body: dict) -> dict:
        import jax

        kw = {k: body[k] for k in _GEN_KEYS if k in body}
        size = kw.pop("image_size", None)
        if size is not None:
            hw = (size, size) if isinstance(size, int) else tuple(size)
            kw["image_shapes"] = hw
        if "seed" in body:
            kw["rng"] = jax.random.PRNGKey(int(body["seed"]))
        image = None
        if body.get("image"):  # edit mode: source image through the VAE path
            image = self._decode_image(body["image"], self.vae_tf)
            # the reference edit path defaults to text_channel renorm
            # (inferencer.py:215-225)
            kw.setdefault("cfg_renorm_type", "text_channel")
        fut = self.runtime.submit_generate(
            body.get("prompt"), image=image, **kw,
        )
        out = fut.result(timeout=self.request_timeout)
        arr = out["image"] if isinstance(out, dict) else out
        return {"image": self._encode_image(np.asarray(arr)),
                "shape": list(np.asarray(arr).shape[:2])}

    def stats(self) -> dict:
        rt = self.runtime
        return {
            **rt.stats,
            "slots": rt.slots,
            "slots_busy": sum(s is not None for s in rt.slot_state),
            "queued_chat": rt.chat_q.qsize(),
            "queued_gen": rt.gen_q.qsize(),
        }


def _make_handler(server: BagelServer):
    class Handler(BaseHTTPRequestHandler):
        # chunked transfer (streaming) is only defined for HTTP/1.1; all
        # non-stream replies send Content-Length so keep-alive is safe
        protocol_version = "HTTP/1.1"

        # quiet per-request stderr logging; stats carry the counters
        def log_message(self, *args):
            pass

        def _reply(self, code: int, payload: dict):
            data = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _stream(self, events):
            """Chunked NDJSON: one JSON object per line per event. Headers
            are already committed when this runs, so a failure mid-stream
            is reported as a final in-band {"error": ...} event and the
            chunked body is terminated cleanly (never a second status
            line)."""
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def write_event(ev):
                data = json.dumps(ev).encode() + b"\n"
                self.wfile.write(f"{len(data):x}\r\n".encode())
                self.wfile.write(data + b"\r\n")
                self.wfile.flush()

            try:
                for ev in events:
                    write_event(ev)
            except Exception as e:
                write_event({"error": f"{type(e).__name__}: {e}"})
            self.wfile.write(b"0\r\n\r\n")

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True})
            elif self.path == "/v1/stats":
                self._reply(200, server.stats())
            else:
                self._reply(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError) as e:
                return self._reply(400, {"error": f"bad json: {e}"})
            try:
                if self.path == "/v1/chat" and body.get("stream"):
                    import itertools

                    gen = server.chat_stream_events(body)
                    first = next(gen)  # validation errors land before headers
                    self._stream(itertools.chain([first], gen))
                elif self.path == "/v1/chat":
                    self._reply(200, server.chat(body))
                elif self.path == "/v1/generate":
                    self._reply(200, server.generate(body))
                else:
                    self._reply(404, {"error": f"no route {self.path}"})
            except ValueError as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # scheduler/engine failure
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(server: BagelServer, host: str = "127.0.0.1",
          port: int = 8000) -> ThreadingHTTPServer:
    """Bind and return the HTTP server (caller decides foreground vs
    thread; port=0 picks a free port, read it from
    `httpd.server_address`)."""
    httpd = ThreadingHTTPServer((host, port), _make_handler(server))
    httpd.daemon_threads = True
    return httpd


def serve_in_thread(server: BagelServer, host: str = "127.0.0.1",
                    port: int = 0):
    """Test/embedding helper: returns (httpd, thread) already serving."""
    httpd = serve(server, host, port)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, t


def main(argv: Optional[list] = None):
    from bagel_tpu.serving.app import build_engine, parse_args
    from bagel_tpu.serving.runtime import ServingRuntime

    import argparse

    ap = argparse.ArgumentParser("bagel_tpu http server", add_help=False)
    ap.add_argument("--host", type=str, default="127.0.0.1")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--decode_chunk", type=int, default=16)
    ap.add_argument("--speculative", type=int, default=0,
                    help="K>0: prompt-lookup speculative decode per chunk "
                         "(greedy-exact; big wins on context-echoing chats)")
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--gen_batch", type=int, default=1,
                    help="N>1: queued T2I jobs sharing shape/CFG params run "
                         "as one batched denoise scan. Opt-in: on a single "
                         "16 GB chip even J=2 at 1024px full-depth w8a8 "
                         "OOMs (runtime.py HBM bound; NOTES r4) — raise "
                         "only for <=512px shapes or --mesh weight-sharded "
                         "serving")
    own, rest = ap.parse_known_args(argv)
    args = parse_args(rest)

    engine, vae_tf, vit_tf = build_engine(args)
    mesh = getattr(engine, "mesh", None)
    import jax

    if jax.process_count() > 1:
        # pod deployment: every process runs this same program; process 0
        # additionally accepts HTTP traffic and broadcasts the ingress to
        # the followers before each scheduler tick (serving/multihost.py)
        from bagel_tpu.serving.multihost import serve_multihost

        rt = serve_multihost(engine, slots=own.slots,
                             decode_chunk=own.decode_chunk, mesh=mesh,
                             speculative=own.speculative, ngram=own.ngram,
                             gen_batch=own.gen_batch)
        rt.start()
        if not rt.leader:
            print(f"bagel_tpu follower (process {jax.process_index()}) "
                  "ticking until the leader stops")
            rt.join()
            return
    else:
        rt = ServingRuntime(engine, slots=own.slots,
                            decode_chunk=own.decode_chunk, mesh=mesh,
                            speculative=own.speculative, ngram=own.ngram,
                            gen_batch=own.gen_batch)
        rt.start()
    server = BagelServer(rt, vae_tf, vit_tf)
    httpd = serve(server, own.host, args.port)
    print(f"bagel_tpu serving on http://{own.host}:{args.port} "
          f"(slots={own.slots})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        rt.stop()


if __name__ == "__main__":
    main()
