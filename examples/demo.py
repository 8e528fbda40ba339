"""Demo walkthrough of every inference mode (inference.ipynb equivalent).

Runs against a real checkpoint when --checkpoint is given, else a random
micro model (shapes/flow only, outputs are noise).

  python examples/demo.py [--checkpoint /path/BAGEL-7B-MoT] [--mesh 1,8,1]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--mesh", default=None)
    ap.add_argument("--outdir", default="demo_out")
    ap.add_argument("--max_kv", type=int, default=None)
    args = ap.parse_args()

    import jax

    # honor JAX_PLATFORMS programmatically (some TPU plugins ignore the env
    # var): the micro walkthrough is CPU-friendly
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from PIL import Image

    from bagel_tpu.serving.app import build_engine

    real = args.checkpoint is not None
    # micro sessions accumulate context across the walkthrough's modes
    # (understand -> t2i -> edit -> think): 1024 covers the whole chain
    args.max_kv = args.max_kv or (8192 if real else 1024)
    args.max_latent_size = 64
    engine, vae_tf, vit_tf = build_engine(args)
    os.makedirs(args.outdir, exist_ok=True)

    size = 1024 if real else 32
    steps = 50 if real else 2
    common = dict(num_timesteps=steps, timestep_shift=3.0 if real else 1.0,
                  cfg_text_scale=4.0 if real else 2.0)

    print("== text-to-image ==")
    out = engine(text="a kitten playing a tiny piano", image_shapes=(size, size),
                 rng=jax.random.PRNGKey(42), **common)
    Image.fromarray(out["image"]).save(f"{args.outdir}/t2i.png")

    print("== think-mode generation ==")
    out = engine(text="a crocodile in a lab coat", think=True,
                 image_shapes=(size, size), max_think_token_n=64, **common)
    print("thinking:", (out["text"] or "")[:200])
    Image.fromarray(out["image"]).save(f"{args.outdir}/t2i_think.png")

    print("== editing ==")
    src = np.asarray(Image.open(f"{args.outdir}/t2i.png"), np.float32)
    src = src / 127.5 - 1.0
    out = engine(image=src, text="make it nighttime",
                 cfg_img_scale=1.5 if real else 1.0,
                 cfg_renorm_type="text_channel", **common)
    Image.fromarray(out["image"]).save(f"{args.outdir}/edit.png")

    print("== understanding ==")
    out = engine(image=src, text="describe this image",
                 understanding_output=True, max_think_token_n=64)
    print("answer:", (out["text"] or "")[:200])

    print("== think-mode understanding ==")
    out = engine(image=src, text="how many animals are there?",
                 understanding_output=True, think=True, max_think_token_n=64)
    print("answer:", (out["text"] or "")[:200])

    print("== continuous-batching serving + HTTP API ==")
    import http.client
    import json

    from bagel_tpu.serving.runtime import ServingRuntime
    from bagel_tpu.serving.server import BagelServer, serve_in_thread

    rt = ServingRuntime(engine, slots=2, decode_chunk=4,
                        max_new_default=24 if real else 8)
    rt.start()
    httpd, _ = serve_in_thread(BagelServer(rt, vae_tf, vit_tf))
    host, port = httpd.server_address
    try:
        # two concurrent chats share decode chunks in the slot-batched cache
        futs = [rt.submit_chat(p) for p in
                ("name three colors", "what is a piano?")]
        for p, f in zip(("colors", "piano"), futs):
            print(f"  batched {p}:", f.result(timeout=600)[:80])
        # the same traffic over HTTP, streamed
        conn = http.client.HTTPConnection(host, port, timeout=600)
        conn.request("POST", "/v1/chat",
                     body=json.dumps({"prompt": "stream a fact",
                                      "stream": True}),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        events = [json.loads(line) for line in resp.read().splitlines()
                  if line.strip()]
        conn.close()
        print(f"  streamed {len(events) - 1} chunks ->",
              events[-1]["text"][:80])
    finally:
        httpd.shutdown()
        rt.stop()

    print(f"done -> {args.outdir}/")


if __name__ == "__main__":
    main()
