"""Serving entry point — the reference app.py rebuilt for TPU.

Loads an HF-released BAGEL checkpoint (or a random demo model), GSPMD-shards
the weights over the local mesh (replacing accelerate's per-layer device_map,
app.py:75-113 — no layer placement, no NF4 fallback needed at 14B over
v5e-8), and serves the three modes (T2I / edit / understand, each with think
mode) through a Gradio UI when gradio is installed, else an interactive REPL
/ one-shot CLI.

  python -m bagel_tpu.serving.app --checkpoint /path/to/BAGEL-7B-MoT \
      [--mesh 1,8,1] [--mode t2i] [--prompt "..."] [--output out.png]
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("bagel_tpu server")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="HF checkpoint dir; omit for a random micro demo")
    p.add_argument("--mesh", type=str, default=None, help="dp,fsdp,tp")
    p.add_argument("--max_kv", type=int, default=8192)
    p.add_argument("--max_latent_size", type=int, default=64)
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--share", action="store_true")
    # one-shot CLI mode (no UI)
    p.add_argument("--mode", type=str, default=None,
                   choices=["t2i", "edit", "understand"])
    p.add_argument("--prompt", type=str, default=None)
    p.add_argument("--image", type=str, default=None)
    p.add_argument("--output", type=str, default="output.png")
    p.add_argument("--think", action="store_true")
    p.add_argument("--image_size", type=int, default=1024)
    p.add_argument("--num_timesteps", type=int, default=50)
    p.add_argument("--cfg_text_scale", type=float, default=4.0)
    p.add_argument("--cfg_img_scale", type=float, default=1.5)
    p.add_argument("--cfg_renorm_type", type=str, default=None,
                   help="default: global for t2i, text_channel for edit "
                        "(the reference edit path renorm, "
                        "inferencer.py:215-225)")
    p.add_argument("--timestep_shift", type=float, default=3.0)
    p.add_argument("--enable_taylorseer", action="store_true")
    p.add_argument("--taylorseer_threshold", type=int, default=3,
                   help="full forward every Nth step (reference default 3; "
                        "5 measured 1.43x faster at 0.52%% latent rel-MAE "
                        "vs all-full, NOTES r4)")
    p.add_argument("--taylorseer_first_enhance", type=int, default=5,
                   help="forced-full warmup steps (reference default 5; 3 "
                        "measured 10%% faster at equal fidelity, NOTES r4)")
    p.add_argument("--quant", type=str, default=None,
                   choices=[None, "int8", "w8a8", "int4", "nf4"],
                   help="LLM quantization: int8 per-column weight-only, "
                        "w8a8 int8 weights + dynamic int8 activations "
                        "(int8 MXU dots, ~1.5x matmul throughput), "
                        "int4/nf4 per-group 4-bit (bnb NF4/INT8 parity, "
                        "app.py:114-131)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--speculative", type=int, default=0,
                   help="K>0: prompt-lookup speculative decode for text "
                        "outputs (greedy-exact; inference/speculative.py)")
    p.add_argument("--no_fuse", action="store_true",
                   help="disable the fused QKV / gate-up projections")
    p.add_argument("--zh", action="store_true",
                   help="Chinese UI labels (reference app.py --zh)")
    p.add_argument("--kv_quant", action="store_true",
                   help="int8 KV cache for chat/serving sessions (half the "
                        "cache HBM => ~2x the continuous-batching slot "
                        "capacity; generation contexts stay bf16)")
    return p.parse_args(argv)


def build_engine(args):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bagel_tpu.configs import BagelConfig, micro_bagel
    from bagel_tpu.inference import BagelEngine
    from bagel_tpu.data.transforms import ImageTransform

    if args.checkpoint:
        from bagel_tpu.configs import Qwen2Config, SiglipConfig, VAEConfig
        from bagel_tpu.data.tokenizer import load_tokenizer
        from bagel_tpu.utils.convert import load_checkpoint_dir

        cfg = BagelConfig(
            llm=Qwen2Config(), vit=SiglipConfig(), vae=VAEConfig(),
            max_latent_size=args.max_latent_size, timestep_shift=3.0,
        )
        params = load_checkpoint_dir(args.checkpoint, cfg)
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                              if x.dtype == jnp.float32 else x, params)
        tokenizer, new_token_ids, _ = load_tokenizer(args.checkpoint)
    else:
        from bagel_tpu.data.tokenizer import MockTokenizer
        from bagel_tpu.models.bagel import init_bagel_params

        cfg = micro_bagel()
        params = init_bagel_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        tokenizer = MockTokenizer(cfg.llm.vocab_size)
        new_token_ids = tokenizer.new_token_ids

    if getattr(args, "quant", None):
        from bagel_tpu.utils.quant import quantize_bagel_params

        params = quantize_bagel_params(params, args.quant)

    if not getattr(args, "no_fuse", False):
        # fused QKV / gate-up projections: fewer dispatches and (for w8a8)
        # one activation quant per group; applied post-quant so the leaves
        # concat with their per-output-channel scales
        from bagel_tpu.models.qwen2 import fuse_llm_params

        params["llm"] = fuse_llm_params(params["llm"], inplace=True)

    mesh = None
    if args.mesh:
        from bagel_tpu.parallel import make_mesh, shard_params

        shape = tuple(int(x) for x in args.mesh.split(","))
        mesh = make_mesh(shape)
        params = shard_params(mesh, params)

    vae_stride = cfg.latent_downsample
    vae_tf = ImageTransform(1024, 512, vae_stride) if args.checkpoint else \
        ImageTransform(64, 16, vae_stride, max_pixels=64 * 64)
    vit_tf = ImageTransform(980, 378, cfg.vit.patch_size) if args.checkpoint \
        else ImageTransform(56, 28, cfg.vit.patch_size, max_pixels=56 * 56)
    engine = BagelEngine(
        params, cfg, tokenizer, new_token_ids, max_kv=args.max_kv,
        vae_transform=vae_tf, vit_transform=vit_tf,
        kv_quant=getattr(args, "kv_quant", False),
    )
    engine.mesh = mesh  # for runtime cache sharding (server.py, runtime.py)
    return engine, vae_tf, vit_tf


def _load_image(path, transform):
    from PIL import Image

    from bagel_tpu.data.transforms import pil_img2rgb

    img = pil_img2rgb(Image.open(path))
    return transform(img)


def run_once(engine, vae_tf, vit_tf, args):
    import jax

    from PIL import Image

    rng = jax.random.PRNGKey(args.seed)
    # edit defaults to text_channel renorm like the reference edit path
    # (inferencer.py:215-225); t2i to global
    renorm = args.cfg_renorm_type or (
        "text_channel" if args.mode == "edit" else "global"
    )
    kwargs = dict(
        think=args.think,
        speculative=args.speculative,
        cfg_text_scale=args.cfg_text_scale,
        cfg_img_scale=args.cfg_img_scale,
        cfg_renorm_type=renorm,
        timestep_shift=args.timestep_shift,
        num_timesteps=args.num_timesteps,
        image_shapes=(args.image_size, args.image_size),
        enable_taylorseer=args.enable_taylorseer,
        taylorseer_threshold=args.taylorseer_threshold,
        taylorseer_first_enhance=args.taylorseer_first_enhance,
        rng=rng,
    )
    if args.mode == "understand":
        # understanding is the ViT pathway: stride-14 resize policy
        image = _load_image(args.image, vit_tf) if args.image else None
        out = engine(image=image, text=args.prompt,
                     understanding_output=True, think=args.think,
                     speculative=args.speculative)
        print(out["text"])
        return out
    image = _load_image(args.image, vae_tf) if args.image else None
    out = engine(image=image, text=args.prompt, **kwargs)
    if out.get("text"):
        print(out["text"])
    if out.get("image") is not None:
        Image.fromarray(out["image"]).save(args.output)
        print(f"saved {args.output}")
    return out


# UI localization map (reference app.py applies a post-hoc component walk
# behind --zh; here labels go through _label() at construction time).
ZH_LABELS = {
    "Text to Image": "文生图",
    "Edit": "图像编辑",
    "Understand": "图像理解",
    "prompt": "提示词",
    "instruction": "编辑指令",
    "question": "问题",
    "answer": "回答",
    "thinking": "思考过程",
    "think mode": "思考模式",
    "generate": "生成",
    "edit": "编辑",
    "ask": "提问",
    "size": "尺寸",
    "timesteps": "采样步数",
    "seed": "随机种子",
}


def _label(text, zh):
    return ZH_LABELS.get(text, text) if zh else text


def launch_ui(engine, vae_tf, vit_tf, args):
    import jax
    import gradio as gr

    zh = getattr(args, "zh", False)

    def L(text):
        return _label(text, zh)

    spec = getattr(args, "speculative", 0)  # text decodes (incl. think)

    def t2i(prompt, think, size, steps, cfg_text, cfg_img, shift, renorm, seed):
        out = engine(
            text=prompt, think=think, image_shapes=(int(size), int(size)),
            num_timesteps=int(steps), cfg_text_scale=cfg_text,
            cfg_img_scale=cfg_img, timestep_shift=shift,
            cfg_renorm_type=renorm, rng=jax.random.PRNGKey(int(seed)),
            speculative=spec,
        )
        return out.get("image"), out.get("text") or ""

    def edit(image, prompt, think, steps, cfg_text, cfg_img, shift, seed):
        arr = vae_tf(image)
        out = engine(
            image=arr, text=prompt, think=think, num_timesteps=int(steps),
            cfg_text_scale=cfg_text, cfg_img_scale=cfg_img,
            timestep_shift=shift, cfg_renorm_type="text_channel",
            rng=jax.random.PRNGKey(int(seed)), speculative=spec,
        )
        return out.get("image"), out.get("text") or ""

    def understand(image, prompt, think):
        arr = vit_tf(image)  # stride-14 ViT resize, not the VAE's stride 16
        out = engine(image=arr, text=prompt, understanding_output=True,
                     think=think, speculative=spec)
        return out.get("text") or ""

    with gr.Blocks(title="BAGEL-TPU") as demo:
        with gr.Tab(L("Text to Image")):
            prompt = gr.Textbox(label=L("prompt"))
            with gr.Row():
                size = gr.Slider(256, 1024, 1024, step=64, label=L("size"))
                steps = gr.Slider(4, 100, 50, step=1, label=L("timesteps"))
                cfg_text = gr.Slider(1, 8, 4.0, label=L("cfg_text_scale"))
                cfg_img = gr.Slider(1, 2, 1.0, label=L("cfg_img_scale"))
                shift = gr.Slider(1, 5, 3.0, label=L("timestep_shift"))
                renorm = gr.Dropdown(["global", "channel", "text_channel"],
                                     value="global", label=L("cfg_renorm"))
                seed = gr.Number(42, label=L("seed"))
            think = gr.Checkbox(label=L("think mode"))
            btn = gr.Button(L("generate"))
            img_out = gr.Image()
            txt_out = gr.Textbox(label=L("thinking"))
            btn.click(t2i, [prompt, think, size, steps, cfg_text, cfg_img,
                            shift, renorm, seed], [img_out, txt_out])
        with gr.Tab(L("Edit")):
            src = gr.Image(type="pil")
            eprompt = gr.Textbox(label=L("instruction"))
            with gr.Row():
                esteps = gr.Slider(4, 100, 50, step=1, label=L("timesteps"))
                ecfg_t = gr.Slider(1, 8, 4.0, label=L("cfg_text_scale"))
                ecfg_i = gr.Slider(1, 2, 2.0, label=L("cfg_img_scale"))
                eshift = gr.Slider(1, 5, 3.0, label=L("timestep_shift"))
                eseed = gr.Number(42, label=L("seed"))
            ethink = gr.Checkbox(label=L("think mode"))
            ebtn = gr.Button(L("edit"))
            eimg = gr.Image()
            etxt = gr.Textbox(label=L("thinking"))
            ebtn.click(edit, [src, eprompt, ethink, esteps, ecfg_t, ecfg_i,
                              eshift, eseed], [eimg, etxt])
        with gr.Tab(L("Understand")):
            uimg = gr.Image(type="pil")
            uq = gr.Textbox(label=L("question"))
            uthink = gr.Checkbox(label=L("think mode"))
            ubtn = gr.Button(L("ask"))
            uans = gr.Textbox(label=L("answer"))
            ubtn.click(understand, [uimg, uq, uthink], [uans])
    demo.launch(server_port=args.port, share=args.share)


def main(argv=None):
    args = parse_args(argv)
    engine, vae_tf, vit_tf = build_engine(args)
    if args.mode:
        return run_once(engine, vae_tf, vit_tf, args)
    try:
        import gradio  # noqa: F401
    except ImportError:
        print("gradio not installed — interactive REPL "
              "(':img path' to attach an image, ':quit' to exit)")
        image = None
        while True:
            try:
                line = input("> ").strip()
            except EOFError:
                break
            if line == ":quit":
                break
            if line.startswith(":img "):
                image = _load_image(line[5:], vit_tf)
                print("image attached")
                continue
            out = engine(image=image, text=line, understanding_output=True,
                         speculative=args.speculative)
            print(out["text"])
            image = None
        return
    launch_ui(engine, vae_tf, vit_tf, args)


if __name__ == "__main__":
    main()
