"""Benchmark: 1024px 50-step CFG T2I denoise throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The BASELINE target is >=2 img/s/chip for 1024^2 50-step CFG T2I (driver
north star; the reference publishes no latency numbers at all). BAGEL-7B-MoT
is 14B params (~28 GB bf16) and does not fit one v5e chip, so the bench runs
the deepest depth-reduced full-width MoT stack that fits, times the real
denoise scan (batched 3-branch CFG, 4096 latent tokens), and extrapolates
linearly to 28 layers (denoise cost is layer-linear). The extrapolation
basis is reported alongside the number.

Usage: python bench.py [--preset tiny|full] [--steps N] [--image 1024]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np


def _fast_quantized_llm(cfg, rng: "np.random.Generator",
                        vocab_rows: int = None, head_cols: int = None):
    """Throughput-bench params: random int8 weights built directly with
    numpy (jax PRNG init of 14B on the single host core takes ~1h; the
    bench measures speed, not sample quality). Structure matches
    utils.quant.quantize_llm_params output."""
    import jax.numpy as jnp

    L, d, hd = cfg.num_hidden_layers, cfg.hidden_size, cfg.head_dim
    qd = cfg.num_attention_heads * hd
    kvd = cfg.num_key_value_heads * hd
    f = cfg.intermediate_size
    # the denoise loop reads only the 2 boundary-token embedding rows and
    # never calls lm_head: callers can shrink both to fit full depth in HBM
    v = vocab_rows or cfg.vocab_size
    hc = head_cols or cfg.vocab_size

    def q(shape):
        # stacked weights [L, in, out] carry per-layer scales [L, out]
        scale_shape = (shape[0], shape[-1]) if len(shape) == 3 else shape[-1:]
        return {
            "w_q": jnp.asarray(rng.integers(-127, 127, shape, dtype=np.int8)),
            "scale": jnp.full(scale_shape, 2e-4, jnp.float32),
        }

    def attn():
        return {
            "q": {**q((L, d, qd)), "b": jnp.zeros((L, qd), jnp.bfloat16)},
            "k": {**q((L, d, kvd)), "b": jnp.zeros((L, kvd), jnp.bfloat16)},
            "v": {**q((L, d, kvd)), "b": jnp.zeros((L, kvd), jnp.bfloat16)},
            "o": q((L, qd, d)),
            "q_norm": jnp.ones((L, hd), jnp.float32),
            "k_norm": jnp.ones((L, hd), jnp.float32),
        }

    def mlp():
        return {"gate": q((L, d, f)), "up": q((L, d, f)), "down": q((L, f, d))}

    return {
        "embed": {
            "w_q": jnp.asarray(rng.integers(-127, 127, (v, d), dtype=np.int8)),
            "row_scale": jnp.full((v,), 2e-4, jnp.float32),
        },
        "layers": {
            "attn": attn(), "attn_gen": attn(),
            "mlp": mlp(), "mlp_gen": mlp(),
            "input_ln": jnp.ones((L, d), jnp.float32),
            "input_ln_gen": jnp.ones((L, d), jnp.float32),
            "post_ln": jnp.ones((L, d), jnp.float32),
            "post_ln_gen": jnp.ones((L, d), jnp.float32),
        },
        "final_norm": jnp.ones((d,), jnp.float32),
        "final_norm_gen": jnp.ones((d,), jnp.float32),
        "lm_head": q((d, hc)),
    }


def _build(depth: int, image: int, dtype_name: str):
    import jax
    import jax.numpy as jnp

    from bagel_tpu.configs import BagelConfig, Qwen2Config, SiglipConfig, VAEConfig
    from bagel_tpu.inference.engine import _denoise_phase
    from bagel_tpu.models import qwen2
    from bagel_tpu.models.bagel import init_bagel_params, shifted_timesteps

    dtype = jnp.bfloat16 if dtype_name in ("bf16", "int8") else jnp.float32
    llm = Qwen2Config(num_hidden_layers=depth)
    cfg = BagelConfig(
        llm=llm, vit=None, vae=VAEConfig(), visual_und=False,
        max_latent_size=64, timestep_shift=3.0,
    )
    if dtype_name == "int8":
        rng = np.random.default_rng(0)
        import dataclasses as _dc

        small = _dc.replace(cfg, llm=_dc.replace(llm, num_hidden_layers=1))
        params = init_bagel_params(jax.random.PRNGKey(0), small, dtype=dtype)
        params["llm"] = _fast_quantized_llm(llm, rng, vocab_rows=8, head_cols=8)
        params.pop("vae", None)  # denoise scan never touches the VAE
    else:
        params = init_bagel_params(jax.random.PRNGKey(0), cfg, dtype=dtype)

    down = cfg.latent_downsample  # 16
    h = w = image // down
    n = h * w
    pd = cfg.patch_latent_dim
    prompt_len = 64
    tb = -(-(n + 2) // 256) * 256  # padded query block (engine semantics)
    kv_max = -(-(prompt_len + tb) // 256) * 256

    nb = 3  # cond + cfg_text + cfg_img branches, batched
    cache = qwen2.kv_cache_init(cfg.llm, nb, kv_max, dtype)
    cache = dataclasses.replace(
        cache, length=jnp.full((nb,), prompt_len, jnp.int32)
    )
    x_t = jax.random.normal(jax.random.PRNGKey(1), (n, pd), jnp.float32)
    lat_pos = jnp.zeros((n,), jnp.int32)
    boundary = jnp.asarray([3, 4], jnp.int32)
    rope = jnp.full((nb,), prompt_len, jnp.int32)
    return cfg, params, cache, x_t, lat_pos, boundary, rope, _denoise_phase, shifted_timesteps


def run_bench(depth: int, image: int, steps: int, dtype_name: str):
    import jax
    import jax.numpy as jnp

    (cfg, params, cache, x_t, lat_pos, boundary, rope,
     _denoise_phase, shifted_timesteps) = _build(depth, image, dtype_name)

    ts, dts = shifted_timesteps(steps + 1, cfg.timestep_shift)

    def run(x):
        return _denoise_phase(
            params, cfg, x, cache.k, cache.v, cache.length, rope, lat_pos,
            boundary, ts, dts, n_branches=3, cfg_text_scale=4.0,
            cfg_img_scale=1.5, cfg_renorm_type="global", cfg_renorm_min=0.0,
        )

    # compile + warmup
    out = run(x_t)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = run(x_t)
    out.block_until_ready()
    elapsed = time.perf_counter() - t0
    return elapsed


def run_decode_bench(depth: int, dtype_name: str, prompt_len: int = 512,
                     new_tokens: int = 64):
    """VQA greedy-decode tokens/sec on the depth-reduced MoT stack."""
    import jax
    import jax.numpy as jnp

    from bagel_tpu.configs import Qwen2Config
    from bagel_tpu.models import (
        decode_text, embed_tokens, init_qwen2_params, kv_cache_init,
        llm_extend,
    )

    dtype = jnp.bfloat16 if dtype_name in ("bf16", "int8") else jnp.float32
    cfg = Qwen2Config(num_hidden_layers=depth)
    if dtype_name == "int8":
        params = _fast_quantized_llm(cfg, np.random.default_rng(0))
    else:
        params = init_qwen2_params(jax.random.PRNGKey(0), cfg, dtype)
    cache = kv_cache_init(cfg, 1, prompt_len + new_tokens + 128, dtype)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, prompt_len), 0,
                             cfg.vocab_size)
    _, cache = jax.jit(
        lambda p, e, c: llm_extend(
            p, cfg, e, jnp.arange(prompt_len)[None], c,
            jnp.asarray([prompt_len]), und_len=prompt_len, causal=True,
            update_cache=True,
        )
    )(params, embed_tokens(params, ids), cache)

    run = jax.jit(
        lambda c: decode_text(
            params, cfg, c, jnp.asarray([3]), jnp.asarray([prompt_len]),
            max_steps=new_tokens, eos_id=-1,
        )
    )
    toks, _ = run(cache)
    toks.block_until_ready()
    t0 = time.perf_counter()
    toks, _ = run(cache)
    toks.block_until_ready()
    return new_tokens / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="auto", choices=["auto", "tiny", "full"])
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--image", type=int, default=None)
    ap.add_argument("--depth", type=int, default=None,
                    help="internal: run one depth and print elapsed seconds")
    ap.add_argument("--dtype", type=str, default="bf16",
                    choices=["bf16", "fp32", "int8"])
    args = ap.parse_args()

    if args.depth is not None:
        # child mode: one attempt, fresh process (avoids HBM fragmentation
        # from previous failed attempts)
        dt = args.dtype
        elapsed = run_bench(args.depth, args.image, args.steps, dt)
        print(f"ELAPSED {elapsed}")
        import os

        if os.environ.get("BAGEL_BENCH_DECODE"):  # opt-in: extra compile
            try:
                tok_s = run_decode_bench(args.depth, dt)
                print(f"DECODE {tok_s}")
            except Exception:
                pass
        return

    import jax

    platform = jax.devices()[0].platform
    if args.preset == "tiny" or (args.preset == "auto" and platform == "cpu"):
        attempts, image, steps = [(2, "fp32")], args.image or 256, args.steps or 2
    else:
        # bf16 depth-reduced attempts: reliable on the 16 GB chip. Full-depth
        # int8 fits memory-wise but the host-side init + tunnel transfer of
        # 14 GB exceeds any sane bench budget in this environment (NOTES.md);
        # int8 serving is exercised in tests instead. 20 measured steps
        # (denoise cost is step-linear; single-core XLA compile dominates
        # wall time here, so keep the measured run short).
        attempts = [(8, "bf16"), (4, "bf16")]
        image, steps = args.image or 1024, args.steps or 20

    full_depth = 28
    elapsed = None
    decode_tok_s = None
    if platform == "cpu":
        depth, dtype = attempts[0]
        elapsed = run_bench(depth, image, steps, dtype)
    else:
        import subprocess

        for depth, dtype in attempts:
            try:
                proc = subprocess.run(
                    [sys.executable, __file__, "--depth", str(depth),
                     "--image", str(image), "--steps", str(steps),
                     "--preset", "full", "--dtype", dtype],
                    capture_output=True, text=True, timeout=2100,
                )
            except subprocess.TimeoutExpired:
                print(f"# depth {depth}/{dtype} timed out, falling back",
                      file=sys.stderr)
                continue
            for line in proc.stdout.splitlines():
                if line.startswith("ELAPSED "):
                    elapsed = float(line.split()[1])
                if line.startswith("DECODE "):
                    decode_tok_s = float(line.split()[1])
            if elapsed is not None:
                break
            print(f"# depth {depth}/{dtype} failed, retrying smaller",
                  file=sys.stderr)
    if elapsed is None:
        print(json.dumps({"metric": "bench_failed", "value": 0, "unit": "",
                          "vs_baseline": 0}))
        return

    # per-image time extrapolated to 50 steps and full depth
    per_image = elapsed * (50 / steps) * (full_depth / depth)
    img_per_s = 1.0 / per_image
    result = {
        "metric": f"{image}px_50step_cfg_t2i_denoise_throughput",
        "value": round(img_per_s, 5),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_s / 2.0, 5),
        "detail": {
            "platform": platform,
            "measured_depth": depth,
            "full_depth": full_depth,
            "measured_steps": steps,
            "measured_s": round(elapsed, 3),
            "dtype": dtype,
            "note": "3-branch batched CFG denoise scan; linear depth/step extrapolation; baseline = 2 img/s/chip driver target",
        },
    }
    if decode_tok_s is not None:
        result["detail"]["vqa_decode_tok_per_s_measured"] = round(decode_tok_s, 2)
        result["detail"]["vqa_decode_tok_per_s_28layer_extrapolated"] = round(
            decode_tok_s * depth / full_depth, 2
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
