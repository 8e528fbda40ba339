"""One-process perf probe at the 1024px denoise operating point.

Each fresh process pays a multi-minute first-execute tax on the tunneled
TPU (NOTES round 3), so every experiment this round shares one process:

  1. fused vs unfused w8a8 full-depth ONE-STEP 3-branch denoise phase
  2. flash-attention block_q/block_k sweep at denoise shapes
  3. w8a8 matmul microbench: activation-quant overhead vs the pure int8 dot

Usage: timeout 3600 python scripts/perf_probe.py [--skip 1,2] [--depth 28]
All timings sync via np.asarray (block_until_ready is a no-op on axon).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def sync(x):
    import jax.numpy as jnp

    return np.asarray(jnp.sum(jnp.abs(x.astype(jnp.float32))))


def timed(fn, *args, reps=3):
    out = fn(*args)
    sync(out)  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def probe_denoise_step(depth: int, fused: bool):
    """One full 3-branch CFG denoise step (the dominant unit of the
    production schedule: 24 of 29 cfg-on steps are full forwards)."""
    import os

    os.environ["BAGEL_FUSE"] = "1" if fused else "0"  # read at build time
    import bench as bench_mod

    import jax
    import jax.numpy as jnp

    from bagel_tpu.inference.engine import _denoise_phase
    from bagel_tpu.models.bagel import shifted_timesteps

    cfg, params, cache, x0, lat_pos, boundary, rope = bench_mod._build_denoise(
        depth, 1024, "w8a8"
    )
    ts, dts = shifted_timesteps(3, cfg.timestep_shift)

    def step(x):
        return _denoise_phase(
            params, cfg, x[None], cache.k, cache.v, cache.length, rope,
            lat_pos, boundary, ts[:2], dts[:2], n_jobs=1, n_branches=3,
            cfg_text_scale=4.0, cfg_img_scale=1.5, cfg_renorm_type="global",
            cfg_renorm_min=0.0,
        )[0]

    t = timed(step, x0, reps=3) / 2  # 2 steps per call
    label = "fused" if fused else "unfused"
    print(f"DENOISE_STEP {label} depth={depth} {t*1000:.1f} ms/step",
          flush=True)
    del params, cache
    return t


def probe_flash_sweep():
    import os

    import jax
    import jax.numpy as jnp

    from bagel_tpu.ops.flash import flash_cached_attention

    b, h, kh, d = 3, 28, 4, 128
    for (t_ext, s) in [(4608, 4608), (512, 4096)]:
        q = jax.random.normal(jax.random.PRNGKey(0), (b, t_ext, h, d),
                              jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, s, kh, d),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, s, kh, d),
                              jnp.bfloat16)
        past = jnp.full((b,), 64, jnp.int32)
        valid = jnp.full((b,), t_ext - 64, jnp.int32)
        for bq in (128, 256, 512):
            for bk in (256, 512, 1536, s):
                try:
                    ms = timed(
                        lambda: flash_cached_attention(
                            q, k, v, past, valid, causal=False,
                            block_q=bq, block_k=bk,
                        ), reps=3,
                    ) * 1000
                    print(f"FLASH t={t_ext} s={s} bq={bq} bk={bk} "
                          f"{ms:.2f} ms", flush=True)
                except Exception as e:
                    print(f"FLASH t={t_ext} s={s} bq={bq} bk={bk} "
                          f"failed {e!r}", flush=True)


def probe_w8a8_matmul():
    """Isolate the dynamic activation-quant overhead: pure int8 dot
    (pre-quantized activations) vs the full w8a8 _linear (absmax + quant +
    dot + scale) vs bf16, at the FFN shape."""
    import jax
    import jax.numpy as jnp

    m, kdim, n = 3 * 4608, 3584, 18944
    x = jax.random.normal(jax.random.PRNGKey(0), (m, kdim), jnp.bfloat16)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32)), -127, 127).astype(jnp.int8)
    w8 = jax.random.randint(jax.random.PRNGKey(1), (kdim, n), -127, 127,
                            jnp.int32).astype(jnp.int8)
    wb = w8.astype(jnp.bfloat16)
    scale = jnp.full((n,), 2e-4, jnp.float32)

    @jax.jit
    def dot_int8(xq, w8):
        return jax.lax.dot_general(
            xq, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    @jax.jit
    def dot_w8a8(x, w8, scale):
        xf = x.astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                         1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * xs * scale).astype(jnp.bfloat16)

    @jax.jit
    def dot_bf16(x, wb):
        return jnp.dot(x, wb, preferred_element_type=jnp.float32).astype(
            jnp.bfloat16)

    t_int8 = timed(dot_int8, xq, w8) * 1000
    t_w8a8 = timed(dot_w8a8, x, w8, scale) * 1000
    t_bf16 = timed(dot_bf16, x, wb) * 1000
    flops = 2 * m * kdim * n
    print(f"MATMUL int8_dot {t_int8:.2f} ms = {flops/t_int8/1e9:.0f} GOPS",
          flush=True)
    print(f"MATMUL w8a8_full {t_w8a8:.2f} ms (quant overhead "
          f"{t_w8a8 - t_int8:.2f} ms = "
          f"{100*(t_w8a8-t_int8)/t_w8a8:.0f}%)", flush=True)
    print(f"MATMUL bf16 {t_bf16:.2f} ms -> int8 speedup "
          f"{t_bf16/t_w8a8:.2f}x", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="", help="comma list of 1,2,3")
    ap.add_argument("--depth", type=int, default=28)
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    if "3" not in skip:
        probe_w8a8_matmul()
    if "2" not in skip:
        probe_flash_sweep()
    if "1" not in skip:
        t_f = probe_denoise_step(args.depth, fused=True)
        t_u = probe_denoise_step(args.depth, fused=False)
        print(f"DENOISE fused speedup {t_u/t_f:.3f}x", flush=True)


if __name__ == "__main__":
    main()
