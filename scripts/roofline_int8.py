"""int8/bf16 matmul roofline sweep on the real chip (verdict r3 weak #2).

Answers: is the ~235 TOPS int8 microbench (NOTES r2) the chip's deliverable
rate, or an XLA-lowering artifact leaving up to 394/235 = 1.7x of the w8a8
denoise headline unclaimed?

Sweeps, per shape:
  xla_fixed   — x = requant_shift(x @ W), one weight resident, shift-only
                requant epilogue: the purest XLA int8 MXU chain.
  xla_dynamic — the production `_linear` w8a8 pattern (models/qwen2.py:134):
                per-token absmax dynamic activation quant + fp32 scale
                epilogue, weights streamed from HBM.
  layer_chain — the full per-layer dense sequence of the denoise forward
                (qkv 3584->4608, o 3584->3584, gate_up 3584->37888,
                down 18944->3584) at the padded gen block M=4608, chained
                through requant: the realistic composite rate.
  bf16_fixed  — bf16 x = (x @ W) * c chain for the bf16 denominator.

Run:  timeout 3600 python scripts/roofline_int8.py [--reps N] [--loop R]
Writes a markdown table to stdout (paste into NOTES.md).
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _requant_shift(y32):
    # int32 -> int8 via static shift: no reduction, fuses into the dot
    # epilogue; keeps the chain pure-MXU
    return jnp.clip(y32 >> 7, -127, 127).astype(jnp.int8)


def _dyn_quant(xf):
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _dot_i8(xq, wq):
    return lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)


def time_fn(fn, *args, reps=3):
    """Median seconds over `reps` timed calls (1 warmup/compile). np.asarray
    is the completion barrier (block_until_ready is a no-op on the tunneled
    axon platform — NOTES)."""
    np.asarray(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), ts


def sweep_xla_fixed(M, K, loop, reps):
    """Square fixed-weight int8 chain: the XLA compute ceiling."""
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
    w = jax.random.randint(key, (K, K), -127, 127, jnp.int8)

    @jax.jit
    def run(x, w):
        def body(_, x):
            return _requant_shift(_dot_i8(x, w))
        x = lax.fori_loop(0, loop, body, x)
        return jnp.sum(x.astype(jnp.int32))

    sec, ts = time_fn(run, x, w, reps=reps)
    tops = 2.0 * M * K * K * loop / sec / 1e12
    return tops, sec, ts


def sweep_xla_dynamic(M, K, loop, reps):
    """Production w8a8 pattern (dynamic per-token activation quant + fp32
    scale epilogue) on a square shape."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w = jax.random.randint(key, (K, K), -127, 127, jnp.int8)
    scale = jnp.full((K,), 0.01, jnp.float32)

    @jax.jit
    def run(x, w, scale):
        def body(_, x):
            xq, xs = _dyn_quant(x.astype(jnp.float32))
            out = _dot_i8(xq, w).astype(jnp.float32) * xs * scale
            return (out * 0.05).astype(jnp.bfloat16)
        x = lax.fori_loop(0, loop, body, x)
        return jnp.sum(x.astype(jnp.float32))

    sec, ts = time_fn(run, x, w, scale, reps=reps)
    tops = 2.0 * M * K * K * loop / sec / 1e12
    return tops, sec, ts


def sweep_bf16_fixed(M, K, loop, reps):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w = (jax.random.normal(key, (K, K), jnp.float32) * 0.01).astype(jnp.bfloat16)

    @jax.jit
    def run(x, w):
        def body(_, x):
            return (jnp.dot(x, w, preferred_element_type=jnp.float32)
                    * 0.05).astype(jnp.bfloat16)
        x = lax.fori_loop(0, loop, body, x)
        return jnp.sum(x.astype(jnp.float32))

    sec, ts = time_fn(run, x, w, reps=reps)
    tflops = 2.0 * M * K * K * loop / sec / 1e12
    return tflops, sec, ts


# the denoise per-layer dense sequence at the padded gen block (fused
# leaves: qkv = q + 2kv heads, gate_up = 2x intermediate)
D, QKV, F2, F = 3584, 4608, 37888, 18944


def sweep_layer_chain(M, loop, reps, dynamic):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, D), jnp.bfloat16)
    ws = {
        "qkv": jax.random.randint(key, (D, QKV), -127, 127, jnp.int8),
        "o": jax.random.randint(key, (D, D), -127, 127, jnp.int8),
        "gate_up": jax.random.randint(key, (D, F2), -127, 127, jnp.int8),
        "down": jax.random.randint(key, (F, D), -127, 127, jnp.int8),
    }
    scales = {k: jnp.full((w.shape[1],), 0.01, jnp.float32)
              for k, w in ws.items()}
    flops_per_layer = 2.0 * M * (D * QKV + D * D + D * F2 + F * D)

    def mm(x, k):
        if dynamic:
            xq, xs = _dyn_quant(x.astype(jnp.float32))
            out = _dot_i8(xq, ws[k]).astype(jnp.float32) * xs * scales[k]
            return out.astype(jnp.bfloat16)
        return _requant_shift(_dot_i8(x, ws[k])).astype(jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(_, x):
            h = mm(x if dynamic else jnp.round(x).astype(jnp.bfloat16), "qkv")
            h = mm(h[:, :D], "o")
            g = mm(h, "gate_up")
            # silu gating like the real mlp (elementwise, fuses)
            g = jax.nn.silu(g[:, :F]) * g[:, F:]
            h = mm(g, "down")
            return (x + h * 0.05).astype(jnp.bfloat16)
        x = lax.fori_loop(0, loop, body, x)
        return jnp.sum(x.astype(jnp.float32))

    sec, ts = time_fn(run, x, reps=reps)
    tops = flops_per_layer * loop / sec / 1e12
    return tops, sec, ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loop", type=int, default=24)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--m", type=int, default=4608)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} ({dev.platform})")
    print(f"# loop={args.loop} reps={args.reps}")
    print("| variant | M | K/N | TOPS or TFLOPS | sec/call | raw |")
    print("|---|---|---|---|---|---|")

    rows = []
    for K in (3584, 4096, 8192):
        tops, sec, ts = sweep_xla_fixed(args.m, K, args.loop, args.reps)
        rows.append(("int8 xla_fixed(shift)", args.m, K, tops, sec, ts))
        print(f"| int8 xla_fixed(shift) | {args.m} | {K} | {tops:.1f} | "
              f"{sec:.4f} | {[round(t,4) for t in ts]} |", flush=True)
    for K in (3584, 8192):
        tops, sec, ts = sweep_xla_dynamic(args.m, K, args.loop, args.reps)
        rows.append(("int8 xla_dynamic(w8a8)", args.m, K, tops, sec, ts))
        print(f"| int8 xla_dynamic(w8a8) | {args.m} | {K} | {tops:.1f} | "
              f"{sec:.4f} | {[round(t,4) for t in ts]} |", flush=True)
    for K in (3584, 8192):
        tf, sec, ts = sweep_bf16_fixed(args.m, K, args.loop, args.reps)
        rows.append(("bf16 fixed", args.m, K, tf, sec, ts))
        print(f"| bf16 fixed | {args.m} | {K} | {tf:.1f} | {sec:.4f} | "
              f"{[round(t,4) for t in ts]} |", flush=True)
    for dyn in (False, True):
        name = "layer_chain " + ("dynamic(w8a8)" if dyn else "shift")
        tops, sec, ts = sweep_layer_chain(args.m, max(args.loop // 4, 4),
                                          args.reps, dyn)
        rows.append((name, args.m, "denoise", tops, sec, ts))
        print(f"| {name} | {args.m} | denoise-layer | {tops:.1f} | "
              f"{sec:.4f} | {[round(t,4) for t in ts]} |", flush=True)


if __name__ == "__main__":
    main()
