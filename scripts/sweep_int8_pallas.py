"""Sweep the Pallas w8a8 matmul tilings vs XLA at the denoise shapes.

Continues scripts/roofline_int8.py (NOTES round-4): XLA int8 dot_general
delivers 82 TOPS at [4608x3584]x[3584x3584] vs 221 at 8192-wide — this
sweep asks whether hand tiling recovers the gap.

Timing: each fori_loop iteration perturbs the int8 activations with a
scalar derived from a FULL reduction of the previous iteration's output,
so the dot is NOT loop-invariant and XLA can neither hoist it nor
slice-propagate it down to one row (a first draft hoisted; a second
chained on out[0,0], which DCEs the XLA dot to a single output row while
leaving the opaque pallas_call whole — XLA "46 TOPS" at the dispatch
floor vs honest Pallas numbers).

Run (from repo root):  timeout 3600 python scripts/sweep_int8_pallas.py
"""

import argparse
import os
import sys
import time

# repo-root import without PYTHONPATH (the env var breaks the axon
# plugin's helper subprocess — see NOTES.md environment gotchas)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from bagel_tpu.ops.int8_matmul import int8_matmul

# denoise dense shapes at the padded gen block (fused leaves)
SHAPES = [
    ("qkv", 4608, 3584, 4608),
    ("o", 4608, 3584, 3584),
    ("gate_up", 4608, 3584, 37888),
    ("down", 4608, 18944, 3584),
]


def timeit_chained(fn, xq, xs, wq, ws, reps=3, loop=8):
    """Median sec/call. `fn(xq, xs, wq, ws) -> [M, N]`; each iteration
    adds a scalar derived from the FULL sum of the previous output to xq,
    so the whole dot is live. Overhead: one [M,N] f32 reduce + one [M,K]
    int8 add per iteration (HBM-bound, ~0.1 ms at these shapes)."""

    @jax.jit
    def run(xq, xs, wq, ws):
        def body(_, carry):
            seed, acc = carry
            out = fn(xq + seed, xs, wq, ws)
            s = jnp.sum(out.astype(jnp.float32))
            seed = (s * 1e-20).astype(jnp.int8)  # ~0, but data-dependent
            return seed, acc + s

        _, acc = lax.fori_loop(
            0, loop, body, (jnp.int8(0), jnp.float32(0.0)))
        return acc

    np.asarray(run(xq, xs, wq, ws))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(xq, xs, wq, ws))
        ts.append((time.perf_counter() - t0) / loop)
    return float(np.median(ts))


def xla_w8a8(xq, xs, wq, ws):
    acc = lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs * ws).astype(jnp.bfloat16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--loop", type=int, default=8)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} ({dev.platform})")
    print("| shape | variant | bm/bn/bk | TOPS | ms | ok |")
    print("|---|---|---|---|---|---|")
    key = jax.random.PRNGKey(0)

    for name, M, K, N in SHAPES:
        xq = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
        xs = jnp.abs(jax.random.normal(key, (M, 1), jnp.float32)) * 0.01
        wq = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
        ws = jnp.full((N,), 0.01, jnp.float32)
        flops = 2.0 * M * K * N

        ref = np.asarray(xla_w8a8(xq, xs, wq, ws))
        sec = timeit_chained(xla_w8a8, xq, xs, wq, ws,
                             reps=args.reps, loop=args.loop)
        print(f"| {name} | xla | - | {flops/sec/1e12:.1f} | "
              f"{sec*1e3:.2f} | - |", flush=True)

        # bm=1536 at full K crashes the remote Mosaic compiler (HTTP 500,
        # first sweep); bk must be a 128-multiple divisor of K
        # (K=18944 = 512*37 -> only 128/256/512 are legal partial bk).
        cfgs = [(512, 512, 0) if K <= 4096 else None,
                (512, 512, 512),
                (1536, 512, 512),
                (512, 1024, 512) if N % 1024 == 0 else None,
                (1536, 1024, 512) if N % 1024 == 0 else None,
                (512, 512, 1792) if K % 1792 == 0 else None]
        for cfg in cfgs:
            if cfg is None:
                continue
            bm, bn, bk = cfg
            try:
                out = int8_matmul(xq, xs, wq, ws, bm=bm, bn=bn, bk=bk)
                ok = bool(np.array_equal(np.asarray(out), ref))

                def pfn(a, b, c, d, bm=bm, bn=bn, bk=bk):
                    return int8_matmul(a, b, c, d, bm=bm, bn=bn, bk=bk)

                sec = timeit_chained(pfn, xq, xs, wq, ws,
                                     reps=args.reps, loop=args.loop)
                print(f"| {name} | pallas | {bm}/{bn}/{bk or K} | "
                      f"{flops/sec/1e12:.1f} | {sec*1e3:.2f} | {ok} |",
                      flush=True)
            except Exception as e:
                print(f"| {name} | pallas | {bm}/{bn}/{bk or K} | FAIL | - | "
                      f"{type(e).__name__}: {str(e)[:60]} |", flush=True)


if __name__ == "__main__":
    main()
