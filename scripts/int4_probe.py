"""One-process int4-kernel probe on the real chip.

Validates the fixed k-major tiling of ops/int4_matmul on hardware (the
(m, bkp) layout compiled but produced garbage-rejecting mosaic errors
pre-9712e33; interpret-mode tests can't catch lowering issues), then
measures the kernel against the XLA dequant path and the full-depth int4
decode + serving numbers it exists for.

One process for everything: each fresh process pays a multi-minute
first-dispatch queue tax on the tunneled TPU (NOTES round 3).

Usage: timeout 3000 python scripts/int4_probe.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from bagel_tpu.ops.int4_matmul import int4_matmul
    from bagel_tpu.utils.quant import dequantize_weight4, quantize_weight_int4

    print(f"backend={jax.default_backend()}", flush=True)

    # ---- 1. on-chip exactness vs the dequant path --------------------------
    for m, din, dout, tag in (
        (1, 3584, 4608, "qkv-gemv"),
        (8, 3584, 37888, "gate_up-m8"),
        (1, 18944, 3584, "down-gemv"),
    ):
        k = jax.random.PRNGKey(hash(tag) % (2**31))
        w = jax.random.normal(k, (din, dout), jnp.float32) * 0.02
        leaf = quantize_weight_int4(w)
        x = jax.random.normal(jax.random.PRNGKey(m), (m, din), jnp.bfloat16)
        got = np.asarray(int4_matmul(x, leaf["w_p4"], leaf["scale4"]),
                         np.float32)
        ref = np.asarray(
            jnp.dot(x, dequantize_weight4(leaf, jnp.bfloat16),
                    preferred_element_type=jnp.float32), np.float32)
        scale = max(np.abs(ref).max(), 1e-6)
        err = np.abs(got - ref).max() / scale
        print(f"EXACT {tag}: rel_max_err={err:.3e}", flush=True)
        assert err < 2e-2, (tag, err)

    # ---- 2. GEMV microbench: kernel vs XLA dequant -------------------------
    # The tunnel's per-dispatch round trip is ~25-40 ms (NOTES) — a single
    # kernel call is pure floor. Chain N data-dependent square GEMVs inside
    # one jit (each input scaled by the previous output, so nothing hoists)
    # and report per-call time.
    from functools import partial

    N_CHAIN = 50
    din = dout = 3584  # o-proj shape: square so calls chain
    w = jax.random.normal(jax.random.PRNGKey(0), (din, dout), jnp.float32) * 0.02
    leaf = quantize_weight_int4(w)
    wp, s4 = leaf["w_p4"], leaf["scale4"]

    @partial(jax.jit, static_argnames=("m",))
    def chain_kernel(x, wp, s4, m):
        def step(x, _):
            y = int4_matmul(x, wp, s4)
            return (y * jnp.bfloat16(0.02)).astype(jnp.bfloat16), None
        return jax.lax.scan(step, x, None, length=N_CHAIN)[0]

    @partial(jax.jit, static_argnames=("m",))
    def chain_dequant(x, wp, s4, m):
        def step(x, _):
            y = jnp.dot(
                x, dequantize_weight4({"w_p4": wp, "scale4": s4},
                                      jnp.bfloat16),
                preferred_element_type=jnp.float32)
            return (y * 0.02).astype(jnp.bfloat16), None
        return jax.lax.scan(step, x, None, length=N_CHAIN)[0]

    def timed(fn, *args, reps=3):
        np.asarray(jnp.sum(fn(*args).astype(jnp.float32)))  # compile+warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jnp.sum(fn(*args).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best / N_CHAIN

    for m in (1, 8):
        x = jax.random.normal(jax.random.PRNGKey(m), (m, din), jnp.bfloat16)
        tk = timed(chain_kernel, x, wp, s4, m)
        td = timed(chain_dequant, x, wp, s4, m)
        # speed-of-light: din*dout/2 bytes at ~819 GB/s v5e HBM
        sol = din * dout / 2 / 819e9
        print(f"GEMV m={m} ({din}x{dout}): kernel {tk*1e6:.0f} us vs "
              f"dequant {td*1e6:.0f} us ({td/tk:.2f}x); SoL {sol*1e6:.0f} us"
              f" ({sol/tk*100:.0f}% of SoL)", flush=True)

    # ---- 3. full-depth int4 decode ----------------------------------------
    import bench as bench_mod

    tok_s = bench_mod.run_decode_bench(28, "int4")
    print(f"DECODE int4 full-depth: {tok_s:.1f} tok/s", flush=True)

    # ---- 4. serving aggregate at int4 -------------------------------------
    tok_s, total, elapsed = bench_mod.run_serving_bench(28, "int4", slots=8)
    print(f"SERVE int4 slots=8: {tok_s:.1f} tok/s aggregate "
          f"({total} tok in {elapsed:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
