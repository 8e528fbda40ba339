"""On-chip A/B: bf16 vs int8-MXU flash attention at the denoise shape.

Result (v5e, 2026-08-19, NOTES r4): int8 is 0.70x — SLOWER. The VPU cost
of quantizing q/k/v and requantizing the probability tile per block
exceeds the int8 MXU gain, mirroring the r3 int4-GEMV negative result.
Run from the repo root: `python scripts/ab_int8_flash.py`.
"""
import sys; sys.path.insert(0, ".")
import time
import numpy as np
import jax
import jax.numpy as jnp

from bagel_tpu.ops import flash

print("# backend:", jax.default_backend())
rng = np.random.default_rng(0)
b, t, s, h, kh, d = 3, 4098, 4608, 28, 4, 128
q = jnp.asarray(rng.standard_normal((b, t, h, d)) * 0.3, jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((b, s, kh, d)) * 0.3, jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((b, s, kh, d)) * 0.3, jnp.bfloat16)
past = jnp.asarray([66, 66, 66], jnp.int32)
valid = jnp.asarray([t, t, t], jnp.int32)


def run(flag, reps=20):
    f = jax.jit(lambda q_, k_, v_: flash.flash_cached_attention(
        q_, k_, v_, past, valid, causal=False, int8_compute=flag))
    out = np.asarray(f(q, k, v), np.float32)  # compile+warm
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(q, k, v)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / reps
    return out, dt


o_bf, t_bf = run(False)
o_i8, t_i8 = run(True)
mae = float(np.abs(o_bf - o_i8).mean())
scale = float(np.abs(o_bf).mean())
print(f"bf16 {t_bf*1e3:.2f} ms   int8 {t_i8*1e3:.2f} ms   "
      f"speedup {t_bf/t_i8:.3f}x")
print(f"mae {mae:.6f} rel {mae/scale:.4f} (outputs {'DIFFER' if mae > 0 else 'IDENTICAL'})")
print("finite:", bool(np.isfinite(o_i8).all()))
