"""Decompose the int4 GEMV kernel's on-chip cost: pure kernel vs the
activation-layout prep vs plain-dot baselines, all inside one process.

Usage: timeout 1800 python scripts/int4_kernel_probe.py
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

# 1000 chained calls per dispatch: the tunnel's 25-40 ms round-trip floor
# divided by N must be small vs the per-call time (at N=50 the floor alone
# fabricated ~500-800 us/call — a plain bf16 dot "measured" 527 us)
N = 1000


def main():
    import jax
    import jax.numpy as jnp

    from bagel_tpu.ops import int4_matmul as m4
    from bagel_tpu.utils.quant import quantize_weight_int4

    print(f"backend={jax.default_backend()}", flush=True)

    def timed(fn, *args, reps=3):
        np.asarray(jnp.sum(fn(*args).astype(jnp.float32)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jnp.sum(fn(*args).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best / N

    def report(tag, t, nbytes):
        sol = nbytes / 819e9
        print(f"{tag}: {t*1e6:.0f} us/call, SoL {sol*1e6:.0f} us "
              f"({sol/t*100:.0f}%)", flush=True)

    for din, dout, tag in ((3584, 3584, "o-proj"), (3584, 37888, "gate_up"),
                           (18944, 3584, "down")):
        w = jax.random.normal(jax.random.PRNGKey(0), (din, dout),
                              jnp.float32) * 0.02
        leaf = quantize_weight_int4(w)
        w3, s3 = m4._prep_weights(leaf["w_p4"], leaf["scale4"])
        x = jax.random.normal(jax.random.PRNGKey(1), (8, din), jnp.bfloat16)
        xe, xo = m4._prep_activations(x, w3.shape[0])

        # 1. pure kernel, prelaid inputs; acc*0.0 defeats hoisting without
        # being constant-foldable (float 0*NaN semantics)
        @jax.jit
        def pure(xe, xo, w3, s3):
            def step(acc, _):
                y = m4._int4_call(
                    xe + (acc * 0.0).astype(jnp.bfloat16), xo, w3, s3)
                return acc + y[0, 0].astype(jnp.float32), None
            return jax.lax.scan(step, jnp.float32(0), None, length=N)[0]

        # 2. full path incl. per-call activation prep
        @jax.jit
        def full(x, wp, s4):
            def step(acc, _):
                y = m4.int4_matmul(x + (acc * 0.0).astype(jnp.bfloat16),
                                   wp, s4)
                return acc + y[0, 0].astype(jnp.float32), None
            return jax.lax.scan(step, jnp.float32(0), None, length=N)[0]

        nbytes = din * dout // 2
        report(f"{tag} pure-kernel", timed(pure, xe, xo, w3, s3), nbytes)
        report(f"{tag} full-path ",
               timed(full, x, leaf["w_p4"], leaf["scale4"]), nbytes)

    # 3. calibration: plain bf16 dot and int8 dequant dot at o-proj shape
    din = dout = 3584
    wb = jax.random.normal(jax.random.PRNGKey(0), (din, dout), jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, din), jnp.bfloat16)

    @jax.jit
    def plain(x, wb):
        def step(acc, _):
            y = jnp.dot(x + (acc * 0.0).astype(jnp.bfloat16), wb,
                        preferred_element_type=jnp.float32)
            return acc + y[0, 0], None
        return jax.lax.scan(step, jnp.float32(0), None, length=N)[0]

    report("o-proj plain bf16 dot", timed(plain, x, wb), din * dout * 2)

    from bagel_tpu.utils.quant import quantize_weight
    q8 = quantize_weight(wb.astype(jnp.float32))

    @jax.jit
    def deq8(x, wq, s):
        def step(acc, _):
            w = (wq.astype(jnp.float32) * s[None, :]).astype(jnp.bfloat16)
            y = jnp.dot(x + (acc * 0.0).astype(jnp.bfloat16), w,
                        preferred_element_type=jnp.float32)
            return acc + y[0, 0], None
        return jax.lax.scan(step, jnp.float32(0), None, length=N)[0]

    report("o-proj int8 dequant dot", timed(deq8, x, q8["w_q"], q8["scale"]),
           din * dout)


if __name__ == "__main__":
    main()
