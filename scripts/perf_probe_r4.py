"""Round-4 on-chip probe: exact-block denoise, TaylorSeer schedule sweep,
optional 2-job batched denoise.

One process for everything (each fresh process pays a multi-minute
first-execute tax on the tunneled TPU, NOTES r3). The TaylorSeer sweep
rides ONE compiled program: fresh_threshold / first_enhance / all_full only
change the VALUES of same-shape schedule arrays (bench._production_run_fn),
so extra sweep points cost one image each, not one compile each.

Outputs (grep-able):
  PROD   default-schedule production image seconds (headline check)
  SWEEP  per-(threshold, first_enhance) seconds + latent MAE vs all-full
  J2     2-job batched denoise seconds per image pair

Usage: timeout 5400 python scripts/perf_probe_r4.py [--depth 28]
       [--dtype w8a8] [--reps 3] [--j2] [--skip_sweep]
All timings sync via np.asarray (block_until_ready is a no-op on axon).
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=28)
    ap.add_argument("--image", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--dtype", default="w8a8")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--j2", action="store_true")
    ap.add_argument("--skip_sweep", action="store_true")
    ap.add_argument("--points", default=None,
                    help="sweep points as 'thr:fe,thr:fe,...' "
                    "(default: 2:5,3:5,4:5,5:5,6:5,3:3)")
    ap.add_argument("--save_latent", default=None,
                    help="save the PROD final latent to this .npy")
    ap.add_argument("--ref_latent", default=None,
                    help="compare the PROD latent to this .npy (MAE) — "
                    "cross-process A/B, e.g. BAGEL_FLASH_INT8=1 vs 0")
    args = ap.parse_args()

    import bench as bench_mod

    bench_mod._honor_platform_env()  # JAX_PLATFORMS env is ignored (NOTES)
    import jax
    import jax.numpy as jnp

    t_start = time.time()
    cfg, params, cache, x0, lat_pos, boundary, rope = (
        bench_mod._build_denoise(args.depth, args.image, args.dtype)
    )
    print(f"# build done {time.time()-t_start:.0f}s; n={x0.shape[0]} "
          f"(exact block {x0.shape[0]+2})", flush=True)

    def time_run(run, x, reps):
        np.asarray(run(params, x))  # compile + warmup
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(params, x))
            times.append(time.perf_counter() - t0)
        return times

    # -- 1. default production schedule (the bench headline path) ----------
    run_def, detail = bench_mod._production_run_fn(
        cfg, cache, x0, lat_pos, boundary, rope, args.steps
    )
    times = time_run(run_def, x0, args.reps)
    print(f"PROD depth={args.depth} {args.dtype} exact-block "
          f"median={np.median(times):.3f}s runs="
          f"{[round(t, 3) for t in times]} detail={detail}", flush=True)
    if args.save_latent or args.ref_latent:
        lat = np.asarray(run_def(params, x0), np.float32)
        if args.save_latent:
            np.save(args.save_latent, lat)
        if args.ref_latent:
            ref = np.load(args.ref_latent)
            mae = float(np.abs(lat - ref).mean())
            rel = mae / (float(np.abs(ref).mean()) or 1.0)
            print(f"LATENT mae_vs_ref={mae:.5f} rel={rel:.4f}", flush=True)

    # -- 2. TaylorSeer schedule sweep (same compiled program) --------------
    if not args.skip_sweep:
        run_full, _ = bench_mod._production_run_fn(
            cfg, cache, x0, lat_pos, boundary, rope, args.steps,
            all_full=True,
        )
        t_full = time_run(run_full, x0, 1)
        lat_ref = np.asarray(run_full(params, x0), np.float32)
        ref_scale = float(np.abs(lat_ref).mean()) or 1.0
        print(f"SWEEP all_full {t_full[0]:.3f}s (quality reference)",
              flush=True)
        if args.points:
            points = [tuple(int(v) for v in p.split(":"))
                      for p in args.points.split(",")]
        else:
            points = [(t, 5) for t in (2, 3, 4, 5, 6)] + [(3, 3)]
        for thr, fe in points:
                run_s, det_s = bench_mod._production_run_fn(
                    cfg, cache, x0, lat_pos, boundary, rope, args.steps,
                    fresh_threshold=thr, first_enhance=fe,
                )
                ts = time_run(run_s, x0, 1)
                lat = np.asarray(run_s(params, x0), np.float32)
                mae = float(np.abs(lat - lat_ref).mean())
                print(f"SWEEP thr={thr} fe={fe} {ts[0]:.3f}s "
                      f"full_fwds={det_s['full_forwards_on']}+"
                      f"{det_s['full_forwards_off']} "
                      f"mae_vs_allfull={mae:.5f} "
                      f"rel={mae/ref_scale:.4f}", flush=True)

    # -- 3. 2-job batched denoise (one scan, J=2): serving gen_batch win ---
    if args.j2:
        from bagel_tpu.inference.engine import (
            TAYLORSEER_MAX_ORDER,
            _denoise_phase_taylorseer,
        )
        from bagel_tpu.inference.taylorseer import taylorseer_schedule
        from bagel_tpu.models.bagel import shifted_timesteps

        n, pd = x0.shape
        ts_arr, dts = shifted_timesteps(args.steps, cfg.timestep_shift)
        ts_np = np.asarray(ts_arr)
        cfg_on = (ts_np > 0.4) & (ts_np <= 1.0)
        idx_on = np.nonzero(cfg_on)[0]
        idx_off = np.nonzero(~cfg_on)[0]
        sch = taylorseer_schedule(len(ts_np))
        k2 = jnp.concatenate([cache.k, cache.k], axis=1)  # [L, 6, S, KH, D]
        v2 = jnp.concatenate([cache.v, cache.v], axis=1)
        ln2 = jnp.concatenate([cache.length, cache.length], 0)
        rope2 = jnp.concatenate([rope, rope], 0)
        x2 = jnp.stack([x0, x0 + 0.01], 0)
        common = dict(cfg_text_scale=4.0, cfg_img_scale=1.5,
                      cfg_renorm_type="global", cfg_renorm_min=0.0)

        def phase2(params_, x, idxs, k, v, ln, rp, f0, nv0, b):
            return _denoise_phase_taylorseer(
                params_, cfg, x, k, v, ln, rp, lat_pos, boundary,
                ts_arr[idxs], dts[idxs],
                jnp.asarray(sch.is_full[idxs]), jnp.asarray(sch.x_off[idxs]),
                jnp.asarray(sch.delta[idxs]), jnp.asarray(sch.grow[idxs]),
                f0, nv0, n_jobs=2, n_branches=b, **common,
            )

        k1 = jnp.concatenate([cache.k[:, :1], cache.k[:, :1]], axis=1)
        v1 = jnp.concatenate([cache.v[:, :1], cache.v[:, :1]], axis=1)
        ln1 = jnp.concatenate([cache.length[:1], cache.length[:1]], 0)
        rp1 = jnp.concatenate([rope[:1], rope[:1]], 0)

        def run2(params_, x):
            f = jnp.zeros((TAYLORSEER_MAX_ORDER + 1, 6, n, pd), jnp.float32)
            nv = jnp.zeros((6,), jnp.int32)
            x, f, nv = phase2(params_, x, idx_on, k2, v2, ln2, rope2, f, nv, 3)
            fj = f.reshape(f.shape[0], 2, 3, n, pd)[:, :, :1]
            x, _, _ = phase2(params_, x, idx_off, k1, v1, ln1, rp1,
                             fj.reshape(f.shape[0], 2, n, pd),
                             nv.reshape(2, 3)[:, :1].reshape(2), 1)
            return x

        times2 = time_run(run2, x2, args.reps)
        med2 = float(np.median(times2))
        print(f"J2 pair={med2:.3f}s per_image={med2/2:.3f}s runs="
              f"{[round(t, 3) for t in times2]}", flush=True)

    print(f"# total wall {time.time()-t_start:.0f}s", flush=True)


if __name__ == "__main__":
    main()
