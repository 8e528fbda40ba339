"""TaylorSeer schedule + math + engine integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bagel_tpu.inference.taylorseer import (
    taylor_eval,
    taylor_update,
    taylorseer_schedule,
)


def test_schedule_matches_reference_cal_type():
    """Replicate cal_type (taylorseer.py:79-114) step by step."""
    num_steps, thresh, enhance = 20, 3, 5
    sch = taylorseer_schedule(num_steps, thresh, enhance)

    counter = 0
    expected = []
    for step in range(num_steps):
        first = step < enhance
        if first or counter == thresh - 1:
            expected.append(True)
            counter = 0
        else:
            counter += 1
            expected.append(False)
    np.testing.assert_array_equal(sch.is_full, expected)
    # x offsets on taylor steps count from the last full step
    assert sch.x_off[5] == 1.0 and sch.x_off[6] == 2.0
    assert sch.is_full[7] and sch.x_off[7] == 0.0


def test_taylor_exact_on_polynomial():
    """With enough full observations of a quadratic signal, extrapolation is
    exact (finite differences of polynomials)."""
    max_order = 2

    def f(s):  # quadratic in step index
        return jnp.asarray([1.0 + 2.0 * s + 0.5 * s * s])

    factors = jnp.zeros((max_order + 1, 1), jnp.float32)
    n_valid = jnp.zeros((), jnp.int32)
    # observe at steps 0, 1, 2 (delta 1, growing order)
    for s in range(3):
        factors, n_valid = taylor_update(
            factors, n_valid, f(s), jnp.asarray(1.0), jnp.asarray(True)
        )
    assert int(n_valid) == 3
    # forward-difference Taylor of a quadratic predicts s=3,4 exactly... up
    # to the forward-difference bias: f(s+x) = f0 + x*df + x^2/2*d2f with
    # df, d2f the *backward* differences at s=2. For a quadratic, second
    # difference is exact (=a*2), first difference is f(2)-f(1) = slope at
    # midpoint 1.5: prediction error = a*x (Taylor-vs-difference mismatch).
    pred = taylor_eval(factors, n_valid, jnp.asarray(1.0))
    exact = f(3)[0]
    assert abs(float(pred[0]) - float(exact)) < 0.51  # bounded, small


def test_engine_taylorseer_runs_and_tracks_plain():
    from bagel_tpu.configs import tiny_bagel
    from bagel_tpu.data.tokenizer import MockTokenizer
    from bagel_tpu.inference.engine import BagelEngine
    from bagel_tpu.models.bagel import init_bagel_params

    cfg = tiny_bagel()
    tok = MockTokenizer(cfg.llm.vocab_size)
    params = init_bagel_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    # zero llm2vae (reference init parity) freezes the flow — randomize so
    # the plain-vs-taylorseer closeness below compares real trajectories
    params["llm2vae"]["w"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(9), params["llm2vae"]["w"].shape, jnp.float32
    )
    eng = BagelEngine(params, cfg, tok, tok.new_token_ids, max_kv=512)

    kwargs = dict(
        text="a tree", image_shapes=(32, 32), num_timesteps=8,
        cfg_text_scale=2.0, cfg_img_scale=1.0, timestep_shift=1.0,
        rng=jax.random.PRNGKey(5),
    )
    plain = eng(**kwargs)["image"]
    fast = eng(enable_taylorseer=True, **kwargs)["image"]
    assert fast.shape == plain.shape
    # same seed, mostly-full schedule at 8 steps -> images stay close
    diff = np.abs(plain.astype(np.float32) - fast.astype(np.float32)).mean()
    assert diff < 60.0, diff
    assert np.isfinite(fast.astype(np.float32)).all()

    # schedule knobs (r4 sweep lever): a sparser schedule (threshold 5,
    # 2-step warmup) must change the trajectory (schedule really applied)
    # yet stay close to the plain run
    sparse = eng(enable_taylorseer=True, taylorseer_threshold=5,
                 taylorseer_first_enhance=2, **kwargs)["image"]
    assert np.abs(sparse.astype(np.float32) - fast.astype(np.float32)).max() > 0
    diff_sparse = np.abs(
        plain.astype(np.float32) - sparse.astype(np.float32)
    ).mean()
    assert diff_sparse < 80.0, diff_sparse


def test_taylorseer_knobs_split_gen_batch_key():
    """Requests at different step-cache schedules must not share a batched
    denoise (the schedule arrays differ per job)."""
    from bagel_tpu.inference.engine import gen_batch_key

    a = gen_batch_key(dict(text="x", enable_taylorseer=True))
    b = gen_batch_key(dict(text="x", enable_taylorseer=True,
                           taylorseer_threshold=5))
    c = gen_batch_key(dict(text="x", enable_taylorseer=True,
                           taylorseer_threshold=3))
    assert a is not None and b is not None
    assert a != b and a == c


def test_phase_split_carries_factor_cache():
    """Splitting a schedule across two _denoise_phase_taylorseer calls with
    the factor cache threaded through must equal one continuous call — the
    cross-cfg_interval boundary semantics of the reference (one cache_dic
    per branch for the whole 50-step run, bagel.py:680-689)."""
    import dataclasses

    from bagel_tpu.configs import tiny_bagel
    from bagel_tpu.inference.engine import (
        TAYLORSEER_MAX_ORDER,
        _denoise_phase_taylorseer,
    )
    from bagel_tpu.models import qwen2
    from bagel_tpu.models.bagel import init_bagel_params, shifted_timesteps

    cfg = tiny_bagel()
    params = init_bagel_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    # llm2vae is zero-init per reference semantics (bagel.py:96-99), which
    # makes the random-init velocity field constant; randomize it so Taylor
    # extrapolation has signal to distinguish carried vs fresh caches.
    params["llm2vae"]["w"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(9), params["llm2vae"]["w"].shape, jnp.float32
    )
    n = 4  # latent tokens
    pd = cfg.patch_latent_dim
    steps = 12

    cache = qwen2.kv_cache_init(cfg.llm, 1, 256, jnp.float32)
    cache = dataclasses.replace(
        cache, length=jnp.asarray([8], jnp.int32)
    )
    rope = jnp.asarray([8], jnp.int32)
    lat_pos = jnp.zeros((n,), jnp.int32)
    boundary = jnp.asarray([3, 4], jnp.int32)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, n, pd), jnp.float32)
    ts_all, dts_all = shifted_timesteps(steps, 1.0)  # steps-1 entries
    sch = taylorseer_schedule(len(ts_all))

    common = dict(
        n_jobs=1, n_branches=1, cfg_text_scale=1.0, cfg_img_scale=1.0,
        cfg_renorm_type="global", cfg_renorm_min=0.0,
    )
    f0 = jnp.zeros((TAYLORSEER_MAX_ORDER + 1, 1, n, pd), jnp.float32)
    nv0 = jnp.zeros((1,), jnp.int32)

    def phase(x, f, nv, sl):
        return _denoise_phase_taylorseer(
            params, cfg, x, cache.k, cache.v, cache.length, rope, lat_pos,
            boundary, ts_all[sl], dts_all[sl],
            jnp.asarray(sch.is_full[sl]), jnp.asarray(sch.x_off[sl]),
            jnp.asarray(sch.delta[sl]), jnp.asarray(sch.grow[sl]),
            f, nv, **common,
        )

    x_full, _, _ = phase(x0, f0, nv0, slice(None))
    # split at step 7 (mid-Taylor-cadence) and thread the cache
    x_a, f_a, nv_a = phase(x0, f0, nv0, slice(0, 7))
    x_b, _, _ = phase(x_a, f_a, nv_a, slice(7, steps))
    from asserts import assert_close_live
    assert_close_live(x_b, x_full, moved_from=x0, rtol=1e-5, atol=1e-5,
                      name="taylorseer carry")
    # a fresh cache at the boundary must NOT reproduce the continuous run
    x_c, _, _ = phase(x_a, f0, nv0, slice(7, steps))
    assert np.abs(np.asarray(x_full) - np.asarray(x_c)).max() > 1e-6
