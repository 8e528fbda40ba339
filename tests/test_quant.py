"""int8 weight-only quantization: accuracy + end-to-end drop-in."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bagel_tpu.configs import tiny_qwen2
from bagel_tpu.models.qwen2 import (
    decode_text,
    embed_tokens,
    init_qwen2_params,
    kv_cache_init,
    llm_extend,
    lm_logits,
)
from bagel_tpu.utils.quant import (
    dequantize_weight,
    quantize_llm_params,
    quantize_weight,
)


def test_roundtrip_error_small():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32) * 0.03)
    q = quantize_weight(w)
    assert q["w_q"].dtype == jnp.int8 and q["scale"].shape == (128,)
    back = dequantize_weight(q, jnp.float32)
    rel = float(jnp.abs(back - w).max() / jnp.abs(w).max())
    assert rel < 0.01  # per-channel int8: <1% of the channel max


def test_quantized_llm_outputs_close():
    cfg = tiny_qwen2(layer_module="mot")
    params = init_qwen2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qparams = quantize_llm_params(params)
    assert qparams["layers"]["attn"]["q"]["w_q"].dtype == jnp.int8
    assert qparams["embed"]["w_q"].dtype == jnp.int8

    T = 12
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, T), 0, cfg.vocab_size)
    pos = jnp.arange(T)[None]
    cache = kv_cache_init(cfg, 1, 32, jnp.float32)

    ref, _ = llm_extend(
        params, cfg, embed_tokens(params, ids), pos, cache, jnp.asarray([T]),
        und_len=T, causal=True, update_cache=False, precision="float32",
    )
    got, _ = llm_extend(
        qparams, cfg, embed_tokens(qparams, ids).astype(jnp.float32), pos,
        cache, jnp.asarray([T]),
        und_len=T, causal=True, update_cache=False, precision="float32",
    )
    err = float(jnp.abs(got - ref).mean() / jnp.abs(ref).mean())
    assert err < 0.05, err

    # greedy decode still runs and produces mostly matching tokens
    cache_f = kv_cache_init(cfg, 1, 64, jnp.float32)
    _, cache_f = llm_extend(
        params, cfg, embed_tokens(params, ids), pos, cache_f,
        jnp.asarray([T]), und_len=T, causal=True, update_cache=True,
        precision="float32",
    )
    toks_f, _ = decode_text(params, cfg, cache_f, jnp.asarray([1]),
                            jnp.asarray([T]), max_steps=6, eos_id=-1,
                            precision="float32")
    cache_q = kv_cache_init(cfg, 1, 64, jnp.float32)
    _, cache_q = llm_extend(
        qparams, cfg, embed_tokens(qparams, ids).astype(jnp.float32), pos,
        cache_q, jnp.asarray([T]), und_len=T, causal=True, update_cache=True,
        precision="float32",
    )
    toks_q, _ = decode_text(qparams, cfg, cache_q, jnp.asarray([1]),
                            jnp.asarray([T]), max_steps=6, eos_id=-1,
                            precision="float32")
    # random-init logits are near-uniform so argmax may flip; just sanity
    assert toks_q.shape == toks_f.shape


def test_int4_nf4_roundtrip_and_linear():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bagel_tpu.models.qwen2 import _linear
    from bagel_tpu.utils.quant import (
        dequantize_weight4,
        quantize_weight_int4,
        quantize_weight_nf4,
    )

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((256, 64)) * 0.05, jnp.float32)
    for quant in (quantize_weight_int4, quantize_weight_nf4):
        q = quant(w, group=128)
        packed = q.get("w_p4", q.get("w_nf4"))
        assert packed.shape == (128, 64) and packed.dtype == jnp.uint8
        deq = dequantize_weight4(q, jnp.float32)
        err = float(jnp.abs(deq - w).max() / jnp.abs(w).max())
        assert err < 0.2, err  # 4-bit per-group quantization error bound

        x = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)
        got = _linear(x, q)
        want = x @ deq
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


def test_stacked_int4_quant():
    import jax.numpy as jnp
    import numpy as np

    from bagel_tpu.utils.quant import dequantize_weight4, quantize_weight_int4

    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((3, 256, 32)) * 0.1, jnp.float32)
    q = quantize_weight_int4(w, group=64)
    assert q["w_p4"].shape == (3, 128, 32)
    assert q["scale4"].shape == (3, 4, 32)
    deq = dequantize_weight4(q, jnp.float32)
    assert deq.shape == w.shape
    assert float(jnp.abs(deq - w).max()) < 0.035


def test_w8a8_linear_accuracy():
    """int8×int8 dot with dynamic activation quant tracks the fp32 matmul."""
    from bagel_tpu.models.qwen2 import _linear

    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((256, 128)) * 0.03, jnp.float32)
    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    q = quantize_weight(w)
    leaf = {"w_q8": q["w_q"], "scale": q["scale"],
            "b": jnp.asarray(rng.standard_normal(128) * 0.01, jnp.float32)}
    got = _linear(x, leaf)
    want = x @ w + leaf["b"]
    rel = float(jnp.abs(got - want).mean() / jnp.abs(want).mean())
    assert rel < 0.02, rel  # two int8 quantizations: ~1% relative error


def test_w8a8_llm_outputs_close():
    cfg = tiny_qwen2(layer_module="mot")
    params = init_qwen2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qparams = quantize_llm_params(params, "w8a8")
    leaf = qparams["layers"]["attn"]["q"]
    assert "w_q8" in leaf and leaf["w_q8"].dtype == jnp.int8
    # embedding / lm_head stay weight-only
    assert "w_q" in qparams["lm_head"]

    T = 12
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, T), 0, cfg.vocab_size)
    pos = jnp.arange(T)[None]
    cache = kv_cache_init(cfg, 1, 32, jnp.float32)
    ref, _ = llm_extend(
        params, cfg, embed_tokens(params, ids), pos, cache, jnp.asarray([T]),
        und_len=T, causal=True, update_cache=False, precision="float32",
    )
    got, _ = llm_extend(
        qparams, cfg, embed_tokens(qparams, ids).astype(jnp.float32), pos,
        cache, jnp.asarray([T]),
        und_len=T, causal=True, update_cache=False, precision="float32",
    )
    err = float(jnp.abs(got - ref).mean() / jnp.abs(ref).mean())
    assert err < 0.08, err


def test_w8a8_engine_runs():
    import jax

    from bagel_tpu.configs import tiny_bagel
    from bagel_tpu.data.tokenizer import MockTokenizer
    from bagel_tpu.inference.engine import BagelEngine
    from bagel_tpu.models.bagel import init_bagel_params
    from bagel_tpu.utils.quant import quantize_bagel_params

    cfg = tiny_bagel()
    tok = MockTokenizer(cfg.llm.vocab_size)
    params = init_bagel_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = quantize_bagel_params(params, "w8a8")
    eng = BagelEngine(qparams, cfg, tok, tok.new_token_ids, max_kv=512)
    out = eng(text="a cat", image_shapes=(32, 32), num_timesteps=4,
              cfg_text_scale=2.0, rng=jax.random.PRNGKey(1))
    assert out["image"].shape == (32, 32, 3)
    assert np.isfinite(out["image"].astype(np.float32)).all()


def test_quantize_llm_params_int4_engine_runs():
    """End-to-end: int4-quantized tiny engine still generates."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bagel_tpu.configs import tiny_bagel
    from bagel_tpu.data.tokenizer import MockTokenizer
    from bagel_tpu.inference.engine import BagelEngine
    from bagel_tpu.models.bagel import init_bagel_params
    from bagel_tpu.utils.quant import quantize_bagel_params

    cfg = tiny_bagel()
    tok = MockTokenizer(cfg.llm.vocab_size)
    params = init_bagel_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = quantize_bagel_params(params, "int4")
    eng = BagelEngine(qparams, cfg, tok, tok.new_token_ids, max_kv=512)
    out = eng(text="a cat", image_shapes=(32, 32), num_timesteps=4,
              cfg_text_scale=2.0, rng=jax.random.PRNGKey(1))
    assert out["image"].shape == (32, 32, 3)
    assert np.isfinite(out["image"].astype(np.float32)).all()


def test_int4_fused_matmul_kernel_matches_dequant():
    """ops/int4_matmul (Pallas fused dequant-GEMV) == the XLA dequant path
    on the real packed-nibble layout, including multi-group scales."""
    import jax
    import jax.numpy as jnp

    from bagel_tpu.ops.int4_matmul import int4_matmul
    from bagel_tpu.utils.quant import dequantize_weight4, quantize_weight_int4

    rng = np.random.default_rng(0)
    in_, out = 256, 512  # two scale groups, one output tile
    w = jnp.asarray(rng.standard_normal((in_, out)).astype(np.float32))
    leaf = quantize_weight_int4(w, group=128)
    for m in (1, 3, 8):
        x = jnp.asarray(rng.standard_normal((m, in_)).astype(np.float32))
        # bf16-dequant reference — the exact arithmetic of the XLA
        # serving path (the kernel folds (w-8)*scale to bf16 per element,
        # the same rounding dequantize_weight4(..., bf16) applies)
        want = jnp.dot(
            x.astype(jnp.bfloat16),
            dequantize_weight4(leaf, jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        got = int4_matmul(x, leaf["w_p4"], leaf["scale4"], interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=2e-2,
        )


def test_int4_kernel_padded_kgroups():
    """nk > _KT_MAX forces zero-padded tail k-groups (the `down` matmul,
    in=18944 -> nk=148, pads to 192): padding must contribute nothing."""
    import jax.numpy as jnp

    from bagel_tpu.ops import int4_matmul as m4
    from bagel_tpu.utils.quant import dequantize_weight4, quantize_weight_int4

    rng = np.random.default_rng(1)
    in_, out = (m4._KT_MAX + 2) * m4.GROUP, 512  # nk = _KT_MAX + 2 -> pads
    w = jnp.asarray(rng.standard_normal((in_, out)).astype(np.float32) * 0.1)
    leaf = quantize_weight_int4(w, group=m4.GROUP)
    x = jnp.asarray(rng.standard_normal((2, in_)).astype(np.float32))
    want = jnp.dot(
        x.astype(jnp.bfloat16), dequantize_weight4(leaf, jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    got = m4.int4_matmul(x, leaf["w_p4"], leaf["scale4"], interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_int4_kernel_wide_shapes():
    import jax.numpy as jnp

    from bagel_tpu.ops.int4_matmul import int4_matmul
    from bagel_tpu.utils.quant import dequantize_weight4, quantize_weight_int4

    rng = np.random.default_rng(1)
    in_, out = 512, 1024
    w = jnp.asarray(rng.standard_normal((in_, out)).astype(np.float32) * 0.1)
    leaf = quantize_weight_int4(w, group=128)
    x = jnp.asarray(rng.standard_normal((5, in_)).astype(np.float32))
    want = jnp.dot(x.astype(jnp.bfloat16),
                   dequantize_weight4(leaf, jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    got = int4_matmul(x, leaf["w_p4"], leaf["scale4"], interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
