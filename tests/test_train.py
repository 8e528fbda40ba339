"""Training step + GSPMD sharding tests on the 8-device CPU mesh.

Uses micro_bagel (1 layer) — compile time dominates on CPU CI; the numerics
of the full stack are covered by the golden tests elsewhere.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bagel_tpu.configs import micro_bagel
from bagel_tpu.data.packing import make_synthetic_batch, stack_batches
from bagel_tpu.models.bagel import init_bagel_params
from bagel_tpu.parallel import make_mesh, shard_batch, shard_params
from bagel_tpu.train import (
    compute_losses,
    init_train_state,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
)


def _make(cfg, n=2, seed=0):
    rng = np.random.default_rng(seed)
    return stack_batches(
        [
            make_synthetic_batch(cfg, rng, seq_len=48, n_text=8,
                                 vit_hw=(28, 28), vae_hw=(16, 16))
            for _ in range(n)
        ]
    )


@pytest.fixture(scope="module")
def setup():
    cfg = micro_bagel()
    params = init_bagel_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params, _make(cfg)


def test_loss_decreases_on_fixed_batch(setup):
    cfg, params, batch = setup
    tx = make_optimizer(make_lr_schedule(1e-3, warmup_steps=1), max_grad_norm=1.0)
    state = init_train_state(params, tx, use_ema=True)
    step = jax.jit(make_train_step(cfg, tx, ce_weight=1.0, mse_weight=1.0))

    losses = []
    for _ in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
        assert float(metrics["grad_norm"]) > 0
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 3
    diff = jax.tree.map(
        lambda e, p: float(jnp.abs(e - p).max()), state.ema_params, state.params
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_freeze_und_blocks_und_ffn_gradients():
    cfg = micro_bagel()
    cfg = dataclasses.replace(cfg, llm=dataclasses.replace(cfg.llm, freeze_und=True))
    params = init_bagel_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    # llm2vae is zero-init per reference semantics (bagel.py:96-99), which
    # makes first-step MSE trunk gradients exactly zero — randomize it so
    # gradients flow for this test.
    params["llm2vae"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(9), params["llm2vae"]["w"].shape) * 0.1
    )
    batch = _make(cfg, n=1, seed=1)

    def loss(params):
        l, m = compute_losses(
            params, cfg, batch,
            jnp.zeros((1, batch.vae_patches.shape[1], cfg.patch_latent_dim)),
            ce_weight=0.0, mse_weight=1.0,
        )
        return l

    grads = jax.jit(jax.grad(loss))(params)
    g_gen = float(jnp.abs(grads["llm"]["layers"]["mlp_gen"]["gate"]).max())
    assert g_gen > 0


def test_module_freeze_and_buffer_tables(setup):
    """--freeze_llm/vit/vae semantics (pretrain_unified_navit.py:541-551):
    frozen modules keep their values and carry no Adam moments; the sin-cos
    position tables are ALWAYS frozen buffers (reference registers them
    non-trainable, modeling_utils.py:127-144)."""
    import optax

    cfg, params, batch = setup
    # llm2vae is zero-init (reference bagel.py:96-99): at the initial params
    # the MSE trunk gradient is exactly zero and CE labels causally precede
    # the vit tokens, so the connector would see a zero gradient — randomize
    # llm2vae so trainability is observable (same trick as the freeze_und
    # test above).
    params = dict(params)
    params["llm2vae"] = dict(params["llm2vae"])
    params["llm2vae"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(9), params["llm2vae"]["w"].shape)
        * 0.1
    )
    frozen = ("vit", "vae")
    tx = make_optimizer(make_lr_schedule(1e-3, warmup_steps=1),
                        frozen=frozen)
    state = init_train_state(params, tx, use_ema=False)
    step = jax.jit(make_train_step(cfg, tx, ce_weight=1.0, mse_weight=1.0,
                                   frozen=frozen))
    state2 = state
    for _ in range(2):  # warmup_steps=1: lr is 0 on the very first step
        state2, metrics = step(state2, batch, jax.random.PRNGKey(42))
    assert np.isfinite(float(metrics["loss"]))

    def max_delta(a, b):
        return max(jax.tree.leaves(jax.tree.map(
            lambda x, y: float(jnp.abs(x - y).max()), a, b)))

    # frozen modules and buffer tables byte-stable; trainable ones moved
    for k in ("vit", "vae", "vit_pos_embed", "latent_pos_embed"):
        assert max_delta(params[k], state2.params[k]) == 0.0, k
    assert max_delta(params["llm"], state2.params["llm"]) > 0
    assert max_delta(params["connector"], state2.params["connector"]) > 0

    # masked leaves hold no Adam moments (memory): every vit/vae leaf of
    # the adam state is a MaskedNode
    adam_state = state.opt_state[1].inner_state[0]
    for k in frozen:
        nodes = jax.tree.leaves(
            jax.tree.map(lambda x: isinstance(x, optax.MaskedNode),
                         adam_state.mu[k],
                         is_leaf=lambda x: isinstance(x, optax.MaskedNode)),
        )
        assert nodes and all(nodes), k


def test_sharded_train_step_on_mesh(setup):
    cfg, params, batch = setup
    mesh = make_mesh((2, 2, 2))
    with mesh:
        sparams = shard_params(mesh, params)
        sbatch = shard_batch(mesh, batch)
        tx = make_optimizer(make_lr_schedule(1e-3, warmup_steps=1))
        state = init_train_state(sparams, tx, use_ema=False)
        step = jax.jit(make_train_step(cfg, tx))
        state, metrics = step(state, sbatch, jax.random.PRNGKey(0))
        loss_sharded = float(metrics["loss"])
        assert np.isfinite(loss_sharded)

    # compare against the unsharded step: same math, different partitioning
    tx = make_optimizer(make_lr_schedule(1e-3, warmup_steps=1))
    state1 = init_train_state(params, tx, use_ema=False)
    step1 = jax.jit(make_train_step(cfg, tx))
    _, m1 = step1(state1, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m1["loss"]), loss_sharded, rtol=1e-3)


def test_remat_policies_gradient_parity(setup):
    """full / dots / none activation-checkpointing produce identical loss
    and gradients (remat is a memory/recompute trade, never a numerics
    change) — fp32 CPU, exact comparison."""
    from bagel_tpu.train.step import compute_losses

    cfg, params, batch = setup
    noise = jnp.zeros(
        (batch.position_ids.shape[0], batch.vae_patches.shape[1],
         cfg.patch_latent_dim)
    )

    def grads(remat):
        def loss(p):
            l, _ = compute_losses(p, cfg, batch, noise, ce_weight=1.0,
                                  mse_weight=1.0, remat=remat)
            return l
        return jax.jit(jax.value_and_grad(loss))(params)

    (l_full, g_full) = grads("full")
    for mode in ("dots", "none"):
        l_m, g_m = grads(mode)
        assert float(jnp.abs(l_full - l_m)) < 1e-6, mode
        diffs = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), g_full, g_m
        )
        assert max(jax.tree.leaves(diffs)) < 1e-5, (mode, diffs)


def test_optimizer_offload_memory_kind_and_parity(setup):
    """opt_state_to_memory_kind: moments live in pinned_host between steps,
    the update is numerically identical to the all-device path, and
    MaskedNodes/scalars survive the round trip."""
    import dataclasses as dc

    from bagel_tpu.train.step import opt_state_to_memory_kind

    cfg, params, batch = setup
    tx = make_optimizer(make_lr_schedule(1e-3, warmup_steps=1))
    step = jax.jit(make_train_step(cfg, tx, ce_weight=1.0, mse_weight=1.0))

    s_dev = init_train_state(params, tx, use_ema=False)
    s_off = init_train_state(params, tx, use_ema=False)
    s_off = dc.replace(
        s_off, opt_state=opt_state_to_memory_kind(s_off.opt_state,
                                                  "pinned_host")
    )
    kinds = {
        x.sharding.memory_kind
        for x in jax.tree.leaves(s_off.opt_state)
        if isinstance(x, jax.Array)
    }
    assert kinds == {"pinned_host"}

    for _ in range(2):
        s_dev, m_dev = step(s_dev, batch, jax.random.PRNGKey(1))
        on = dc.replace(
            s_off, opt_state=opt_state_to_memory_kind(s_off.opt_state,
                                                      "device")
        )
        on, m_off = step(on, batch, jax.random.PRNGKey(1))
        s_off = dc.replace(
            on, opt_state=opt_state_to_memory_kind(on.opt_state,
                                                   "pinned_host")
        )
    assert float(m_dev["loss"]) == pytest.approx(float(m_off["loss"]),
                                                 rel=1e-6)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), s_dev.params, s_off.params
    )
    assert max(jax.tree.leaves(diffs)) < 1e-6


def test_optimizer_state_structure_unchanged_without_freezing(setup):
    # no frozen modules -> no optax.masked wrapper: the opt_state pytree
    # must keep the plain (clip, (adam, lr)) structure so full-state
    # restores of checkpoints from unfrozen runs keep working
    cfg, params, _ = setup
    tx_plain = make_optimizer(make_lr_schedule(1e-3, warmup_steps=1))
    st = tx_plain.init(params)
    names = [type(x).__name__ for x in jax.tree.leaves(
        st, is_leaf=lambda x: hasattr(x, "_fields"))]
    assert not any("Masked" in type(x).__name__
                   for x in jax.tree_util.tree_flatten_with_path(st)[0]), names
    flat = str(jax.tree_util.tree_structure(st))
    assert "Masked" not in flat, flat
    tx_frozen = make_optimizer(make_lr_schedule(1e-3, warmup_steps=1),
                               frozen=("vae",))
    assert "Masked" in str(jax.tree_util.tree_structure(tx_frozen.init(params)))


def test_model_only_resume_refuses_populated_ckpt_dir(tmp_path, setup):
    # --resume_model_only resets the step counter; saving into a ckpt_dir
    # that already has committed steps would silently keep the stale state
    import pytest

    from bagel_tpu.train.checkpoint import save_checkpoint
    from bagel_tpu.train.driver import main as driver_main

    cfg, params, _ = setup
    tx = make_optimizer(make_lr_schedule(1e-3, warmup_steps=1))
    state = init_train_state(params, tx, use_ema=False)
    src = save_checkpoint(str(tmp_path / "old"), 7, state, cfg=cfg,
                          block=True)
    with pytest.raises(ValueError, match="fresh directory"):
        driver_main([
            "--preset", "micro", "--mock_tokenizer", "--total_steps", "1",
            "--ckpt_dir", str(tmp_path / "old"),
            "--resume_from", src, "--resume_model_only",
        ])
