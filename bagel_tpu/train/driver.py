"""Training driver CLI — the reference's pretrain_unified_navit.py rebuilt.

Usage:
  python -m bagel_tpu.train.driver --dataset_config data.yaml \
      --ckpt_dir ckpts --total_steps 1000 [--resume] ...

One process drives all local TPU chips through GSPMD (multi-host via
jax.distributed when JAX_COORDINATOR_ADDRESS is set); there is no
torchrun/NCCL layer. Gradient accumulation, EMA, CE/MSE weighting,
warmup schedules, MFU logging, periodic checkpointing with exact data
resume all mirror the reference flags (pretrain_unified_navit.py:211-406).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from bagel_tpu.configs import BagelConfig, Qwen2Config, SiglipConfig, VAEConfig
from bagel_tpu.data.datasets import build_grouped_datasets
from bagel_tpu.data.packing import (
    PackedBatchIterator,
    PackerConfig,
    stack_batches,
)
from bagel_tpu.data.tokenizer import load_tokenizer
from bagel_tpu.models.bagel import init_bagel_params
from bagel_tpu.parallel import make_mesh, shard_batch, shard_params
from bagel_tpu.train.checkpoint import (
    data_status_for_process,
    gather_data_status,
    get_latest_ckpt,
    restore_checkpoint,
    save_checkpoint,
    step_from_path,
    update_data_status,
)
from bagel_tpu.train.step import (
    TrainState,
    compute_losses,
    init_train_state,
    make_lr_schedule,
    make_optimizer,
)
from bagel_tpu.utils.metrics import ThroughputMeter, make_logger


@jax.jit
def _seqlen_sq(document_id):
    """Sum over packed samples of len(sample)^2 — the attention term of the
    analytic FLOPs model (pretrain_unified_navit.py:675-681 all_reduces the
    same counter). document_id: [B, S] int32, 0 = padding. Stays on device;
    the driver accumulates it and fetches only at log boundaries."""
    nbins = 512  # packing caps samples-per-sequence far below this
    d = jnp.clip(document_id, 0, nbins - 1)
    one = (document_id > 0).astype(jnp.int32)
    counts = jnp.zeros(
        (document_id.shape[0], nbins), jnp.int32
    ).at[jnp.arange(document_id.shape[0])[:, None], d].add(one)
    return jnp.sum(counts.astype(jnp.float32) ** 2)


def parse_args(argv=None):
    p = argparse.ArgumentParser("bagel_tpu trainer")
    # model
    p.add_argument("--preset", type=str, default="7b",
                   choices=["7b", "micro"],
                   help="micro = 1-layer config for smoke tests/CI")
    p.add_argument("--mock_tokenizer", action="store_true",
                   help="use the deterministic test tokenizer (no files)")
    p.add_argument("--llm_config", type=str, default=None,
                   help="json file for Qwen2Config; default = 7B MoT")
    p.add_argument("--layer_module", type=str, default="mot",
                   choices=["dense", "moe", "mot"])
    p.add_argument("--num_hidden_layers", type=int, default=None)
    p.add_argument("--visual_gen", action="store_true", default=True)
    p.add_argument("--no_visual_gen", dest="visual_gen", action="store_false")
    p.add_argument("--visual_und", action="store_true", default=True)
    p.add_argument("--no_visual_und", dest="visual_und", action="store_false")
    p.add_argument("--max_latent_size", type=int, default=32)
    p.add_argument("--timestep_shift", type=float, default=1.0)
    p.add_argument("--freeze_und", action="store_true")
    # module-level freezing for ablations / memory (reference flags,
    # pretrain_unified_navit.py:541-551; freeze_vae defaults True there too
    # — the VAE is encoded outside the grad graph, so freezing only strips
    # its optimizer moments)
    p.add_argument("--freeze_llm", action="store_true")
    p.add_argument("--freeze_vit", action="store_true")
    p.add_argument("--freeze_vae", action="store_true", default=True)
    p.add_argument("--no_freeze_vae", dest="freeze_vae", action="store_false")
    p.add_argument("--init_checkpoint", type=str, default=None,
                   help="HF-released checkpoint dir to convert + finetune")
    # data
    p.add_argument("--dataset_config", type=str, required=False)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--expected_num_tokens", type=int, default=32768)
    p.add_argument("--max_num_tokens", type=int, default=36864)
    p.add_argument("--max_num_tokens_per_sample", type=int, default=16384)
    p.add_argument("--prefer_buffer_before", type=int, default=16384)
    p.add_argument("--max_buffer_size", type=int, default=50,
                   help="overflow-sample buffer cap (dataset_base.py:201)")
    p.add_argument("--text_cond_dropout_prob", type=float, default=0.1)
    p.add_argument("--vit_cond_dropout_prob", type=float, default=0.4)
    p.add_argument("--vae_cond_dropout_prob", type=float, default=0.1)
    p.add_argument("--num_workers", type=int, default=0,
                   help="packing worker subprocesses; 0 = in-process thread")
    # training
    p.add_argument("--total_steps", type=int, default=500_000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_scheduler", type=str, default="constant",
                   choices=["constant", "cosine"])
    p.add_argument("--warmup_steps", type=int, default=2000)
    p.add_argument("--min_lr", type=float, default=1e-7)
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.95)
    p.add_argument("--eps", type=float, default=1e-15)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--ce_weight", type=float, default=0.25)
    p.add_argument("--mse_weight", type=float, default=1.0)
    p.add_argument("--ema", type=float, default=0.9999)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--ema_offload", action="store_true",
                   help="keep the EMA tree resident in host memory "
                        "(round-tripped around the update like "
                        "--optimizer_offload); frees another "
                        "~2 bytes/param of HBM")
    p.add_argument("--optimizer_offload", action="store_true",
                   help="keep Adam moments resident in host memory "
                        "(pinned_host), round-tripping through HBM only "
                        "during the update — the reference's FSDP "
                        "cpu_offload, TPU-native. Frees ~8 bytes/param of "
                        "HBM for the fwd/bwd (where activations peak); the "
                        "optimizer step itself still stages the full moment "
                        "tree through HBM in one transfer (per-leaf "
                        "streaming would cut that peak but costs hundreds "
                        "of dispatches per step)")
    p.add_argument("--mesh", type=str, default=None,
                   help="dp,fsdp,tp e.g. 1,8,1; default all-fsdp")
    p.add_argument("--remat", type=str, default="full",
                   choices=["full", "dots", "none"],
                   help="per-layer activation checkpointing: full = save "
                        "nothing (reference NO_REENTRANT semantics, min "
                        "HBM); dots = keep matmul outputs (less backward "
                        "recompute, one activations slab per layer); none "
                        "= XLA keeps all residuals")
    p.add_argument("--attn_chunk", type=int, default=None,
                   help="chunked packed attention (no dense [S,S] mask)")
    p.add_argument("--sparse_block", type=int, default=None,
                   help="block-sparse Pallas train attention (skips "
                        "cross-document tiles; TPU)")
    p.add_argument("--context_parallel", type=str, default=None,
                   choices=[None, "dp", "fsdp", "tp"],
                   help="mesh axis to shard the packed sequence over "
                        "(ring attention; requires dp-batch of 1)")
    p.add_argument("--pipeline_parallel", type=str, default=None,
                   choices=[None, "fsdp"],
                   help="mesh axis to stage the LLM layer stack over "
                        "(GPipe microbatch pipeline; batch rows become "
                        "microbatches — see parallel/pipeline.py)")
    p.add_argument("--pp_microbatches", type=int, default=4,
                   help="packed sequences per step when --pipeline_parallel "
                        "is on (more microbatches = smaller bubble)")
    p.add_argument("--expert_parallel", type=str, default=None,
                   choices=[None, "fsdp", "tp"],
                   help="size-2 mesh axis to shard the MoT und/gen expert "
                        "pair over (each device runs one expert's matmuls; "
                        "masked psum routes — see parallel/expert.py)")
    # logging / ckpt
    p.add_argument("--ckpt_dir", type=str, default="results/ckpt")
    p.add_argument("--save_every", type=int, default=2000)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--auto_resume", action="store_true")
    # explicit-checkpoint resume (reference resume_from/resume_model_only/
    # finetune_from_ema, pretrain_unified_navit.py:262-274,449-466): with
    # --auto_resume the latest ckpt in --ckpt_dir wins; --resume_from is the
    # fallback (or sole source without --auto_resume)
    p.add_argument("--resume_from", type=str, default=None,
                   help="train-checkpoint dir to resume/finetune from")
    p.add_argument("--resume_model_only", action="store_true",
                   help="load weights only; fresh optimizer/step/data stream")
    p.add_argument("--finetune_from_ema", action="store_true",
                   help="with --resume_model_only: start from EMA weights")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--profile_dir", type=str, default=None)
    p.add_argument("--wandb_project", type=str, default=None,
                   help="enable wandb logging (gated on install)")
    p.add_argument("--wandb_name", type=str, default=None)
    return p.parse_args(argv)


def build_config(args) -> BagelConfig:
    if args.preset == "micro":
        from bagel_tpu.configs import micro_bagel

        cfg = micro_bagel()
        if args.freeze_und:
            cfg = dataclasses.replace(
                cfg, llm=dataclasses.replace(cfg.llm, freeze_und=True)
            )
        if args.num_hidden_layers:
            cfg = dataclasses.replace(
                cfg, llm=dataclasses.replace(
                    cfg.llm, num_hidden_layers=args.num_hidden_layers
                )
            )
        return cfg
    if args.llm_config:
        import json

        with open(args.llm_config) as f:
            llm = Qwen2Config(**json.load(f))
    else:
        llm = Qwen2Config(layer_module=args.layer_module,
                          freeze_und=args.freeze_und)
    if args.num_hidden_layers:
        llm = dataclasses.replace(llm, num_hidden_layers=args.num_hidden_layers)
    return BagelConfig(
        visual_gen=args.visual_gen,
        visual_und=args.visual_und,
        llm=llm,
        vit=SiglipConfig() if args.visual_und else None,
        vae=VAEConfig() if args.visual_gen else None,
        max_latent_size=args.max_latent_size,
        timestep_shift=args.timestep_shift,
    )


def _worker_packer(spec: dict, worker_id: int, num_workers: int):
    """Packing-worker factory for MultiprocessLoader (module-level so the
    spawn start method can pickle it). Rebuilds the datasets + packer inside
    the subprocess; finalize stays numpy-only (as_device=False)."""
    from bagel_tpu.data.datasets import DATASET_INFO

    for group, names in spec["dataset_info"].items():
        DATASET_INFO.setdefault(group, {}).update(names)
    datasets, is_mandatory, weights = build_grouped_datasets(
        spec["grouped"], spec["tokenizer"],
        local_rank=spec["rank"], world_size=spec["world"],
        num_workers=num_workers, worker_id=worker_id,
        data_status=spec["data_status"],
    )
    packer = PackedBatchIterator(
        spec["pcfg"], [iter(d) for d in datasets], weights, is_mandatory,
        spec["new_token_ids"],
        expected_num_tokens=spec["expected_num_tokens"],
        max_num_tokens_per_sample=spec["max_num_tokens_per_sample"],
        max_num_tokens=spec["max_num_tokens"],
        prefer_buffer_before=spec["prefer_buffer_before"],
        max_buffer_size=spec["max_buffer_size"],
        seed=spec["seed"] + worker_id,
        finalize_kwargs={**spec["finalize_kwargs"], "as_device": False},
    )
    return iter(packer)


def make_grad_and_apply(cfg, tx, args, mesh=None):
    cp = (
        (mesh, args.context_parallel)
        if getattr(args, "context_parallel", None) else None
    )
    pp = (
        (mesh, args.pipeline_parallel)
        if getattr(args, "pipeline_parallel", None) else None
    )
    ep = (
        (mesh, args.expert_parallel)
        if getattr(args, "expert_parallel", None) else None
    )
    assert sum(map(bool, (cp, pp, ep))) <= 1, (
        "--context_parallel / --pipeline_parallel / --expert_parallel "
        "are exclusive"
    )
    assert not (ep and getattr(args, "sparse_block", None)), (
        "--expert_parallel does not support --sparse_block (the ep "
        "forward routes attention through the dense/chunked paths only; "
        "use --attn_chunk for long sequences)"
    )
    if ep is not None:
        assert mesh.shape[args.expert_parallel] == 2, (
            f"--expert_parallel axis '{args.expert_parallel}' must have "
            f"size 2 (und/gen), got {mesh.shape[args.expert_parallel]}"
        )

    from bagel_tpu.train.step import freeze_stop_gradient

    frozen = tuple(
        name for name, flag in (
            ("llm", getattr(args, "freeze_llm", False)),
            ("vit", getattr(args, "freeze_vit", False)),
            ("vae", getattr(args, "freeze_vae", True)),
        ) if flag
    )

    def grad_step(params, batch, noise):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: compute_losses(
                freeze_stop_gradient(p, frozen), cfg, batch, noise,
                args.ce_weight, args.mse_weight,
                attn_chunk=args.attn_chunk, context_parallel=cp,
                sparse_block=getattr(args, "sparse_block", None),
                pipeline_parallel=pp, expert_parallel=ep,
                remat=getattr(args, "remat", "full"),
            ),
            has_aux=True,
        )(params)
        return grads, metrics

    def apply_step(state: TrainState, grads):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            ema = jax.tree.map(
                lambda e, p: e * args.ema + p.astype(e.dtype) * (1 - args.ema),
                ema, params,
            )
        return TrainState(params=params, opt_state=opt_state,
                          ema_params=ema, step=state.step + 1)

    return jax.jit(grad_step), jax.jit(apply_step)


def main(argv=None):
    args = parse_args(argv)
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    rank = jax.process_index()
    logger = make_logger(rank=rank)
    cfg = build_config(args)

    if args.mesh:
        shape = tuple(int(x) for x in args.mesh.split(","))
    else:
        shape = (1, len(jax.devices()), 1)
    mesh = make_mesh(shape)
    logger.info(f"mesh {dict(zip(('dp', 'fsdp', 'tp'), shape))}, "
                f"{jax.device_count()} devices")

    # --- model ---
    if args.init_checkpoint:
        from bagel_tpu.utils.convert import load_checkpoint_dir

        params = load_checkpoint_dir(args.init_checkpoint, cfg)
        params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    else:
        params = init_bagel_params(jax.random.PRNGKey(args.seed), cfg,
                                   dtype=jnp.float32)
    with mesh:
        params = shard_params(mesh, params,
                              pipeline_axis=args.pipeline_parallel)
        frozen = tuple(
            name for name, flag in (
                ("llm", args.freeze_llm), ("vit", args.freeze_vit),
                ("vae", args.freeze_vae),
            ) if flag and name in params
        )
        tx = make_optimizer(
            make_lr_schedule(args.lr, args.warmup_steps, args.total_steps,
                             args.lr_scheduler, args.min_lr),
            args.beta1, args.beta2, args.eps, args.max_grad_norm,
            frozen=frozen,
        )
        # jitted init: GSPMD derives optimizer/EMA shardings from the params,
        # so every leaf of the state lands on the mesh consistently (plain
        # init would commit scalar leaves to device 0 only).
        state = jax.jit(
            lambda p: init_train_state(p, tx, use_ema=args.ema > 0)
        )(params)
        if args.optimizer_offload or args.ema_offload:
            from bagel_tpu.train.step import opt_state_to_memory_kind

            state = dataclasses.replace(
                state,
                opt_state=(
                    opt_state_to_memory_kind(state.opt_state, "pinned_host")
                    if args.optimizer_offload else state.opt_state
                ),
                ema_params=(
                    opt_state_to_memory_kind(state.ema_params, "pinned_host")
                    if args.ema_offload and state.ema_params is not None
                    else state.ema_params
                ),
            )

    # --- resume ---
    # precedence mirrors the reference (pretrain_unified_navit.py:448-466):
    # an auto-resume hit is always a FULL resume; --resume_from is the
    # fallback and honors --resume_model_only/--finetune_from_ema.
    start_step, data_status = 0, {}
    resume_src, model_only = None, False
    if args.auto_resume:
        resume_src = get_latest_ckpt(args.ckpt_dir)
    if resume_src is None and args.resume_from:
        resume_src, model_only = args.resume_from, args.resume_model_only
    if resume_src and model_only:
        from bagel_tpu.train.checkpoint import restore_params_only

        # model-only resume resets the step counter to 0; writing into a
        # ckpt_dir that already has committed steps would collide with them
        # and save_checkpoint would skip (keeping the STALE weights). Refuse
        # the layout instead of silently discarding the new run's saves.
        if get_latest_ckpt(args.ckpt_dir) is not None:
            raise ValueError(
                f"--resume_model_only starts a fresh step counter but "
                f"--ckpt_dir {args.ckpt_dir} already contains checkpoints; "
                f"point --ckpt_dir at a fresh directory"
            )

        new_params, new_ema = restore_params_only(
            resume_src, state.params, from_ema=args.finetune_from_ema
        )
        if state.ema_params is None:
            new_ema = None
        elif new_ema is None:
            # ckpt has no EMA: seed it from the loaded weights (reference
            # falls back to model.safetensors, fsdp_utils.py:169-173)
            new_ema = jax.tree.map(jnp.copy, new_params)
        state = dataclasses.replace(
            state, params=new_params, ema_params=new_ema
        )
        logger.info(
            f"loaded {'EMA ' if args.finetune_from_ema else ''}weights from "
            f"{resume_src} (model only; fresh optimizer/step/data stream)"
        )
    elif resume_src:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
            state,
        )
        state, saved_status = restore_checkpoint(resume_src, abstract)
        # the checkpoint stores every host's stream positions
        # ({rank: status}); each process resumes its own slice
        data_status = data_status_for_process(saved_status, rank)
        start_step = step_from_path(resume_src)
        logger.info(f"resumed from {resume_src} at step {start_step}")

    # --- data ---
    import yaml

    if args.mock_tokenizer:
        from bagel_tpu.data.tokenizer import MockTokenizer

        tokenizer = MockTokenizer(cfg.llm.vocab_size)
        new_token_ids = tokenizer.new_token_ids
    else:
        tokenizer, new_token_ids, _ = load_tokenizer(
            args.tokenizer_path or args.init_checkpoint
        )
    with open(args.dataset_config) as f:
        grouped = yaml.safe_load(f)
    pcfg = PackerConfig(
        text_cond_dropout_prob=args.text_cond_dropout_prob,
        vit_cond_dropout_prob=args.vit_cond_dropout_prob,
        vae_cond_dropout_prob=args.vae_cond_dropout_prob,
        vae_image_downsample=cfg.latent_downsample,
        max_latent_size=cfg.max_latent_size,
        vit_patch_size=cfg.vit.patch_size if cfg.vit else 14,
        max_num_patch_per_side=cfg.vit_max_num_patch_per_side,
    )

    def make_packer(worker_id: int, num_workers: int, as_device: bool):
        datasets, is_mandatory, weights = build_grouped_datasets(
            grouped, tokenizer,
            local_rank=rank, world_size=jax.process_count(),
            num_workers=num_workers, worker_id=worker_id,
            data_status=data_status or None,
        )
        return PackedBatchIterator(
            pcfg, [iter(d) for d in datasets], weights, is_mandatory,
            new_token_ids,
            expected_num_tokens=args.expected_num_tokens,
            max_num_tokens_per_sample=args.max_num_tokens_per_sample,
            max_num_tokens=args.max_num_tokens,
            prefer_buffer_before=args.prefer_buffer_before,
            max_buffer_size=args.max_buffer_size,
            seed=args.seed + rank * 1009 + worker_id,
            finalize_kwargs=dict(
                vit_patch_dim=cfg.vit.patch_dim if cfg.vit else 588,
                patch_latent_dim=cfg.patch_latent_dim,
                as_device=as_device,
            ),
        )

    vae_params = state.params["vae"] if cfg.visual_gen else None
    if args.num_workers > 0:
        import functools

        from bagel_tpu.data.datasets import DATASET_INFO
        from bagel_tpu.data.loader import MultiprocessLoader

        spec = dict(
            grouped=grouped, tokenizer=tokenizer, rank=rank,
            world=jax.process_count(), data_status=data_status or None,
            dataset_info=DATASET_INFO, pcfg=pcfg,
            new_token_ids=new_token_ids,
            expected_num_tokens=args.expected_num_tokens,
            max_num_tokens_per_sample=args.max_num_tokens_per_sample,
            max_num_tokens=args.max_num_tokens,
            prefer_buffer_before=args.prefer_buffer_before,
            max_buffer_size=args.max_buffer_size,
            seed=args.seed + rank * 1009,
            finalize_kwargs=dict(
                vit_patch_dim=cfg.vit.patch_dim if cfg.vit else 588,
                patch_latent_dim=cfg.patch_latent_dim,
            ),
        )
        loader = MultiprocessLoader(
            functools.partial(_worker_packer, spec),
            args.num_workers, vae_params, cfg,
            jax.random.PRNGKey(args.seed + 77),
        )
    else:
        from bagel_tpu.data.loader import PrefetchLoader

        loader = PrefetchLoader(
            iter(make_packer(0, 1, as_device=True)),
            vae_params, cfg, jax.random.PRNGKey(args.seed + 77),
        )
    data_iter = iter(loader)

    grad_step, apply_step = make_grad_and_apply(cfg, tx, args, mesh)
    meter = ThroughputMeter(cfg.llm, n_chips=jax.device_count())
    rng = jax.random.PRNGKey(args.seed + 1000 * rank)

    wandb_run = None
    if args.wandb_project and rank == 0:
        try:
            import wandb

            wandb_run = wandb.init(project=args.wandb_project,
                                   name=args.wandb_name, config=vars(args))
        except ImportError:
            logger.info("wandb not installed; skipping")

    # each micro-step packs dp-many sequences so the batch axis shards over
    # the dp mesh dim (one sequence per dp slice, like one packed batch per
    # reference rank)
    dp = shape[0]
    if args.pipeline_parallel:
        # batch rows are GPipe microbatches, replicated over the mesh (the
        # stage axis shards layers, not data); pack enough to keep the
        # bubble fraction (pp-1)/(B+pp-1) small
        assert dp == 1, "--pipeline_parallel needs mesh dp=1"
        dp = max(args.pp_microbatches, 2)
    seqsq_acc = jnp.float32(0.0)
    # --profile_dir traces a 2-step window AFTER the compile step (tracing
    # the whole run would dump gigabytes; the reference has no tracer at
    # all, SURVEY §5.1)
    prof_start = start_step + 1
    prof_stop = min(prof_start + 2, args.total_steps)
    profiling = False

    with mesh:
        for step in range(start_step, args.total_steps):
            if args.profile_dir and step == prof_start:
                jax.profiler.start_trace(args.profile_dir)
                profiling = True
            if profiling and step == prof_stop:
                jax.profiler.stop_trace()
                profiling = False
            grads_acc = None
            metrics = None
            for _ in range(args.gradient_accumulation_steps):
                group = [next(data_iter) for _ in range(dp)]
                rng, r2 = jax.random.split(rng)
                bb = stack_batches([b for b, _ in group])
                bb = shard_batch(mesh, bb)
                noise = jax.random.normal(
                    r2, bb.vae_patches.shape, jnp.float32
                )
                try:
                    g, metrics = grad_step(state.params, bb, noise)
                except jax.errors.JaxRuntimeError as e:
                    # HBM-OOM parity with the reference's CUDA-OOM handler
                    # (pretrain_unified_navit.py:688-693): log the shapes
                    # that blew the budget, then re-raise (fatal — restart
                    # resumes from the last checkpoint via --auto_resume)
                    if "RESOURCE_EXHAUSTED" in str(e):
                        logger.error(
                            "device OOM at step %d: packed tokens=%s "
                            "vae_patches=%s dp=%d accum=%d",
                            step, bb.position_ids.shape,
                            bb.vae_patches.shape, dp,
                            args.gradient_accumulation_steps,
                        )
                    raise
                grads_acc = g if grads_acc is None else jax.tree.map(
                    jnp.add, grads_acc, g
                )
                for _, data_indexes in group:
                    data_status = update_data_status(data_status, data_indexes)
                meter.update(int(bb.position_ids.shape[0] *
                                 bb.position_ids.shape[1]))
                # attention-FLOPs term: accumulate sum(len^2) on device (no
                # per-microstep host sync; fetched at the log boundary)
                seqsq_acc = seqsq_acc + _seqlen_sq(bb.document_id)
            if args.gradient_accumulation_steps > 1:
                grads_acc = jax.tree.map(
                    lambda x: x / args.gradient_accumulation_steps, grads_acc
                )
            if args.optimizer_offload or args.ema_offload:
                # offloaded trees: host -> HBM for the update, back after;
                # the jitted update itself is all-device
                from bagel_tpu.train.step import opt_state_to_memory_kind

                def _place(st, kind):
                    return dataclasses.replace(
                        st,
                        opt_state=(
                            opt_state_to_memory_kind(st.opt_state, kind)
                            if args.optimizer_offload else st.opt_state
                        ),
                        ema_params=(
                            opt_state_to_memory_kind(st.ema_params, kind)
                            if args.ema_offload and st.ema_params is not None
                            else st.ema_params
                        ),
                    )

                state = _place(apply_step(_place(state, "device"),
                                          grads_acc), "pinned_host")
            else:
                state = apply_step(state, grads_acc)

            if step % args.log_every == 0:
                meter.seqlen_sq = float(seqsq_acc)
                w = meter.window()
                msg = (
                    f"(step={step:07d}) "
                    f"loss: {float(metrics['loss']):.4f}, "
                    f"ce: {float(metrics['ce']):.4f}, "
                )
                if "mse" in metrics:
                    msg += f"mse: {float(metrics['mse']):.4f}, "
                msg += (
                    f"tok/s: {w['tokens_per_sec'] / 1e3:.1f}k, "
                    f"mfu: {w['mfu'] * 100:.1f}%"
                )
                logger.info(msg)
                if wandb_run is not None:
                    wandb_run.log(
                        {k: float(v) for k, v in metrics.items()}
                        | {"tokens_per_sec": w["tokens_per_sec"],
                           "mfu": w["mfu"]},
                        step=step,
                    )
                meter.reset()
                seqsq_acc = jnp.float32(0.0)

            if step > start_step and step % args.save_every == 0:
                # collective: every process enters the Orbax save and the
                # data_status allgather (reference gathers rank dicts before
                # rank-0 writes, pretrain_unified_navit.py:796-820).
                # block=False: the loop resumes as soon as the device->host
                # copy lands; the disk write finishes on Orbax's background
                # thread while the next steps run
                save_checkpoint(args.ckpt_dir, step, state,
                                gather_data_status(data_status), cfg,
                                block=False)
                logger.info(f"checkpoint at step {step} (async write)")

        if profiling:  # total_steps ended inside the trace window
            jax.profiler.stop_trace()
        save_checkpoint(args.ckpt_dir, args.total_steps, state,
                        gather_data_status(data_status), cfg)
        logger.info("saved final checkpoint")


if __name__ == "__main__":
    main()
