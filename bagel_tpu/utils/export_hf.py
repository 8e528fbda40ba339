"""Export a trained Orbax checkpoint to the reference's HF release layout.

Closes the training loop for reference users: train here (train/driver.py,
Orbax state checkpoints), export back to the model/ema/ae.safetensors
layout the reference's app.py:39-48 / eval stack loads.

  python -m bagel_tpu.utils.export_hf --ckpt results/ckpt --out hf_out \
      [--raw] [--tokenizer_src /path/BAGEL-7B-MoT]

--ckpt accepts either a specific step dir (results/ckpt/0001000) or the
checkpoint root (latest step picked). EMA weights are exported when the
state carries them (the reference evaluates EMA — TRAIN.md); --raw forces
the raw training params instead. --tokenizer_src copies tokenizer/config
sidecars so the exported dir is directly loadable by the reference and by
serving/app.py --checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

_SIDECARS = (
    "llm_config.json", "vit_config.json", "config.json",
    "tokenizer.json", "tokenizer_config.json", "vocab.json",
    "merges.txt", "special_tokens_map.json", "generation_config.json",
)


def export_checkpoint(ckpt: str, out: str, use_ema: bool = True,
                      tokenizer_src: str = "") -> str:
    import orbax.checkpoint as ocp

    from bagel_tpu.configs import bagel_config_from_json
    from bagel_tpu.train.checkpoint import get_latest_ckpt
    from bagel_tpu.utils.convert import save_checkpoint_dir

    path = ckpt
    if not os.path.exists(os.path.join(path, "state")):
        latest = get_latest_ckpt(ckpt)
        assert latest, f"no step checkpoints under {ckpt}"
        path = latest
    with open(os.path.join(path, "config.json")) as f:
        cfg = bagel_config_from_json(f.read())

    state = ocp.StandardCheckpointer().restore(
        os.path.join(os.path.abspath(path), "state")
    )
    # TrainState restores as a mapping: params / ema_params / opt_state / step
    params = None
    if use_ema:
        params = state.get("ema_params")
    if params is None:
        params = state["params"]
    save_checkpoint_dir(params, cfg, out)
    if tokenizer_src:
        for name in _SIDECARS:
            src = os.path.join(tokenizer_src, name)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(out, name))
    with open(os.path.join(out, "export_meta.json"), "w") as f:
        json.dump({"source": os.path.abspath(path),
                   "weights": "ema" if use_ema and state.get("ema_params")
                   is not None else "params",
                   "step": int(state.get("step", -1))}, f)
    return out


def main(argv=None):
    # honor JAX_PLATFORMS programmatically (some TPU plugins ignore the
    # env var); export is pure host-side layout work — CPU is always right
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    ap = argparse.ArgumentParser("bagel_tpu HF export")
    ap.add_argument("--ckpt", required=True,
                    help="step dir or checkpoint root (latest picked)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--raw", action="store_true",
                    help="export raw training params instead of EMA")
    ap.add_argument("--tokenizer_src", type=str, default="",
                    help="copy tokenizer/config sidecars from this dir")
    args = ap.parse_args(argv)
    out = export_checkpoint(args.ckpt, args.out, use_ema=not args.raw,
                            tokenizer_src=args.tokenizer_src)
    print(f"exported to {out}")


if __name__ == "__main__":
    main()
