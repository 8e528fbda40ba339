"""Image-generation evaluation worker.

The reference's eval/gen family (gen_images_mp*.py: torchrun rank-parallel
prompt sharding, fixed seed 42, skip-if-exists resumability; WISE variant
adds think-mode two-phase generation; imgedit/kris/rise/gedit variants add a
source image) collapses into one worker. Output uses the GenEval directory
layout (outdir/{index:05d}/samples/0000.png + metadata.jsonl) so the
official detector/judge scorers consume it unchanged.

  python -m bagel_tpu.eval.gen_runner --checkpoint ... \
      --metadata geneval_metadata.jsonl --outdir results/ \
      [--think] [--image_root edits/] [--cfg_text_scale 4.0] ...
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List


def main(argv=None):
    p = argparse.ArgumentParser("bagel_tpu gen eval")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--mesh", type=str, default=None)
    p.add_argument("--metadata", type=str, required=True,
                   help="jsonl rows with at least {'prompt': ...}; optional "
                        "'image' column turns rows into editing tasks")
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--image_root", type=str, default="")
    p.add_argument("--image_size", type=int, default=1024)
    p.add_argument("--num_timesteps", type=int, default=50)
    p.add_argument("--cfg_text_scale", type=float, default=4.0)
    p.add_argument("--cfg_img_scale", type=float, default=1.0)
    p.add_argument("--cfg_renorm_type", type=str, default="global")
    p.add_argument("--cfg_renorm_min", type=float, default=0.0)
    p.add_argument("--cfg_interval_min", type=float, default=0.4,
                   help="CFG active for t in (interval_min, 1.0]")
    p.add_argument("--timestep_shift", type=float, default=3.0)
    p.add_argument("--think", action="store_true")
    p.add_argument("--enable_taylorseer", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max_kv", type=int, default=8192)
    p.add_argument("--max_latent_size", type=int, default=64)
    p.add_argument("--quant", type=str, default=None,
                   choices=[None, "int8", "w8a8", "int4", "nf4"],
                   help="serve the eval model quantized (serving/app.py "
                        "--quant semantics)")
    args = p.parse_args(argv)

    import jax
    from PIL import Image

    from bagel_tpu.data.transforms import pil_img2rgb
    from bagel_tpu.serving.app import build_engine

    engine, vae_tf, vit_tf = build_engine(args)

    rows: List[dict] = []
    with open(args.metadata) as f:
        for i, line in enumerate(f):
            if line.strip():
                row = json.loads(line)
                row.setdefault("index", i)
                rows.append(row)

    rank, world = jax.process_index(), jax.process_count()
    for row in rows[rank::world]:
        sample_dir = os.path.join(args.outdir, f"{row['index']:05d}")
        out_path = os.path.join(sample_dir, "samples", "0000.png")
        if os.path.exists(out_path):  # resumable (gen_images_mp.py:203-210)
            continue
        os.makedirs(os.path.join(sample_dir, "samples"), exist_ok=True)
        with open(os.path.join(sample_dir, "metadata.jsonl"), "w") as f:
            f.write(json.dumps(row) + "\n")

        image = None
        shapes = (args.image_size, args.image_size)
        if row.get("image"):
            src = pil_img2rgb(
                Image.open(os.path.join(args.image_root, row["image"]))
            )
            image = vae_tf(src)
            shapes = image.shape[:2]

        out = engine(
            image=image,
            text=row["prompt"],
            think=args.think,
            image_shapes=shapes,
            num_timesteps=args.num_timesteps,
            cfg_text_scale=args.cfg_text_scale,
            cfg_img_scale=args.cfg_img_scale,
            cfg_renorm_type=args.cfg_renorm_type,
            cfg_renorm_min=args.cfg_renorm_min,
            cfg_interval=(args.cfg_interval_min, 1.0),
            timestep_shift=args.timestep_shift,
            enable_taylorseer=args.enable_taylorseer,
            rng=jax.random.PRNGKey(args.seed + row["index"]),
        )
        Image.fromarray(out["image"]).save(out_path)
        if out.get("text"):
            with open(os.path.join(sample_dir, "thinking.txt"), "w") as f:
                f.write(out["text"])
        print(f"[{rank}] generated {row['index']:05d}")


if __name__ == "__main__":
    main()
