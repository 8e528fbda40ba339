#!/usr/bin/env python
"""Host data-pipeline throughput at production shapes (SURVEY hard part #6).

Measures the full host-side training feed — parquet read -> native JPEG
decode+resize pool (native/imagepool.cc) -> T2I plan build -> SequenceBuilder
pack (native/packing.cc span expansion) -> static-bucket finalize -> worker
queue — as delivered tokens/s into the consuming process, and compares it to
the train step's consumption rate (the reference overlaps the same work via
torch DataLoader workers, pretrain_unified_navit.py:625-650).

Everything runs on the host CPU: no TPU, no JAX device. Workers use
finalize(as_device=False) exactly like train/driver.py --num_workers.

Usage:
    python scripts/data_throughput.py [--images 96] [--image 1024]
        [--workers 1,2,4] [--batches 6] [--step_s 6.4 --step_tokens 36864]

step_s/step_tokens: a measured train-step time + its padded token count
(bench.py train points); the report prints loader_rate / consume_rate.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(root: str, n_images: int, image: int, seed: int = 0) -> str:
    """Synthetic T2I parquet shard: JPEG bytes + caption json per row.

    JPEG (not PNG) so the native libjpeg pool is on the measured path.
    Low-frequency noise keeps file sizes realistic (~200-600 KB at 1024px);
    pure white noise defeats JPEG and overstates decode cost.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    from PIL import Image

    rng = np.random.default_rng(seed)
    t2i_dir = os.path.join(root, "t2i")
    os.makedirs(t2i_dir, exist_ok=True)
    rows = []
    small = max(8, image // 16)
    for i in range(n_images):
        # upsampled low-res noise ≈ natural-image spectrum for codec cost
        base = rng.integers(0, 255, (small, small, 3), dtype=np.uint8)
        img = Image.fromarray(base, "RGB").resize(
            (image, image), Image.BICUBIC
        )
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=92)
        rows.append({
            "image": buf.getvalue(),
            "captions": json.dumps(
                {"default": f"photo number {i} of a scene with objects"}
            ),
        })
    pq.write_table(
        pa.Table.from_pylist(rows),
        os.path.join(t2i_dir, "part0.parquet"),
        row_group_size=8,
    )
    return t2i_dir


def _worker_factory_impl(t2i_dir: str, image: int, expected_tokens: int,
                         max_tokens: int, worker_id: int, num_workers: int):
    """Module-level (picklable, spawn-safe) packing shard: yields numpy
    HostBatches like train/driver.py's worker factory."""
    from bagel_tpu.data.datasets import T2IIterableDataset
    from bagel_tpu.data.packing import PackedBatchIterator, PackerConfig
    from bagel_tpu.data.tokenizer import MockTokenizer
    from bagel_tpu.data.transforms import ImageTransform

    tok = MockTokenizer(4096)
    # production 1024px operating point: stride 16, max_latent_size 64
    vae_tf = ImageTransform(image, image // 2, 16, max_pixels=image * image)
    pcfg = PackerConfig(vae_image_downsample=16, max_latent_size=image // 16)
    ds = T2IIterableDataset(
        "t2i_pretrain", vae_tf, tok, [t2i_dir], [1],
        num_workers=num_workers, worker_id=worker_id,
    )
    packer = PackedBatchIterator(
        pcfg, [iter(ds)], weights=[1.0], is_mandatory=[False],
        special_tokens=tok.new_token_ids,
        expected_num_tokens=expected_tokens,
        max_num_tokens_per_sample=16384,
        max_num_tokens=max_tokens,
        finalize_kwargs=dict(as_device=False, patch_latent_dim=64,
                             vit_patch_dim=588),
    )
    return iter(packer)


def run_inline(t2i_dir, image, expected_tokens, max_tokens, n_batches):
    """Single-process (the PrefetchLoader thread case): pure pipeline rate."""
    import functools

    it = _worker_factory_impl(t2i_dir, image, expected_tokens, max_tokens,
                              0, 1)
    next(it)  # warm: parquet open, native lib builds, first decode window
    t0 = time.perf_counter()
    toks = imgs = raw = 0
    for _ in range(n_batches):
        host = next(it)
        toks += int(host.batch.position_ids.shape[0])
        raw += sum(host.vae_token_counts) + int(
            np.sum(np.asarray(host.batch.text_idx) !=
                   host.batch.position_ids.shape[0] - 1)
        )
        imgs += len(host.vae_images)
    dt = time.perf_counter() - t0
    return dict(mode="inline", workers=1, batches=n_batches,
                padded_tokens=toks, packed_tokens=raw, images=imgs,
                seconds=round(dt, 3),
                padded_tok_s=round(toks / dt, 1),
                images_s=round(imgs / dt, 2))


def run_mp(t2i_dir, image, expected_tokens, max_tokens, n_batches, workers):
    """MultiprocessLoader path (train/driver.py --num_workers=N)."""
    import functools
    import multiprocessing as mp

    factory = functools.partial(_worker_factory_impl, t2i_dir, image,
                                expected_tokens, max_tokens)
    ctx = mp.get_context("spawn")
    q = ctx.Queue(maxsize=2 * workers)
    stop = ctx.Event()
    from bagel_tpu.data.loader import _mp_worker_main

    procs = [
        ctx.Process(target=_mp_worker_main, args=(factory, w, workers, q, stop),
                    daemon=True)
        for w in range(workers)
    ]
    for p in procs:
        p.start()
    first = q.get(timeout=600)  # warm: spawn + imports + first batch
    if isinstance(first, Exception):
        raise first
    t0 = time.perf_counter()
    toks = imgs = 0
    got = 0
    while got < n_batches:
        host = q.get(timeout=600)
        if isinstance(host, Exception):
            raise host
        if host.__class__.__name__ == "_WorkerDone":
            continue
        toks += int(host.batch.position_ids.shape[0])
        imgs += len(host.vae_images)
        got += 1
    dt = time.perf_counter() - t0
    stop.set()
    for p in procs:
        p.terminate()
        p.join(timeout=5)
    return dict(mode="mp", workers=workers, batches=got,
                padded_tokens=toks, images=imgs, seconds=round(dt, 3),
                padded_tok_s=round(toks / dt, 1),
                images_s=round(imgs / dt, 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=96)
    ap.add_argument("--image", type=int, default=1024)
    ap.add_argument("--workers", default="1,2")
    ap.add_argument("--batches", type=int, default=5)
    ap.add_argument("--expected_tokens", type=int, default=32768)
    ap.add_argument("--max_tokens", type=int, default=36864)
    ap.add_argument("--step_s", type=float, default=None,
                    help="measured train s/step for the consumption ratio")
    ap.add_argument("--step_tokens", type=int, default=36864)
    args = ap.parse_args()

    ncpu = os.cpu_count()
    with tempfile.TemporaryDirectory() as root:
        print(f"# building {args.images} x {args.image}px JPEG corpus ...",
              file=sys.stderr)
        t2i_dir = make_corpus(root, args.images, args.image)
        sz = sum(os.path.getsize(os.path.join(t2i_dir, f))
                 for f in os.listdir(t2i_dir))
        print(f"# corpus {sz/1e6:.1f} MB; host cores={ncpu}", file=sys.stderr)

        results = [run_inline(t2i_dir, args.image, args.expected_tokens,
                              args.max_tokens, args.batches)]
        for w in [int(x) for x in args.workers.split(",") if x]:
            results.append(run_mp(t2i_dir, args.image, args.expected_tokens,
                                  args.max_tokens, args.batches, w))

        for r in results:
            if args.step_s:
                consume = args.step_tokens / args.step_s
                r["consume_tok_s"] = round(consume, 1)
                r["loader_vs_consume"] = round(r["padded_tok_s"] / consume, 2)
            r["host_cores"] = ncpu
            print(json.dumps(r))


if __name__ == "__main__":
    main()
