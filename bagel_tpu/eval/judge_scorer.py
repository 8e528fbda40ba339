"""Score KRIS / RISE / ImgEdit result directories with a pluggable judge.

The reference scores these benchmarks with GPT-4o workers
(eval/gen/kris/metrics_*.py, rise/gpt_eval.py, imgedit/basic_bench.py +
step1/step2). The metric machinery — prompt routing, extraction,
aggregation — lives in bagel_tpu/eval/scorers/{kris,rise,imgedit}.py; the
judge itself is external (API access) and plugs in as

  --judge pkg.module:function    callable (prompt_text, [image_paths]) -> str

Usage:
  python -m bagel_tpu.eval.judge_scorer kris \
      --bench_dir KRIS_Bench --results_dir results/kris/bagel \
      --judge my_judges:gpt4o --out results/kris/scores
  python -m bagel_tpu.eval.judge_scorer rise \
      --data data.json --results_dir results/rise --input_dir data \
      --prompts prompts.json --judge my_judges:gpt4o
  python -m bagel_tpu.eval.judge_scorer imgedit \
      --edit_json basic_edit.json --results_dir results/imgedit \
      --origin_root imgs --prompts prompts.json --judge my_judges:gpt4o
"""

from __future__ import annotations

import argparse
import importlib
import json
import os


def load_callable(spec: str):
    mod, _, fn = spec.partition(":")
    return getattr(importlib.import_module(mod), fn)


def score_kris(args, judge):
    from bagel_tpu.eval.scorers.kris import KRIS_BENCHMARK_TYPE, score_results

    cats = args.categories or [
        c for subs in KRIS_BENCHMARK_TYPE.values() for c in subs
    ]
    annotations = {}
    for cat in cats:
        ann_file = os.path.join(args.bench_dir, cat, "annotation.json")
        if not os.path.exists(ann_file):
            print(f"# skip {cat}: no {ann_file}")
            continue
        with open(ann_file) as f:
            annotations[cat] = json.load(f)

    def image_of(cat, image_id):
        return os.path.join(args.results_dir, cat, f"{image_id}.png")

    def orig_of(cat, image_id):
        entry = annotations[cat][image_id]
        return os.path.join(args.bench_dir, cat, entry["ori_img"])

    return score_results(annotations, judge, image_of, orig_of,
                         out_path=args.out)


def score_rise(args, judge):
    from bagel_tpu.eval.scorers.rise import score_results

    with open(args.data) as f:
        items = json.load(f)
    with open(args.prompts) as f:
        prompts = json.load(f)

    def image_of(item):
        base = os.path.join(args.results_dir, item["category"])
        for suffix in ("png", "jpg", "jpeg"):
            p = os.path.join(base, f"{item['index']}.{suffix}")
            if os.path.exists(p):
                return p
        raise FileNotFoundError(f"no output image for {item['index']}")

    def input_image_of(item):
        key = item.get("reference_img") or item.get("image")
        return os.path.join(args.input_dir, key)

    return score_results(items, judge, prompts, image_of, input_image_of)


def score_imgedit(args, judge):
    from bagel_tpu.eval.scorers.imgedit import score_results

    with open(args.edit_json) as f:
        meta = json.load(f)
    with open(args.prompts) as f:
        prompts = json.load(f)
    return score_results(
        meta, prompts, judge,
        origin_of=lambda k, it: os.path.join(args.origin_root, it["id"]),
        result_of=lambda k, it: os.path.join(args.results_dir, f"{k}.png"),
        out_path=args.out,
    )


def main(argv=None):
    ap = argparse.ArgumentParser("bagel_tpu judge scorer")
    ap.add_argument("benchmark", choices=["kris", "rise", "imgedit"])
    ap.add_argument("--judge", required=True,
                    help="pkg.module:function -> (prompt, [paths]) -> str")
    ap.add_argument("--results_dir", required=True)
    ap.add_argument("--out", default=None, help="resume/output path prefix")
    # kris
    ap.add_argument("--bench_dir", default=None)
    ap.add_argument("--categories", nargs="*", default=None)
    # rise
    ap.add_argument("--data", default=None)
    ap.add_argument("--input_dir", default="data")
    # imgedit + rise
    ap.add_argument("--prompts", default=None)
    ap.add_argument("--edit_json", default=None)
    ap.add_argument("--origin_root", default=None)
    args = ap.parse_args(argv)

    judge = load_callable(args.judge)
    out = {"kris": score_kris, "rise": score_rise,
           "imgedit": score_imgedit}[args.benchmark](args, judge)
    print(json.dumps(out, indent=2, default=float))
    if args.out:
        with open(f"{args.out}.summary.json", "w") as f:
            json.dump(out, f, indent=2, default=float)


if __name__ == "__main__":
    main()
