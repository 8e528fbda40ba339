"""Eval runners + serving CLI smoke tests (micro demo model)."""

import json
import os

import numpy as np
import pytest
from PIL import Image


def _args(tmp, extra):
    return [
        "--max_kv", "512", "--image_size", "32", "--num_timesteps", "2",
        "--cfg_text_scale", "2.0", "--timestep_shift", "1.0",
    ] + extra


def test_gen_runner_writes_geneval_layout(tmp_path):
    from bagel_tpu.eval import gen_runner

    meta = tmp_path / "meta.jsonl"
    meta.write_text(
        "\n".join(json.dumps({"prompt": f"object {i}", "tag": "single"})
                  for i in range(2))
    )
    outdir = tmp_path / "gen"
    gen_runner.main(_args(tmp_path, [
        "--metadata", str(meta), "--outdir", str(outdir),
    ]))
    img = outdir / "00000" / "samples" / "0000.png"
    assert img.exists()
    arr = np.asarray(Image.open(img))
    assert arr.shape == (32, 32, 3)
    assert (outdir / "00001" / "metadata.jsonl").exists()
    # resumability: second run skips without error
    gen_runner.main(_args(tmp_path, [
        "--metadata", str(meta), "--outdir", str(outdir),
    ]))


def test_vlm_runner_and_scorers(tmp_path):
    from bagel_tpu.eval import vlm_runner

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(2):
        name = f"q{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(img_dir / name)
        rows.append({"image": name, "question": "is this a cat?",
                     "answer": "yes" if i else "no"})
    data = tmp_path / "qa.jsonl"
    data.write_text("\n".join(json.dumps(r) for r in rows))
    out = tmp_path / "res.jsonl"
    vlm_runner.main([
        "--data", str(data), "--image_root", str(img_dir),
        "--out", str(out), "--score", "yesno", "--max_length", "4",
        "--max_kv", "512",
    ])
    results = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(results) == 2 and all("prediction" in r for r in results)


def test_choice_extraction():
    from bagel_tpu.eval.vlm_runner import extract_choice

    assert extract_choice("A. the red one") == "A"
    assert extract_choice("The answer is (C)") == "C"
    assert extract_choice("(B)") == "B"
    assert extract_choice("I think D fits best") == "D"
    assert extract_choice("nothing") is None


def test_yesno_scorer_math():
    from bagel_tpu.eval.vlm_runner import score_yesno

    results = [
        {"index": 0, "image": "a", "answer": "yes", "prediction": "Yes, it is"},
        {"index": 1, "image": "a", "answer": "no", "prediction": "no"},
        {"index": 2, "image": "b", "answer": "yes", "prediction": "no"},
        {"index": 3, "image": "b", "answer": "no", "prediction": "maybe"},
    ]
    s = score_yesno(results)
    assert s["accuracy"] == 0.5
    assert s["accuracy_plus"] == 0.5  # image 'a' fully correct, 'b' not
    assert 0 < s["f1"] <= 1


def test_serving_one_shot_t2i(tmp_path):
    from bagel_tpu.serving import app

    out = tmp_path / "img.png"
    app.main([
        "--mode", "t2i", "--prompt", "a small square",
        "--output", str(out), "--image_size", "32", "--num_timesteps", "2",
        "--cfg_text_scale", "2.0", "--timestep_shift", "1.0",
        "--max_kv", "512",
    ])
    assert out.exists()
    assert np.asarray(Image.open(out)).shape == (32, 32, 3)


def test_numeric_scorer():
    from bagel_tpu.eval.vlm_runner import extract_number, score_numeric

    assert extract_number("The answer is 42.") == 42.0
    assert extract_number("about 1,234.5 meters") == 1234.5
    assert extract_number("no digits here") is None
    results = [
        {"answer": "42", "prediction": "It is 42"},
        {"answer": "3.14", "prediction": "roughly 3.14159"},
        {"answer": "7", "prediction": "eight"},
    ]
    s = score_numeric(results)
    # 42 exact, 3.14159 within rel_tol of 3.14, "eight" unparseable
    assert s["scored"] == 3 and abs(s["accuracy"] - 2 / 3) < 1e-9


def test_make_parquet_info(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bagel_tpu.data.make_parquet_info import build_parquet_info

    d = tmp_path / "pq"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist([{"a": i} for i in range(10)]),
                   d / "x.parquet", row_group_size=4)
    info = build_parquet_info([str(d)])
    (path, meta), = info.items()
    assert meta["num_row_groups"] == 3 and meta["num_rows"] == 10


def test_ui_localization_labels():
    # --zh swaps known UI strings for Chinese (reference app.py --zh applies
    # a post-hoc component walk; ours localizes at construction time)
    from bagel_tpu.serving.app import ZH_LABELS, _label, parse_args

    assert parse_args(["--zh"]).zh and not parse_args([]).zh
    assert _label("prompt", True) == ZH_LABELS["prompt"] != "prompt"
    # unknown labels pass through in both modes
    assert _label("cfg_text_scale", True) == "cfg_text_scale"
    assert _label("prompt", False) == "prompt"
