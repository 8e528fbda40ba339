"""One-command judged-eval dry runs (verdict r3 next-step #6).

Each test drives the REAL CLI entry points end-to-end against a mock judge
HTTP endpoint: gen_runner generates images with the tiny demo engine, then a
single `judge_scorer` invocation judges + aggregates into the published
table layout (reference: eval/gen/wise/gpt_eval_mp.py + cal_score.py,
eval/gen/gedit/viescore + calculate_statistics.py). MMMU-CoT runs the same
way through `vlm_runner --score mmmu_cot`.

The judge transport is bagel_tpu.eval.http_judge (stdlib urllib POST), so
these tests also pin the HTTP judge protocol wire format.
"""

import json
import math
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image

TINY = [
    "--max_kv", "512", "--image_size", "32", "--num_timesteps", "2",
    "--cfg_text_scale", "2.0", "--timestep_shift", "1.0",
]


class _MockJudge(BaseHTTPRequestHandler):
    """Routes on prompt content; replies in each protocol's native format.
    Records every request for wire-format assertions."""

    requests = []

    def do_POST(self):
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"]))
        )
        type(self).requests.append(body)
        prompt, n_img = body["prompt"], len(body["images"])
        if "Consistency" in prompt and "Realism" in prompt:  # WISE
            text = ("Consistency: 2\nRealism: 1\nAesthetic Quality: 2"
                    if n_img == 1 else "bad image count")
        elif "Editing instruction:" in prompt:  # VIEScore SC (TIE)
            text = ('{"score": [8, 6], "reasoning": "partial edit"}'
                    if n_img == 2 else "bad image count")
        elif "naturalness" in prompt:  # VIEScore PQ
            text = ('{"score": [7, 9], "reasoning": "fine"}'
                    if n_img == 1 else "bad image count")
        else:
            text = "unroutable prompt"
        payload = json.dumps({"text": text}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # keep pytest output clean
        pass


@pytest.fixture
def judge_url(monkeypatch):
    _MockJudge.requests = []
    server = ThreadingHTTPServer(("127.0.0.1", 0), _MockJudge)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}/v1/judge"
    monkeypatch.setenv("BAGEL_JUDGE_URL", url)
    yield url
    server.shutdown()


def test_wise_generate_judge_aggregate(tmp_path, judge_url, capsys):
    """gen_runner -> judge_scorer wise: one command from images to the
    published category/overall WiScore table."""
    from bagel_tpu.eval import gen_runner, judge_scorer

    meta = tmp_path / "wise.jsonl"
    rows = [
        {"prompt": "a rusted anchor", "explanation": "iron oxidizes",
         "category": "natural_science"},
        {"prompt": "mid-autumn festival food", "explanation": "mooncakes",
         "category": "cultural"},
        {"prompt": "ice left in the sun", "explanation": "it melts",
         "category": "natural_science"},
    ]
    meta.write_text("\n".join(json.dumps(r) for r in rows))
    outdir = tmp_path / "gen"
    gen_runner.main(TINY + ["--metadata", str(meta), "--outdir", str(outdir)])

    judge_scorer.main([
        "wise", "--results_dir", str(outdir),
        "--judge", "bagel_tpu.eval.http_judge:judge",
        "--out", str(tmp_path / "wise_scores"),
    ])
    summary = json.loads(
        (tmp_path / "wise_scores.summary.json").read_text()
    )
    # judge returned (2,1,2) everywhere -> wiscore 1.8 -> /2.0 = 0.9
    assert summary["categories"] == pytest.approx(
        {"natural_science": 0.9, "cultural": 0.9})
    assert summary["overall"] == pytest.approx(0.9)
    # records jsonl enables resume; one judge call per sample, 1 image each
    recs = (tmp_path / "wise_scores.records.jsonl").read_text().splitlines()
    assert len(recs) == 3
    assert len(_MockJudge.requests) == 3
    assert all(len(r["images"]) == 1 for r in _MockJudge.requests)


def test_gedit_generate_judge_aggregate(tmp_path, judge_url):
    """gen_runner (edit rows) -> judge_scorer gedit: the two-call VIEScore
    TIE protocol per sample into the published group table."""
    from bagel_tpu.eval import gen_runner, judge_scorer

    src_root = tmp_path / "orig"
    src_root.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i, group in enumerate(["background_change", "tone_transfer"]):
        name = f"src{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(src_root / name)
        rows.append({
            "prompt": f"make it {group}", "image": name, "group": group,
            "intersection_exist": bool(i), "instruction_language": "en",
        })
    meta = tmp_path / "gedit.jsonl"
    meta.write_text("\n".join(json.dumps(r) for r in rows))
    outdir = tmp_path / "edit"
    gen_runner.main(TINY + [
        "--metadata", str(meta), "--outdir", str(outdir),
        "--image_root", str(src_root), "--cfg_img_scale", "1.5",
    ])

    judge_scorer.main([
        "gedit", "--results_dir", str(outdir),
        "--origin_root", str(src_root),
        "--judge", "bagel_tpu.eval.http_judge:judge",
        "--out", str(tmp_path / "gedit_scores"),
    ])
    summary = json.loads(
        (tmp_path / "gedit_scores.summary.json").read_text()
    )
    # SC = min(8,6) = 6, PQ = min(7,9) = 7, O = sqrt(42) per sample
    for g in ("background_change", "tone_transfer"):
        row = summary["full"]["groups"][g]
        assert row["SC"] == 6 and row["PQ"] == 7 and row["n"] == 1
        assert abs(row["O"] - math.sqrt(42)) < 1e-9
    assert summary["full"]["avg"]["SC"] == 6
    # intersection subset table present (row 1 had intersection_exist)
    assert set(summary["intersection"]["groups"]) == {"tone_transfer"}
    # two judge calls per sample: SC saw [source, edited], PQ saw [edited]
    assert len(_MockJudge.requests) == 4
    n_images = sorted(len(r["images"]) for r in _MockJudge.requests)
    assert n_images == [1, 1, 2, 2]


def test_gedit_resume_skips_judged(tmp_path, judge_url):
    """The gedit records jsonl is a resume log: a second invocation with
    the same --out re-judges nothing."""
    from bagel_tpu.eval import gen_runner, judge_scorer

    src_root = tmp_path / "orig"
    src_root.mkdir()
    Image.fromarray(np.zeros((32, 32, 3), dtype=np.uint8)).save(
        src_root / "a.png"
    )
    meta = tmp_path / "m.jsonl"
    meta.write_text(json.dumps(
        {"prompt": "remove the cat", "image": "a.png", "group": "removal"}
    ))
    outdir = tmp_path / "edit"
    gen_runner.main(TINY + [
        "--metadata", str(meta), "--outdir", str(outdir),
        "--image_root", str(src_root),
    ])
    argv = [
        "gedit", "--results_dir", str(outdir),
        "--origin_root", str(src_root),
        "--judge", "bagel_tpu.eval.http_judge:judge",
        "--out", str(tmp_path / "s"),
    ]
    judge_scorer.main(argv)
    assert len(_MockJudge.requests) == 2
    judge_scorer.main(argv)
    assert len(_MockJudge.requests) == 2  # resumed, no new judge traffic


def test_mmmu_cot_one_command(tmp_path):
    """vlm_runner --score mmmu_cot: generate CoT answers with the tiny
    engine and aggregate into the published per-domain table in one CLI
    invocation (evaluate_mmmu_cot.py + main_eval_only.py)."""
    from bagel_tpu.eval import vlm_runner

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    rows = []
    for i in range(2):
        name = f"v{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(img_dir / name)
        rows.append({
            "index": f"validation_Math_{i}", "image": name,
            "question": "What is shown?",
            "options": {"A": "a chart", "B": "a cat"},
            "answer": "A", "category": "Math",
        })
    data = tmp_path / "mmmu.jsonl"
    data.write_text("\n".join(json.dumps(r) for r in rows))
    out = tmp_path / "mmmu_out.jsonl"
    vlm_runner.main([
        "--data", str(data), "--image_root", str(img_dir),
        "--out", str(out), "--score", "mmmu_cot",
        "--max_length", "8", "--max_kv", "512",
    ])
    table = json.loads((tmp_path / "mmmu_out.jsonl.scores.json").read_text())
    assert "Overall" in table
    # the domain table carries the Math subject under its domain group
    flat = json.dumps(table)
    assert "Math" in flat
