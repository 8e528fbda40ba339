"""bench.py parent aggregation logic (no device work: children mocked).

The driver runs `python bench.py` at round end; these tests pin the
headline selection (measured full-depth quantized point preferred when
faster than the bf16 extrapolation), the affine decode fit, and the JSON
contract, so a bench regression can't silently corrupt the recorded
metrics.
"""

import json

import numpy as np
import pytest

import bench


def run_main_with_fake_spawn(monkeypatch, capsys, results):
    """results: dict (mode, depth, dtype) -> child dict or None."""

    def fake_spawn(mode, depth, dtype, image, steps, schedule, timeout,
                   slots=8):
        return results.get((mode, depth, dtype))

    class FakeDev:
        platform = "tpu"

    monkeypatch.setattr(bench, "_spawn", fake_spawn)
    import jax

    monkeypatch.setattr(jax, "devices", lambda: [FakeDev()])
    monkeypatch.setattr("sys.argv", ["bench.py", "--preset", "full"])
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    payload = [l for l in out if l.startswith("{")]
    assert len(payload) == 1, out  # exactly ONE JSON line
    return json.loads(payload[-1])


def test_headline_prefers_measured_quant_when_faster(monkeypatch, capsys):
    res = run_main_with_fake_spawn(
        monkeypatch, capsys,
        {
            # combined main child: denoise + decode + serve in one process
            ("main", 28, "w8a8"): {
                "elapsed": 27.38, "decode": 95.4,
                "serve_tok_s": 410.2, "serve_tokens": 1024,
                "serve_elapsed": 2.5, "serve_slots": 8,
            },
            ("denoise", 8, "bf16"): {"elapsed": 9.71, "detail": {}},
            ("denoise", 28, "int8"): {"elapsed": 33.3},
            ("decode", 8, "bf16"): {"decode": 142.9},
            ("decode", 4, "bf16"): {"decode": 235.8},
            # depth-8 train child OOMs (no result) -> depth-4 fallback
            ("train", 4, "bf16"): {"train_s": 0.795, "train_tokens": 4352},
        },
    )
    srv = res["detail"]["serving_runtime_aggregate_decode"]
    assert srv["slots"] == 8 and srv["aggregate_tok_per_s"] == 410.2
    tr = res["detail"]["train_fwd_bwd"]
    assert tr["depth"] == 4 and tr["step_s"] == 0.795
    assert tr["tokens_per_s"] == round(4352 / 0.795, 1)
    # bf16 extrapolated = 1/(9.71*28/8) = 0.0294 < measured w8a8 1/27.38
    assert res["value"] == round(1.0 / 27.38, 5)
    assert "w8a8 full-depth measured" in res["detail"]["headline_basis"]
    assert res["detail"]["bf16_extrapolated_img_per_s"] == round(
        8 / (9.71 * 28), 5
    )
    assert res["detail"]["w8a8_full_depth_denoise_img_per_s_measured"] == round(
        1 / 27.38, 5
    )
    assert res["unit"] == "img/s/chip"
    assert res["vs_baseline"] == round(res["value"] / 2.0, 5)


def test_headline_falls_back_to_extrapolation(monkeypatch, capsys):
    res = run_main_with_fake_spawn(
        monkeypatch, capsys,
        {
            # the combined main child failed (e.g. OOM) -> bf16 fallback
            ("denoise", 8, "bf16"): {"elapsed": 9.71, "detail": {}},
            ("decode", 8, "bf16"): {"decode": 142.9},
        },
    )
    assert res["value"] == round(8 / (9.71 * 28), 5)
    assert "extrapolated" in res["detail"]["headline_basis"]
    # single decode point -> linear extrapolation
    assert res["detail"]["vqa_decode_extrapolation"] == "linear from depth 8"
    assert res["detail"]["vqa_decode_tok_per_s_28layer_extrapolated"] == round(
        142.9 * 8 / 28, 2
    )


def test_decode_affine_fit(monkeypatch, capsys):
    res = run_main_with_fake_spawn(
        monkeypatch, capsys,
        {
            ("denoise", 8, "bf16"): {"elapsed": 10.0, "detail": {}},
            ("decode", 8, "bf16"): {"decode": 142.9},
            ("decode", 4, "bf16"): {"decode": 235.8},
        },
    )
    t1, t2 = 1 / 142.9, 1 / 235.8
    b = (t1 - t2) / (8 - 4)
    a = t1 - b * 8
    want = round(1.0 / (a + b * 28), 2)
    assert res["detail"]["vqa_decode_tok_per_s_28layer_extrapolated"] == want
    assert "affine" in res["detail"]["vqa_decode_extrapolation"]


def test_all_denoise_failed_reports_bench_failed(monkeypatch, capsys):
    res = run_main_with_fake_spawn(monkeypatch, capsys, {})
    assert res["metric"] == "bench_failed"
    assert res["value"] == 0


def test_bf16_failed_but_quant_measured_is_headline(monkeypatch, capsys):
    """bf16 depth-reduced children timing out must not discard a valid
    measured full-depth quantized number (NOTES: bf16 attempts can time
    out on this host)."""
    res = run_main_with_fake_spawn(
        monkeypatch, capsys,
        {
            ("main", 28, "w8a8"): {"elapsed": 27.38, "decode": 95.4},
            ("denoise", 28, "int8"): {"elapsed": 33.3},
        },
    )
    assert res["metric"].endswith("denoise_throughput")
    assert res["value"] == round(1.0 / 27.38, 5)
    assert "w8a8 full-depth measured" in res["detail"]["headline_basis"]
    assert "bf16_extrapolated_img_per_s" not in res["detail"]


def test_specdec_detail_and_parser(monkeypatch, capsys):
    """SPECDEC child lines surface as the speculative_decode_echo detail
    (speedup ratio + greedy-exact flag)."""
    parsed = bench._parse_child_stdout(
        "ELAPSED 20.0\nSPECDEC 95.0 412.5 1\n"
    )
    assert parsed["specdec_plain"] == 95.0
    assert parsed["specdec_spec"] == 412.5
    assert parsed["specdec_exact"] is True

    res = run_main_with_fake_spawn(
        monkeypatch, capsys,
        {
            ("main", 28, "w8a8"): {
                "elapsed": 27.38, "decode": 95.4,
                "specdec_plain": 95.0, "specdec_spec": 412.5,
                "specdec_exact": True,
            },
        },
    )
    sd = res["detail"]["speculative_decode_echo"]
    assert sd["plain_tok_per_s"] == 95.0
    assert sd["spec_tok_per_s"] == 412.5
    assert sd["speedup"] == pytest.approx(4.34, abs=0.01)
    assert sd["greedy_exact"] is True
