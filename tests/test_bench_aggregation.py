"""bench.py parent aggregation logic (no device work: children mocked).

The driver runs `python bench.py` at round end; these tests pin the
headline selection (measured full-depth quantized point preferred when
faster than the bf16 extrapolation), the affine decode fit, and the JSON
contract, so a bench regression can't silently corrupt the recorded
metrics.
"""

import json
import os

import numpy as np
import pytest

import bench


def run_main_with_fake_spawn(monkeypatch, capsys, results, statuses=None,
                             argv=()):
    """results: dict (mode, depth, dtype) -> child dict or None.
    statuses: optional same-keyed dict of spawn statuses; a popped-empty
    list value lets a test simulate stall-then-recover sequences."""
    calls = []

    def fake_spawn(mode, depth, dtype, image, steps, schedule, timeout,
                   slots=8, ts=(3, 5), canary_watch=False, kv_quant=False,
                   canary_s=None):
        calls.append((mode, depth, dtype, ts, canary_watch))
        key = (mode + "q" if kv_quant else mode, depth, dtype)
        st = (statuses or {}).get(key)
        if isinstance(st, list):
            st = st.pop(0) if st else "ok"
        r = results.get(key)
        if st is None:
            st = "ok" if r else "failed"
        return (r if st in ("ok", "timeout") else None), st

    class FakeDev:
        platform = "tpu"

    monkeypatch.setattr(bench, "_spawn", fake_spawn)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    import os as _os

    import bagel_tpu.utils.tpulock as tpulock

    monkeypatch.setattr(tpulock, "LOCK_PATH",
                        f"/tmp/bagel_tpu_test_{_os.getpid()}.lock")
    import jax

    monkeypatch.setattr(jax, "devices", lambda: [FakeDev()])
    monkeypatch.setattr("sys.argv", ["bench.py", "--preset", "full", *argv])
    bench.LIVE_STATE.clear()
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    payload = [l for l in out if l.startswith("{")]
    assert len(payload) == 1, out  # exactly ONE JSON line
    res = json.loads(payload[-1])
    res["_spawn_calls"] = calls
    return res


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
            # main child's train phases budget-skipped -> fallback child
            ("train", 4, "bf16"): {"train_points": [
                {"depth": 4, "variant": "full_grad", "step_s": 0.795,
                 "tokens": 4352},
            ]},
        },
    )
    srv = res["detail"]["serving_runtime_aggregate_decode"]
    assert srv["slots"] == 8 and srv["aggregate_tok_per_s"] == 410.2
    tr = res["detail"]["train_fwd_bwd"]
    assert tr["points"][0]["depth"] == 4
    assert tr["points"][0]["step_s"] == 0.795
    assert tr["points"][0]["tokens_per_s"] == round(4352 / 0.795, 1)
    # one full-grad point -> no affine extrapolation block
    assert "full_depth_extrapolated" not in tr
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


def test_r4_contract_runs_fidelity_train_floor(monkeypatch, capsys):
    """Round-4 bench contract: multi-run headline stats, fidelity gate
    passthrough, multi-point train block with affine full-depth fit +
    analytic MFU, dispatch-floor caveat on the serving aggregate."""
    fid = {
        "denoise": {"latent_mae": 0.004, "mae_gate_1e-2": True},
        "decode": {"w8a8_teacher_forced_agreement": 0.991},
    }
    tps = [
        {"depth": 2, "variant": "full_grad", "step_s": 0.55, "tokens": 4352},
        {"depth": 4, "variant": "full_grad", "step_s": 0.80, "tokens": 4352},
        {"depth": 8, "variant": "freeze_und", "step_s": 1.10,
         "tokens": 4352},
    ]
    res = run_main_with_fake_spawn(
        monkeypatch, capsys,
        {
            ("main", 28, "w8a8"): {
                "elapsed": 17.0, "elapsed_runs": [17.5, 17.0, 16.8],
                "detail": {"full_forwards_on": 11, "full_forwards_off": 20,
                           "steps_cfg_on": 29, "steps_cfg_off": 21},
                "decode": 95.4, "fidelity": fid, "train_points": tps,
                "dispatch_floor_ms": 30.0,
                "serve_tok_s": 410.2, "serve_tokens": 1024,
                "serve_elapsed": 2.5, "serve_slots": 8,
            },
        },
    )
    d = res["detail"]
    assert d["runs"] == 3 and d["median_s"] == 17.0
    assert d["spread_s"] == pytest.approx(0.7, abs=1e-6)
    assert res["value"] == round(1 / 17.0, 5)  # headline = median
    assert d["fidelity"] == fid
    assert d["dispatch_floor_ms"] == 30.0
    # mfu block: both denominators present, measured >= datasheet ratio
    mfu = d["mfu"]
    assert 0 < mfu["mfu_datasheet"] < mfu["mfu_measured_peak"] <= 1.5
    # train: affine fit over full-grad depths 2,4 -> t(28)
    b = (0.80 - 0.55) / 2
    t28 = (0.55 - 2 * b) + 28 * b
    tr = d["train_fwd_bwd"]
    assert tr["full_depth_extrapolated"]["step_s"] == round(t28, 3)
    assert tr["full_depth_extrapolated"]["steps_per_s"] == round(1 / t28, 4)
    assert 0 < tr["full_depth_extrapolated"]["analytic_mfu_bf16"] < 1
    assert len(tr["points"]) == 3
    # serving caveat quantified
    srv = d["serving_runtime_aggregate_decode"]
    assert srv["dispatch_floor_share_est"] == round(
        min(1024 / 8 * 30.0 / 1000.0 / 2.5, 1.0), 2
    )
    assert "dispatch floor" in srv["dispatch_floor_note"]


def test_parser_multi_run_and_new_lines():
    parsed = bench._parse_child_stdout(
        "FLOOR 31.5\n"
        "ELAPSED 17.5 17.0 16.8\n"
        'DETAIL {"steps_cfg_on": 29}\n'
        'FIDELITY {"denoise": {"latent_mae": 0.004}}\n'
        'TRAINPT {"depth": 2, "variant": "full_grad", "step_s": 0.55, '
        '"tokens": 4352}\n'
        'TRAINPT {"depth": 8, "variant": "freeze_und", "step_s": 1.1, '
        '"tokens": 4352}\n'
    )
    assert parsed["elapsed"] == 17.0  # median of runs
    assert parsed["elapsed_runs"] == [17.5, 17.0, 16.8]
    assert parsed["dispatch_floor_ms"] == 31.5
    assert parsed["fidelity"]["denoise"]["latent_mae"] == 0.004
    assert [p["depth"] for p in parsed["train_points"]] == [2, 8]


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


def test_canary_stall_retries_main_once(monkeypatch, capsys):
    """A wedged chip (no CANARY within the grace window / child exit 3)
    triggers exactly ONE main retry after the wedge-recovery wait; the
    retry's results are used and the wedge is recorded in detail."""
    res = run_main_with_fake_spawn(
        monkeypatch, capsys,
        {("main", 28, "w8a8"): {"elapsed": 17.0, "canary_s": 61.0,
                                "elapsed8": 6.2}},
        statuses={("main", 28, "w8a8"): ["canary_stall", "ok"]},
    )
    mains = [c for c in res["_spawn_calls"] if c[0] == "main"]
    assert len(mains) == 2
    assert res["value"] == round(1 / 17.0, 5)
    assert res["detail"]["chip_wedge_retry"] is True
    assert res["detail"]["canary_first_dispatch_s"] == 61.0


def test_elapsed8_is_fallback_headline(monkeypatch, capsys):
    """The in-child cheap bf16 depth-8 artifact (ELAPSED8) becomes the
    extrapolated headline when the full-depth w8a8 phase never landed —
    WITHOUT spawning a separate bf16 fallback child."""
    res = run_main_with_fake_spawn(
        monkeypatch, capsys,
        {("main", 28, "w8a8"): {"elapsed8": 9.71, "canary_s": 60.0,
                                "decode": 95.4}},
        statuses={("main", 28, "w8a8"): "timeout"},
    )
    assert res["value"] == round(8 / (9.71 * 28), 5)
    assert "extrapolated" in res["detail"]["headline_basis"]
    assert ("denoise", 8, "bf16") not in [
        c[:3] for c in res["_spawn_calls"]
    ]


def test_failed_gate_demotes_headline_to_parity_point(monkeypatch, capsys):
    """When the headline schedule FAILS the fidelity gate, the measured
    (3,5) parity point takes the headline."""
    res = run_main_with_fake_spawn(
        monkeypatch, capsys,
        {("main", 28, "w8a8"): {
            "elapsed": 12.0,
            "detail": {"taylorseer_threshold": 5,
                       "taylorseer_first_enhance": 5},
            "parity_point": {"taylorseer_threshold": 3,
                             "taylorseer_first_enhance": 5,
                             "s_img": 17.1},
            "fidelity": {"denoise": {"latent_rel_mae": 0.02,
                                     "rel_mae_gate_1e-2": False}},
        }},
    )
    assert res["value"] == round(1 / 17.1, 5)
    assert "TaylorSeer (3,5)" in res["detail"]["headline_basis"]


def test_passing_gate_keeps_headline_and_reports_parity(monkeypatch, capsys):
    fid = {"denoise": {"latent_rel_mae": 0.0052, "rel_mae_gate_1e-2": True,
                       "comparison_live": True}}
    res = run_main_with_fake_spawn(
        monkeypatch, capsys,
        {("main", 28, "w8a8"): {
            "elapsed": 12.0, "elapsed_runs": [12.1, 12.0],
            "detail": {"taylorseer_threshold": 5,
                       "taylorseer_first_enhance": 5,
                       "full_forwards_on": 9, "full_forwards_off": 4,
                       "steps_cfg_on": 29, "steps_cfg_off": 21},
            "parity_point": {"taylorseer_threshold": 3,
                             "taylorseer_first_enhance": 5, "s_img": 17.1},
            "fidelity": fid,
        }},
    )
    assert res["value"] == round(1 / 12.0, 5)
    assert "TaylorSeer (5,5)" in res["detail"]["headline_basis"]
    pp = res["detail"]["w8a8_parity_schedule_point"]
    assert pp["img_per_s"] == round(1 / 17.1, 5)
    assert res["detail"]["fidelity"] == fid
    # main child is asked for the (5,5) headline schedule by default
    mains = [c for c in res["_spawn_calls"] if c[0] == "main"]
    assert mains[0][3] == (5, 5) and mains[0][4] is True


def test_ratcheted_main_child_fills_core_fields_via_fallbacks(
        monkeypatch, capsys):
    """The HBM-ratchet scenario (r5 session 2, measured twice on chip):
    the main child lands denoise+decode then cedes; the parent must fill
    the missing CORE fields (fidelity gate, train point, serve, serveq)
    from per-phase fallback children, in that priority order, before any
    optional extras."""
    fid = {"denoise": {"latent_rel_mae": 0.006, "rel_mae_gate_1e-2": True,
                       "comparison_live": True}}
    res = run_main_with_fake_spawn(
        monkeypatch, capsys,
        {
            ("main", 28, "w8a8"): {"elapsed": 12.0, "decode": 96.0,
                                   "elapsed8": 4.6},
            # second-tier combined children carry ALL the core fields
            ("quality", 8, "w8a8"): {
                "fidelity": fid,
                "train_points": [
                    {"depth": 4, "variant": "full_grad", "step_s": 0.99,
                     "tokens": 4352}]},
            ("serving", 28, "w8a8"): {
                "serve_tok_s": 430.0, "serve_tokens": 1536,
                "serve_elapsed": 3.5, "serve_slots": 12,
                "serve_ttft_ms_p50": 210.0,
                "serveq_tok_s": 610.0, "serveq_tokens": 3072,
                "serveq_elapsed": 5.0, "serveq_slots": 24,
                "serveq_ttft_ms_p50": 260.0},
            ("decode", 8, "bf16"): {"decode": 146.0},
            ("decode", 4, "bf16"): {"decode": 234.0},
        },
    )
    d = res["detail"]
    assert d["fidelity"] == fid
    assert d["train_fwd_bwd"]["points"][0]["depth"] == 4
    assert d["serving_runtime_aggregate_decode"]["aggregate_tok_per_s"] == 430.0
    assert (d["serving_runtime_aggregate_decode_kv_int8"]
            ["aggregate_tok_per_s"] == 610.0)
    modes = [c[0] for c in res["_spawn_calls"]]
    # combined core children run right after main, before optional extras,
    # and the satisfied third-tier single-phase children are skipped
    assert modes[:3] == ["main", "quality", "serving"]
    assert "fidelity" not in modes and "train" not in modes


def test_main_child_fidelity_skips_quality_child(monkeypatch, capsys):
    """r5 session 3 contract: the main child carries the fidelity gate
    in-process (before its full-HBM pair), so when it lands, the parent
    must NOT spawn the quality child — only the single-phase train child
    and the serving family are still missing."""
    fid = {"denoise": {"latent_rel_mae": 0.005, "rel_mae_gate_1e-2": True,
                       "comparison_live": True}}
    res = run_main_with_fake_spawn(
        monkeypatch, capsys,
        {
            ("main", 28, "w8a8"): {"elapsed": 12.0, "decode": 96.0,
                                   "elapsed8": 4.6, "fidelity": fid},
            ("train", 4, "bf16"): {"train_points": [
                {"depth": 4, "variant": "full_grad", "step_s": 0.99,
                 "tokens": 4352}]},
            ("serving", 28, "w8a8"): {
                "serve_tok_s": 430.0, "serve_tokens": 1536,
                "serve_elapsed": 3.5, "serve_slots": 12,
                "serveq_tok_s": 610.0, "serveq_tokens": 3072,
                "serveq_elapsed": 5.0, "serveq_slots": 24},
        },
    )
    d = res["detail"]
    assert d["fidelity"] == fid
    assert d["train_fwd_bwd"]["points"][0]["depth"] == 4
    modes = [c[0] for c in res["_spawn_calls"]]
    assert modes[:3] == ["main", "train", "serving"]
    assert "quality" not in modes and "fidelity" not in modes


def test_main_child_runs_fidelity_before_full_depth_pair(monkeypatch,
                                                         capsys):
    """Child-side structural pin (r5 session 3): in mode=main the
    fidelity gate runs BEFORE the full-depth denoise+decode pair (the
    per-process arena is a one-way ratchet after that pair), and the
    child attempts NO train/serve phases — it cedes unconditionally."""
    order = []

    monkeypatch.setattr(bench, "run_canary", lambda *a, **k: 1.0)
    monkeypatch.setattr(bench, "measure_dispatch_floor",
                        lambda *a, **k: 28.0)
    monkeypatch.setattr(bench, "_wait_hbm", lambda *a, **k: True)

    def fake_denoise(depth, image, steps, dtype, repeats=1,
                     schedules=((5, 5),)):
        order.append(("denoise", depth, dtype))
        return ([[12.0] * repeats] * len(schedules),
                [{"schedule": s} for s in schedules])

    def fake_fidelity(depth, image, steps, threshold=3, first_enhance=5):
        order.append(("fidelity", depth, "w8a8"))
        return {"latent_rel_mae": 0.005, "rel_mae_gate_1e-2": True}

    def fake_decode(depth, dtype, **kw):
        order.append(("decode", depth, dtype))
        return 96.0

    def boom(*a, **k):  # any train/serve attempt in-child is the bug
        raise AssertionError("main child must cede train/serve phases")

    monkeypatch.setattr(bench, "run_denoise_production", fake_denoise)
    monkeypatch.setattr(bench, "run_fidelity_denoise", fake_fidelity)
    monkeypatch.setattr(bench, "run_decode_bench", fake_decode)
    monkeypatch.setattr(bench, "run_train_bench", boom)
    monkeypatch.setattr(bench, "run_serving_bench", boom)
    monkeypatch.setattr(bench, "run_spec_decode_bench", boom)
    monkeypatch.setattr(bench, "run_fidelity_decode", boom)

    import argparse

    args = argparse.Namespace(mode="main", depth=28, dtype="w8a8",
                              image=1024, steps=50, schedule="production",
                              slots=12, kv_quant=False, ts_threshold=5,
                              ts_first_enhance=5, preset="full")
    monkeypatch.setenv("BAGEL_BENCH_CHILD_BUDGET_S", "1400")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    bench._child_main(args)
    out = capsys.readouterr().out
    assert "FIDELITY" in out and "ELAPSED " in out and "DECODE" in out
    kinds = [(k, d) for k, d, _ in order]
    # fidelity (d8) strictly before the full-depth denoise, decode last
    assert kinds.index(("fidelity", 8)) < kinds.index(("denoise", 28))
    assert kinds[-1] == ("decode", 28)


def test_quality_child_canary_stall_retries_once(monkeypatch, capsys):
    """A canary-stalled combined child is the chip's ~5 min post-session
    wedge, not a missing capability: the parent must wait and retry once,
    and harvest the retry's result."""
    fid = {"denoise": {"latent_rel_mae": 0.006, "rel_mae_gate_1e-2": True}}
    res = run_main_with_fake_spawn(
        monkeypatch, capsys,
        {
            ("main", 28, "w8a8"): {"elapsed": 12.0, "decode": 96.0},
            ("quality", 8, "w8a8"): {"fidelity": fid, "train_points": [
                {"depth": 4, "variant": "full_grad", "step_s": 1.0,
                 "tokens": 4352}]},
        },
        statuses={("quality", 8, "w8a8"): ["canary_stall", "ok"]},
    )
    assert res["detail"]["fidelity"] == fid
    modes = [c[0] for c in res["_spawn_calls"]]
    assert modes.count("quality") == 2


def test_serve_ttft_passthrough(monkeypatch, capsys):
    res = run_main_with_fake_spawn(
        monkeypatch, capsys,
        {("main", 28, "w8a8"): {
            "elapsed": 17.0,
            "serve_tok_s": 410.2, "serve_tokens": 1024,
            "serve_elapsed": 2.5, "serve_slots": 12,
            "serve_ttft_ms_p50": 812.5,
            "serveq_tok_s": 600.0, "serveq_tokens": 2048,
            "serveq_elapsed": 3.4, "serveq_slots": 24,
            "serveq_ttft_ms_p50": 1200.0,
        }},
    )
    assert res["detail"]["serving_runtime_aggregate_decode"][
        "prefill_ms_p50"] == 812.5
    assert res["detail"]["serving_runtime_aggregate_decode_kv_int8"][
        "prefill_ms_p50"] == 1200.0


def test_parser_new_lines():
    parsed = bench._parse_child_stdout(
        "CANARY 61.3\n"
        "ELAPSED8 9.71\n"
        "ELAPSED 12.1 12.0\n"
        'PARITYPT {"taylorseer_threshold": 3, "s_img": 17.1}\n'
        "SERVE 410.2 1024 2.5 12 812.5\n"
        "SERVEQ 600.0 2048 3.4 24 1200.0\n"
    )
    assert parsed["canary_s"] == 61.3
    assert parsed["elapsed8"] == 9.71
    assert parsed["elapsed"] == 12.05
    assert parsed["parity_point"]["s_img"] == 17.1
    assert parsed["serve_ttft_ms_p50"] == 812.5
    assert parsed["serveq_ttft_ms_p50"] == 1200.0
    # old 5-field SERVE lines still parse (no ttft)
    old = bench._parse_child_stdout("SERVE 410.2 1024 2.5 12\n")
    assert old["serve_tok_s"] == 410.2
    assert "serve_ttft_ms_p50" not in old


def test_parser_incremental_live_merge():
    """Line-by-line merging (the signal-time LIVE_STATE path) must match
    whole-blob parsing, incl. TRAINPT dedup when a line is re-seen."""
    blob = (
        "CANARY 60.0\nELAPSED8 9.7\n"
        'TRAINPT {"depth": 4, "variant": "full_grad", "step_s": 0.8, '
        '"tokens": 4352}\n'
        "ELAPSED 12.0\n"
    )
    whole = bench._parse_child_stdout(blob)
    inc = {}
    for line in blob.splitlines():
        bench._parse_child_stdout(line, inc)
        bench._parse_child_stdout(line, inc)  # duplicate delivery
    assert inc == whole


def test_bench_failed_carries_diagnostics(monkeypatch, capsys):
    res = run_main_with_fake_spawn(monkeypatch, capsys, {})
    assert res["metric"] == "bench_failed"
    assert "canary_s" in res["detail"]
    assert "note" in res["detail"]


def test_signal_time_partial_result():
    """The SIGTERM emitter's builder yields a measured headline from
    whatever the children had printed (the forced-kill done-criterion)."""
    # mid-run: only the cheap artifact landed
    st = bench._parse_child_stdout("CANARY 61.0\nELAPSED8 9.71\nFLOOR 30.1\n")
    res = bench.build_partial_result(st, 1024, 50, signum=15)
    assert res["metric"].endswith("denoise_throughput")
    assert res["value"] == round(8 / (9.71 * 28), 5)
    assert res["detail"]["partial_signal_exit"] is True
    assert res["detail"]["canary_s"] == 61.0

    # later: the w8a8 headline landed too — it wins
    bench._parse_child_stdout("ELAPSED 12.1 12.0\nDECODE 95.4\n", st)
    res = bench.build_partial_result(st, 1024, 50, signum=15)
    assert res["value"] == round(1 / 12.05, 5)
    assert res["detail"]["decode"] == 95.4

    # nothing measured yet: explicit failure with diagnostics
    res = bench.build_partial_result({"canary_s": 61.0}, 1024, 50)
    assert res["metric"] == "bench_failed"
    assert res["detail"]["canary_s"] == 61.0


def test_sigterm_emits_partial_json_in_real_process(tmp_path):
    """End-to-end forced-kill: a real `bench.py` parent (full path, fake
    children via env hook is impossible cross-process, so we emulate the
    slow phase with a stub child command) prints ONE JSON line when
    SIGTERM'd mid-run."""
    import signal
    import subprocess
    import sys
    import time as _time

    # a stub bench child: prints the cheap artifact then sleeps forever —
    # exactly a main child stuck in the heavy compile
    stub = tmp_path / "stub_bench.py"
    stub.write_text(
        "import sys, time\n"
        "print('CANARY 5.0', flush=True)\n"
        "print('ELAPSED8 9.71', flush=True)\n"
        "time.sleep(90)\n"
    )
    code = (
        "import sys, types\n"
        "sys.argv = ['bench.py', '--preset', 'full']\n"
        "import bench\n"
        # route _spawn's child command through the stub
        "real = bench._spawn\n"
        "def spawn(mode, depth, dtype, image, steps, schedule, timeout,\n"
        "          **kw):\n"
        f"    bench.__file__ = {str(stub)!r}\n"
        "    kw.pop('canary_watch', None)\n"
        "    return real(mode, depth, dtype, image, steps, schedule,\n"
        "                timeout, canary_watch=False, **kw)\n"
        "bench._spawn = spawn\n"
        "bench.main()\n"
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # full path, no jax init in parent
    env["BAGEL_TPU_LOCK"] = str(tmp_path / "tpu.lock")
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True, cwd=os.path.dirname(bench.__file__),
                            env=env)
    # wait until the stub's artifact reaches LIVE_STATE (the child prints
    # within a second; give the parent time to spawn + parse)
    _time.sleep(20)
    proc.send_signal(signal.SIGTERM)
    out, err = proc.communicate(timeout=60)
    payload = [l for l in out.strip().splitlines() if l.startswith("{")]
    assert len(payload) == 1, (out, err[-500:])
    res = json.loads(payload[0])
    assert res["detail"].get("partial_signal_exit") is True
    assert res["value"] == round(8 / (9.71 * 28), 5), res
