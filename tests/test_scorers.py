"""Benchmark scorer tests: canned predictions -> known published-metric
values (VERDICT r1 next-step #5 'Done' criterion)."""

import json
import math

import numpy as np
import pytest


# --------------------------------------------------------------------------
# GenEval
# --------------------------------------------------------------------------


def _det(box, score):
    from bagel_tpu.eval.scorers.geneval import Detection

    return Detection(box=box, score=score)


def test_geneval_counting_threshold_and_include():
    from bagel_tpu.eval.scorers.geneval import evaluate_sample, filter_detections

    raw = {"dog": [_det((0, 0, 10, 10), 0.95), _det((20, 20, 30, 30), 0.5)]}
    # counting tag: 0.9 threshold keeps only one dog
    kept = filter_detections(raw, tag="counting")
    assert len(kept["dog"]) == 1
    ok, reason = evaluate_sample(
        kept, {"tag": "counting", "include": [{"class": "dog", "count": 2}]}
    )
    assert not ok and "expected dog>=2" in reason
    # non-counting tag: 0.3 threshold keeps both
    kept = filter_detections(raw, tag="two_object")
    ok, _ = evaluate_sample(
        kept, {"tag": "two_object", "include": [{"class": "dog", "count": 2}]}
    )
    assert ok


def test_geneval_exclude_and_position():
    from bagel_tpu.eval.scorers.geneval import evaluate_sample

    dets = {
        "cat": [_det((0, 40, 20, 60), 0.9)],
        "dog": [_det((100, 40, 120, 60), 0.9)],
    }
    meta = {
        "tag": "position",
        "include": [
            {"class": "dog", "count": 1},
            {"class": "cat", "count": 1, "position": ("left of", 0)},
        ],
    }
    ok, _ = evaluate_sample(dets, meta)
    assert ok
    meta_bad = {
        "tag": "position",
        "include": [
            {"class": "dog", "count": 1},
            {"class": "cat", "count": 1, "position": ("right of", 0)},
        ],
    }
    ok, reason = evaluate_sample(dets, meta_bad)
    assert not ok and "right of" in reason
    # exclude fires when count reached
    ok, _ = evaluate_sample(
        dets, {"tag": "single_object", "exclude": [{"class": "dog", "count": 1}]}
    )
    assert not ok


def test_geneval_color_uses_classifier():
    from bagel_tpu.eval.scorers.geneval import evaluate_sample

    dets = {"car": [_det((0, 0, 10, 10), 0.9)]}

    def classify(image, found, classname):
        return ["blue"] * len(found)

    ok, _ = evaluate_sample(
        dets,
        {"tag": "colors", "include": [{"class": "car", "count": 1, "color": "blue"}]},
        classify_colors=classify,
    )
    assert ok
    ok, reason = evaluate_sample(
        dets,
        {"tag": "colors", "include": [{"class": "car", "count": 1, "color": "red"}]},
        classify_colors=classify,
    )
    assert not ok and "expected red car" in reason


def test_geneval_summary_matches_reference_layout():
    from bagel_tpu.eval.scorers.geneval import summarize

    results = (
        [{"tag": "single_object", "metadata": f"p{i}", "correct": i < 3}
         for i in range(4)]  # 0.75
        + [{"tag": "counting", "metadata": f"c{i}", "correct": i == 0}
           for i in range(2)]  # 0.5
    )
    s = summarize(results)
    assert s["task_scores"]["single_object"] == 0.75
    assert s["task_scores"]["counting"] == 0.5
    assert abs(s["overall"] - 0.625) < 1e-9
    assert s["total_prompts"] == 6


# --------------------------------------------------------------------------
# MME
# --------------------------------------------------------------------------


def test_mme_known_score():
    from bagel_tpu.eval.scorers.mme import mme_score, parse_pred_ans

    assert parse_pred_ans("Yes, it is") == "yes"
    assert parse_pred_ans("no.") == "no"
    assert parse_pred_ans("maybe") == "other"

    # 2 images x 2 questions: img1 both right, img2 one right
    rows = [
        ("img1", "yes", "yes"), ("img1", "no", "no"),
        ("img2", "yes", "yes"), ("img2", "no", "yes"),
    ]
    out = mme_score({"existence": rows})
    m = out["tasks"]["existence"]
    assert m["acc"] == 0.75 and m["acc_plus"] == 0.5
    assert m["score"] == 125.0  # 100*(0.75+0.5)
    assert out["perception"] == 125.0 and out["cognition"] == 0.0
    assert out["total"] == 125.0


def test_mme_perfect_task_scores_200():
    from bagel_tpu.eval.scorers.mme import mme_score

    rows = [("i", "yes", "yes"), ("i", "no", "no")] * 5
    out = mme_score({"OCR": rows, "code_reasoning": rows})
    assert out["tasks"]["OCR"]["score"] == 200.0
    assert out["perception"] == 200.0 and out["cognition"] == 200.0


# --------------------------------------------------------------------------
# MMMU
# --------------------------------------------------------------------------


def test_mmmu_multi_choice_parsing():
    from bagel_tpu.eval.scorers.mmmu import parse_multi_choice_response

    choices = ["A", "B", "C", "D"]
    i2a = {"A": "apple", "B": "banana", "C": "cherry", "D": "date"}
    assert parse_multi_choice_response("The answer is (B)", choices, i2a) == "B"
    assert parse_multi_choice_response("I pick C ", choices, i2a) == "C"
    # content matching for long answers
    assert parse_multi_choice_response(
        "after much deliberation the fruit shown must be a banana", choices, i2a
    ) == "B"
    # multiple letters: last mention wins
    assert parse_multi_choice_response(
        "(A) seems right but actually (D)", choices, i2a
    ) == "D"


def test_mmmu_open_parsing_and_eval():
    from bagel_tpu.eval.scorers.mmmu import (
        eval_open_response,
        mmmu_accuracy,
        parse_open_response,
    )

    preds = parse_open_response("The total is 1,234 meters. So the answer is 1234")
    assert 1234.0 in preds
    assert eval_open_response("1234", preds)
    assert not eval_open_response("42", parse_open_response("it is 41"))

    samples = [
        {"id": "1", "subject": "math", "question_type": "multiple-choice",
         "answer": "B", "parsed_pred": "B"},
        {"id": "2", "subject": "math", "question_type": "multiple-choice",
         "answer": "A", "parsed_pred": "C"},
        {"id": "3", "subject": "art", "question_type": "open",
         "answer": "7", "parsed_pred": [7.0]},
    ]
    out = mmmu_accuracy(samples)
    assert out["subjects"]["math"]["acc"] == 0.5
    assert out["subjects"]["art"]["acc"] == 1.0
    assert abs(out["overall_acc"] - 2 / 3) < 1e-9


# --------------------------------------------------------------------------
# MMBench
# --------------------------------------------------------------------------


def test_mmbench_letter_extraction_and_circular():
    from bagel_tpu.eval.scorers.mmbench import (
        extract_option_letter,
        mmbench_accuracy,
        mmbench_circular_accuracy,
    )

    opts = {"A": "red", "B": "green"}
    assert extract_option_letter("B", opts) == "B"
    assert extract_option_letter("", opts) == "C"
    assert extract_option_letter("B. green", opts) == "B"
    assert extract_option_letter("the color is green", opts) == "B"

    rows = [
        {"index": 5, "prediction": "A", "answer": "A"},
        {"index": 1_000_005, "prediction": "B", "answer": "B"},
        {"index": 2_000_005, "prediction": "A", "answer": "C"},  # one rotation wrong
        {"index": 7, "prediction": "A", "answer": "A"},
    ]
    plain = mmbench_accuracy(rows)
    assert plain["overall"] == 0.75
    circ = mmbench_circular_accuracy(rows)
    # question 5 fails (one rotation wrong), question 7 passes
    assert circ["num_questions"] == 2 and circ["overall"] == 0.5


# --------------------------------------------------------------------------
# POPE
# --------------------------------------------------------------------------


def test_pope_f1():
    from bagel_tpu.eval.scorers.pope import parse_yes_no, pope_score

    assert parse_yes_no("No, there is not.") == "no"
    assert parse_yes_no("Yes it is. Actually no.") == "yes"  # first sentence
    pairs = [("yes", "Yes"), ("yes", "no"), ("no", "no"), ("no", "Yes")]
    s = pope_score(pairs)
    assert s["TP"] == 1 and s["FN"] == 1 and s["TN"] == 1 and s["FP"] == 1
    assert s["accuracy"] == 0.5 and s["precision"] == 0.5 and s["recall"] == 0.5


# --------------------------------------------------------------------------
# WISE / GEdit judges
# --------------------------------------------------------------------------


def test_wise_extract_and_wiscore():
    from bagel_tpu.eval.scorers.judge import (
        extract_wise_scores,
        wise_summarize,
        wiscore,
    )

    text = "**Consistency**: 2\nRealism: 1\nAesthetic Quality: 0"
    s = extract_wise_scores(text)
    assert s == {"consistency": 2.0, "realism": 1.0, "aesthetic_quality": 0.0}
    assert abs(wiscore(**s) - 1.6) < 1e-9

    records = [
        {"category": "Cultural", "consistency": 2, "realism": 2,
         "aesthetic_quality": 2},  # wiscore 2.0
        {"category": "Cultural", "consistency": 0, "realism": 0,
         "aesthetic_quality": 0},  # wiscore 0.0
    ]
    out = wise_summarize(records)
    # normalized by 2*N: (2.0+0.0)/(2*2) = 0.5
    assert abs(out["categories"]["Cultural"] - 0.5) < 1e-9
    # failure sentinel poisons the category
    out = wise_summarize(records + [{
        "category": "Cultural", "consistency": 9.9, "realism": 1,
        "aesthetic_quality": 1,
    }])
    assert out["categories"]["Cultural"] is None


def test_gedit_summary_and_viescore():
    from bagel_tpu.eval.scorers.judge import gedit_summarize, viescore_overall

    assert abs(viescore_overall([8, 6], [9, 7]) - math.sqrt(42)) < 1e-9
    rows = [
        {"group": "color", "semantics_score": 8.0, "quality_score": 8.0,
         "intersection_exist": True},
        {"group": "color", "semantics_score": 4.0, "quality_score": 9.0,
         "intersection_exist": False},
        {"group": "remove", "semantics_score": 6.0, "quality_score": 6.0,
         "intersection_exist": True},
    ]
    out = gedit_summarize(rows)
    assert out["full"]["groups"]["color"]["SC"] == 6.0
    exp_o = (math.sqrt(64) + math.sqrt(36)) / 2
    assert abs(out["full"]["groups"]["color"]["O"] - exp_o) < 1e-9
    assert out["full"]["avg"]["SC"] == (6.0 + 6.0) / 2
    assert out["intersection"]["groups"]["color"]["n"] == 1


def test_run_judge_resumable(tmp_path):
    from bagel_tpu.eval.scorers.judge import extract_wise_scores, run_judge

    items = [{"id": i, "meta": {"category": "x"}} for i in range(3)]
    calls = []

    def judge(prompt, images):
        calls.append(prompt)
        return "Consistency: 2\nRealism: 2\nAesthetic Quality: 2"

    out_path = str(tmp_path / "scores.jsonl")
    res = run_judge(items, lambda it: f"judge {it['id']}", judge,
                    extract_wise_scores, out_path=out_path)
    assert len(res) == 3 and len(calls) == 3
    # resume: nothing re-judged
    res2 = run_judge(items, lambda it: f"judge {it['id']}", judge,
                     extract_wise_scores, out_path=out_path)
    assert len(res2) == 3 and len(calls) == 3


def test_run_judge_failure_records_aggregate(tmp_path):
    """Items whose judge fails on every retry must yield sentinel-scored
    records that the summarizers can still aggregate (the 9.9 sentinel
    poisons the category), not bare records that KeyError downstream."""
    from bagel_tpu.eval.scorers.judge import (
        JUDGE_FAILURE,
        extract_wise_scores,
        run_judge,
        wise_summarize,
    )

    items = [{"id": 0, "meta": {"category": "x"}},
             {"id": 1, "meta": {"category": "x"}}]

    def judge(prompt, images):
        if "0" in prompt:
            raise RuntimeError("api down")
        return "Consistency: 2\nRealism: 2\nAesthetic Quality: 2"

    res = run_judge(items, lambda it: f"judge {it['id']}", judge,
                    extract_wise_scores, max_retries=1)
    failed = next(r for r in res if r.get("judge_failed"))
    assert failed["consistency"] == JUDGE_FAILURE
    summary = wise_summarize(res, category_of=lambda r: r["category"])
    assert summary["categories"]["x"] is None  # sentinel poisons it


def test_gen_scorer_layout_end_to_end(tmp_path):
    """GenEval layout dir + precomputed detections -> published table."""
    import json
    import os

    from PIL import Image

    from bagel_tpu.eval.gen_scorer import main as scorer_main

    outdir = tmp_path / "results"
    metas = [
        {"tag": "single_object", "prompt": "a dog",
         "include": [{"class": "dog", "count": 1}]},
        {"tag": "single_object", "prompt": "a cat",
         "include": [{"class": "cat", "count": 1}]},
    ]
    det_rows = []
    for i, meta in enumerate(metas):
        d = outdir / f"{i:05d}" / "samples"
        d.mkdir(parents=True)
        img = d / "0000.png"
        Image.new("RGB", (8, 8)).save(img)
        with open(outdir / f"{i:05d}" / "metadata.jsonl", "w") as f:
            f.write(json.dumps(meta) + "\n")
        boxes = {"dog": [[0, 0, 4, 4, 0.9]]} if i == 0 else {}
        det_rows.append({"filename": str(img), "boxes": boxes})
    dets = tmp_path / "dets.jsonl"
    with open(dets, "w") as f:
        for r in det_rows:
            f.write(json.dumps(r) + "\n")

    scorer_main(["--outdir", str(outdir), "--detections", str(dets)])
    with open(outdir / "geneval_summary.json") as f:
        summary = json.load(f)
    # dog found, cat missing -> 50% on single_object
    assert summary["task_scores"]["single_object"] == 0.5
    assert summary["total_images"] == 2
    results = [json.loads(l) for l in open(outdir / "geneval.jsonl")]
    assert results[0]["correct"] and not results[1]["correct"]


def test_mathvista_normalization_and_score():
    from bagel_tpu.eval.scorers.mathvista import (
        mathvista_score,
        normalize_extracted_answer,
    )

    choices = ["red", "green", "blue"]
    assert normalize_extracted_answer("(B) green", choices,
                                      "multi_choice", "", 0) == "green"
    assert normalize_extracted_answer("B", choices,
                                      "multi_choice", "", 0) == "green"
    # nearest-edit-distance fallback
    assert normalize_extracted_answer("gren", choices,
                                      "multi_choice", "", 0) == "green"
    assert normalize_extracted_answer("3.0", [], "free_form",
                                      "integer", 0) == "3"
    assert normalize_extracted_answer("3.14159", [], "free_form",
                                      "float", 2) == "3.14"
    assert normalize_extracted_answer("junk", [], "free_form",
                                      "integer", 0) is None

    rows = [
        {"extraction": "(A)", "choices": ["yes", "no"],
         "question_type": "multi_choice", "answer": "yes", "task": "vqa",
         "skills": ["logic"]},
        {"extraction": "7", "choices": [], "question_type": "free_form",
         "answer_type": "integer", "answer": "8", "task": "vqa",
         "skills": ["arith", "logic"]},
    ]
    out = mathvista_score(rows)
    assert out["accuracy"] == 0.5
    assert out["task"]["vqa"] == 0.5
    assert out["skills"]["arith"] == 0.0 and out["skills"]["logic"] == 0.5


# ---------------------------------------------------------------------------
# KRIS-Bench (eval/gen/kris/{metrics_*,summarize}.py)
# ---------------------------------------------------------------------------


def test_kris_extraction():
    from bagel_tpu.eval.scorers.kris import (
        extract_consistency, extract_dual_scores, extract_instruction,
        extract_quality,
    )

    # JSON-form responses
    s, r = extract_consistency('{"consistency_score": 4, "reason": "ok"}')
    assert (s, r) == (4, "ok")
    s, r = extract_instruction('text {"instruction_score": 5, "reasoning": "x"} tail')
    assert (s, r) == (5, "x")
    s, _ = extract_quality("quality_score: 3")
    assert s == 3
    # regex fallbacks
    s, r = extract_consistency("I rate this 2/5 overall")
    assert (s, r) == (2, None)
    # dual: whole-JSON, block, regex
    d = extract_dual_scores(
        '{"instruction_score": 3, "knowledge_score": 4,'
        ' "instruction_reasoning": "a", "knowledge_reasoning": "b"}'
    )
    assert d["instruction_score"] == 3 and d["knowledge_score"] == 4
    d = extract_dual_scores("instruction_score: 2 and knowledge_score: 5")
    assert d["instruction_score"] == 2 and d["knowledge_score"] == 5
    assert extract_dual_scores("nothing here")["instruction_score"] is None


def test_kris_metric_routing_and_judge_calls():
    from bagel_tpu.eval.scorers.kris import evaluate_sample, metrics_for_category

    assert metrics_for_category("color_change") == [
        "consistency", "instruction_following", "image_quality"]
    assert metrics_for_category("chemistry") == [
        "consistency", "dual_score", "image_quality"]

    calls = []

    def judge(prompt, images):
        # key off the score-key names the prompt asks for (each canonical
        # KRIS prompt names exactly its own keys; dual names both)
        calls.append((prompt, tuple(images)))
        if "knowledge_score" in prompt:
            return '{"instruction_score": 4, "knowledge_score": 3}'
        if "consistency_score" in prompt:
            return '{"consistency_score": 1, "reason": "c"}'
        if "instruction_score" in prompt:
            return '{"instruction_score": 5, "reasoning": "r"}'
        return '{"quality_score": 2, "reasoning": "q"}'

    out = evaluate_sample(judge, "chemistry", "make it rust", "oxidation",
                          "orig.png", "edit.png")
    assert out["consistency_score"] == 1
    assert out["instruction_score"] == 4
    assert out["knowledge_score"] == 3
    assert out["quality_score"] == 2
    # consistency & dual see [orig, edit]; quality sees [edit] only
    assert calls[0][1] == ("orig.png", "edit.png")
    assert calls[1][1] == ("orig.png", "edit.png")
    assert calls[2][1] == ("edit.png",)

    # anomaly correction routes to the abnormal prompt (with explanation)
    calls.clear()
    out = evaluate_sample(judge, "anomaly_correction", "fix it", "why",
                          "o.png", "e.png")
    assert any("why" in p for p, _ in calls)


def test_kris_summarize_published_tables():
    """Known aggregate: hand-computable normalized category/meta/overall."""
    from bagel_tpu.eval.scorers.kris import summarize

    per_cat = {
        # Attribute Perception (no knowledge metric)
        "color_change": {
            "1": {"consistency_score": 5, "quality_score": 3,
                  "instruction_score": 1},
            "2": {"consistency_score": 3, "quality_score": None,
                  "instruction_score": 5},
        },
        # Natural Science (knowledge metric present)
        "physics": {
            "1": {"consistency_score": 5, "quality_score": 5,
                  "instruction_score": 5, "knowledge_score": 1},
        },
    }
    out = summarize(per_cat)
    ap = out["summary"]["Attribute Perception"]
    # normalized: (s-1)*25 -> VC mean of (100, 50)=75; IF mean of (0,100)=50
    assert ap["VC"] == 75 and ap["IF"] == 50 and ap["VQ"] == 50
    # AVG over all 5 non-None normalized values: (100+50+0+50+100)/5
    assert ap["AVG"] == 60
    ns = out["summary"]["Natural Science"]
    assert ns["KP"] == 0 and ns["AVG"] == 75
    # meta category: Conceptual Knowledge = Natural+Social flat values
    assert out["summary"]["Conceptual Knowledge"]["AVG"] == 75
    # overall = all 9 values
    assert abs(out["summary"]["Overall"]["AVG"] - (300 + 300) / 9) < 1e-9
    assert out["subitems"]["Attribute Perception"]["color_change"]["VC"] == 75


def test_kris_score_results_resumable(tmp_path):
    from bagel_tpu.eval.scorers.kris import score_results

    anns = {"color_change": {
        "7": {"ins_en": "paint it red", "explain_en": ""}}}
    n_calls = [0]

    def judge(prompt, images):
        n_calls[0] += 1
        if "instruction_score" in prompt:
            return '{"instruction_score": 5, "reasoning": "r"}'
        if "quality" in prompt:
            return '{"quality_score": 5, "reasoning": "q"}'
        return '{"consistency_score": 5, "reason": "c"}'

    out_path = str(tmp_path / "kris")
    kw = dict(
        judge=judge,
        image_of=lambda c, i: f"{c}/{i}.png",
        orig_of=lambda c, i: f"orig/{c}/{i}.png",
        out_path=out_path,
    )
    out1 = score_results(anns, **kw)
    assert out1["summary"]["Overall"]["AVG"] == 100
    first_calls = n_calls[0]
    out2 = score_results(anns, **kw)  # resumes: zero new judge calls
    assert n_calls[0] == first_calls
    assert out2["summary"] == out1["summary"]


# ---------------------------------------------------------------------------
# RISEBench (eval/gen/rise/gpt_eval.py)
# ---------------------------------------------------------------------------


def test_rise_extract_final_scores():
    from bagel_tpu.eval.scorers.rise import extract_final_scores

    assert extract_final_scores("blah\n**Final Score**: 4") == [4]
    assert extract_final_scores("Final Score: 3, 5") == [3, 5]
    assert extract_final_scores("**Final Scores**:\n2 4") == [2, 4]
    assert extract_final_scores("no verdict") is None


def test_rise_assemble_and_score():
    from bagel_tpu.eval.scorers.rise import (
        assemble_scores, sample_complete, sample_score,
    )

    # three-judge category
    s = assemble_scores("causal_reasoning", "Final Score: 5",
                        "Final Score: 5", "Final Score: 5")
    assert s == {"ApprConsistency": 5, "Reasoning": 5,
                 "VisualPlausibility": 5}
    assert sample_score("causal_reasoning", s) == 5.0
    assert sample_complete("causal_reasoning", s) == 1

    # weighted: 0.3*3 + 0.5*4 + 0.2*5 = 3.9
    s = {"ApprConsistency": 3, "Reasoning": 4, "VisualPlausibility": 5}
    assert abs(sample_score("causal_reasoning", s) - 3.9) < 1e-9
    assert sample_complete("causal_reasoning", s) == 0

    # Reasoning==1 halves the score with a floor of 1
    s = {"ApprConsistency": 5, "Reasoning": 1, "VisualPlausibility": 5}
    got = sample_score("causal_reasoning", s)
    assert abs(got - max(1, (0.3 * 5 + 0.5 * 1 + 0.2 * 5) * 0.5)) < 1e-9

    # logical (two-judge) remap: 0/1 judgments -> 1..5
    s = assemble_scores("logical_reasoning", "Final Score: 1",
                        "Final Score: 0", None)
    assert s == {"ApprConsistency": 5, "Reasoning": 1,
                 "VisualPlausibility": None}
    # 0.3*5 + 0.7*1 = 2.2, then halved (Reasoning==1) -> 1.1
    assert abs(sample_score("logical_reasoning", s) - 1.1) < 1e-9

    # extraction failure -> None row
    assert assemble_scores("causal_reasoning", "??", "Final Score: 5",
                           "Final Score: 5") is None


def test_rise_plan_judges():
    from bagel_tpu.eval.scorers.rise import plan_judges

    p = plan_judges({"category": "temporal_reasoning"})
    assert p["consistency"] and p["quality"]
    assert p["prompt_keys"]["reasoning"] == "reasoning"

    p = plan_judges({"category": "spatial_reasoning", "reference_img": "x"})
    assert p["reasoning_with_input"]
    assert p["prompt_keys"]["reasoning"] == "spatial_ref_img"

    p = plan_judges({"category": "logical_reasoning", "reference_txt": "42"})
    assert not p["quality"]
    assert p["prompt_keys"] == {"consistency": "logical_cons_ans",
                                "reasoning": "logical_txt"}

    p = plan_judges({"category": "causal_reasoning",
                     "consistency_free": True})
    assert not p["consistency"]


def test_rise_summarize_accuracy():
    from bagel_tpu.eval.scorers.rise import summarize

    perfect = {"ApprConsistency": 5, "Reasoning": 5, "VisualPlausibility": 5}
    partial = {"ApprConsistency": 3, "Reasoning": 4, "VisualPlausibility": 5}
    rows = [
        {"category": "causal_reasoning", "subtask": "State Transition",
         "scores": perfect},
        {"category": "causal_reasoning", "subtask": "State Transition",
         "scores": partial},
        {"category": "temporal_reasoning", "subtask": "Life Progression",
         "scores": None},  # judge failed
    ]
    out = summarize(rows)
    assert out["overall"]["accuracy"] == 0.5
    assert out["n_failed"] == 1
    st = out["subtasks"]["State Transition"]
    assert abs(st["score"] - (5.0 + 3.9) / 2) < 1e-9
    assert abs(st["score_percent"] - 25 * ((5.0 + 3.9) / 2 - 1)) < 1e-9


# ---------------------------------------------------------------------------
# ImgEdit-Bench (eval/gen/imgedit/*)
# ---------------------------------------------------------------------------


def test_imgedit_average_and_typescore():
    from bagel_tpu.eval.scorers.imgedit import (
        compute_averages, compute_edit_type_averages,
        extract_scores_and_average,
    )

    resp = "Instruction: 4\nQuality: 2\nConsistency: 3\nnot a score line"
    assert extract_scores_and_average(resp) == 3.0
    assert extract_scores_and_average("no scores at all") is None

    avgs = compute_averages({"a": resp, "b": "x: 5\ny: 5", "c": "garbage"})
    assert avgs == {"a": 3.0, "b": 5.0}

    meta = {"a": {"edit_type": "replace"}, "b": {"edit_type": "add"}}
    table = compute_edit_type_averages(avgs, meta)
    assert table == {"replace": 3.0, "add": 5.0, "overall": 4.0}


def test_imgedit_pipeline_resumable(tmp_path):
    from bagel_tpu.eval.scorers.imgedit import score_results

    meta = {
        "k1": {"edit_type": "replace", "prompt": "swap the cat for a dog"},
        "k2": {"edit_type": "adjust", "prompt": "make it night"},
    }
    prompts = {
        "replace": "Judge this replacement: <edit_prompt>. Reply lines.",
        "adjust": "Judge this adjustment: <edit_prompt>. Reply lines.",
    }
    n = [0]

    def judge(prompt, images):
        n[0] += 1
        assert "<edit_prompt>" not in prompt
        assert len(images) == 2
        return "Instruction: 4\nQuality: 4"

    out_path = str(tmp_path / "imgedit.jsonl")
    kw = dict(
        prompts=prompts, judge=judge,
        origin_of=lambda k, it: f"orig/{k}.png",
        result_of=lambda k, it: f"out/{k}.png",
        out_path=out_path,
    )
    out1 = score_results(meta, **kw)
    assert out1["by_type"] == {"replace": 4.0, "adjust": 4.0, "overall": 4.0}
    assert n[0] == 2
    out2 = score_results(meta, **kw)  # resume: no new judge calls
    assert n[0] == 2
    assert out2["by_type"] == out1["by_type"]


# ---------------------------------------------------------------------------
# MMMU CoT + domain table; MathVista judge extraction
# ---------------------------------------------------------------------------


def test_mmmu_cot_extraction_and_domain_table():
    from bagel_tpu.eval.scorers.mmmu import (
        extract_cot_answer, mmmu_domain_table, subject_of_data_id,
    )

    assert extract_cot_answer("<think>steps...</think> Final Answer: C") == "C"
    assert extract_cot_answer("Final answer: 42 meters") == "42 meters"
    assert extract_cot_answer("just B") == "just B"
    assert subject_of_data_id("validation_Computer_Science_12") == \
        "Computer_Science"

    samples = [
        {"id": "1", "subject": "Art", "question_type": "multiple-choice",
         "answer": "A", "parsed_pred": "A"},
        {"id": "2", "subject": "Art", "question_type": "multiple-choice",
         "answer": "B", "parsed_pred": "A"},
        {"id": "3", "subject": "Design", "question_type": "multiple-choice",
         "answer": "C", "parsed_pred": "C"},
        {"id": "4", "subject": "Biology", "question_type": "multiple-choice",
         "answer": "D", "parsed_pred": "D"},
    ]
    table = mmmu_domain_table(samples)
    # Art 1/2, Design 1/1 -> domain instruction-level (1+1)/3
    assert table["Overall-Art and Design"] == {"num": 3, "acc": 0.667}
    assert table["Art"] == {"num": 2, "acc": 0.5}
    assert table["Overall-Science"] == {"num": 1, "acc": 1.0}
    assert table["Overall"] == {"num": 4, "acc": 0.75}


def test_mathvista_judge_extraction():
    from bagel_tpu.eval.scorers.mathvista import extract_answer_with_judge

    # type shortcuts bypass the judge entirely
    assert extract_answer_with_judge(
        "3", {"answer_type": "integer"}, judge=None) == "3"
    assert extract_answer_with_judge(
        "2.5", {"answer_type": "float"}, judge=None) == "2.5"
    assert extract_answer_with_judge(
        "square", {"question_type": "multi_choice",
                   "choices": ["circle", "square"]}, judge=None) == "square"
    # quick extract
    assert extract_answer_with_judge(
        "Reasoning... Answer: 7 apples", {"answer_type": "text"},
        quick_extract=True) == "7 apples"

    # judge path: receives the few-shot prompt with query + response
    seen = {}

    def judge(prompt, images):
        seen["prompt"] = prompt
        assert images == []
        return " 14 "

    got = extract_answer_with_judge(
        "the missing number is fourteen",
        {"answer_type": "text", "query": "Which number is missing?"},
        judge=judge,
    )
    assert got == "14"
    assert "Which number is missing?" in seen["prompt"]
    assert seen["prompt"].endswith("Extracted answer: ")
    # judge failure degrades to ''
    def bad(prompt, images):
        raise RuntimeError("api down")
    assert extract_answer_with_judge(
        "foo", {"answer_type": "text"}, judge=bad) == ""


# ---------------------------------------------------------------------------
# Benchmark data prep (published formats -> runner jsonl)
# ---------------------------------------------------------------------------


def test_data_prep_mmbench(tmp_path):
    import base64

    from bagel_tpu.eval.data_prep import prep_mmbench

    png = base64.b64encode(b"\x89PNG fakebytes").decode()
    tsv = tmp_path / "mmbench.tsv"
    tsv.write_text(
        "index\tquestion\thint\tA\tB\tC\tD\tanswer\tcategory\timage\n"
        f"7\tWhat color?\tLook closely\tred\tblue\t\t\tB\tcolor\t{png}\n"
    )
    out = tmp_path / "out.jsonl"
    n = prep_mmbench(str(tsv), str(out), str(tmp_path / "imgs"))
    assert n == 1
    row = json.loads(out.read_text())
    assert row["index"] == 7 and row["answer"] == "B"
    assert row["options"] == {"A": "red", "B": "blue"}
    assert row["question"].startswith("Look closely\nWhat color?")
    assert "A. red" in row["question"] and row["question"].endswith(
        "Answer with the option's letter from the given choices directly.")
    import os
    assert os.path.exists(row["image"])
    assert open(row["image"], "rb").read() == b"\x89PNG fakebytes"


def test_data_prep_mme_and_pope(tmp_path):
    from bagel_tpu.eval.data_prep import prep_mme, prep_pope

    root = tmp_path / "mme"
    (root / "color" / "images").mkdir(parents=True)
    (root / "color" / "images" / "x.jpg").write_bytes(b"j")
    (root / "color.txt").write_text(
        "x.jpg\tIs the car red?\tYes\nx.jpg\tIs the car blue?\tNo\n"
    )
    out = tmp_path / "mme.jsonl"
    assert prep_mme(str(root), str(out)) == 2
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert rows[0]["category"] == "color" and rows[0]["answer"] == "yes"
    assert rows[0]["image"] == "color/images/x.jpg"  # images/ fallback
    assert rows[0]["question"].endswith("single word or phrase.")

    q = tmp_path / "pope_q.jsonl"
    q.write_text(json.dumps({
        "question_id": 3, "image": "p.jpg",
        "text": "Is there a dog?", "label": "No",
    }) + "\n")
    out2 = tmp_path / "pope.jsonl"
    assert prep_pope(str(q), str(out2), image_dir="root") == 1
    row = json.loads(out2.read_text())
    assert row["answer"] == "no" and row["image"] == "root/p.jpg"


def test_data_prep_wise(tmp_path):
    from bagel_tpu.eval.data_prep import prep_wise

    src = tmp_path / "wise.json"
    src.write_text(json.dumps([
        {"prompt_id": 11, "Prompt": "a rusting anchor", "Subcategory": "Chemistry"},
    ]))
    out = tmp_path / "wise.jsonl"
    assert prep_wise(str(src), str(out)) == 1
    row = json.loads(out.read_text())
    assert row == {"index": 11, "prompt": "a rusting anchor",
                   "category": "Chemistry"}
