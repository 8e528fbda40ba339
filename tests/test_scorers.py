"""Benchmark scorer tests: canned predictions -> known published-metric
values (VERDICT r1 next-step #5 'Done' criterion)."""

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
