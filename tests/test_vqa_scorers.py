"""VQA-family / MMVP / MM-Vet scorer tests (reference
eval/vlm/eval/{vqa,mmvp,mmvet}/*)."""

import json
import random

from bagel_tpu.eval.scorers.mmvet import (
    build_grader_prompt,
    containment_score,
    mmvet_score,
    parse_grader_score,
)
from bagel_tpu.eval.scorers.mmvp import (
    extract_option,
    mmvp_score,
    parse_options,
)
from bagel_tpu.eval.scorers.vqa import (
    anls_score,
    anls_similarity,
    exact_match_accuracy,
    normalize_answer,
    relaxed_accuracy,
    relaxed_match,
    short_answer,
    soft_answer_scores,
    vqa_accuracy,
)


# ---------------------------------------------------------------------------
# normalization (the EvalAI processor semantics)
# ---------------------------------------------------------------------------


def test_normalize_number_words_and_articles():
    assert normalize_answer("Two dogs") == "2 dogs"
    assert normalize_answer("a man on the beach") == "man on beach"
    assert normalize_answer("ten") == "10"


def test_normalize_contractions_and_punct():
    assert normalize_answer("dont") == "don't"
    assert normalize_answer("it's red.") == "it 's red"
    assert normalize_answer("1,000") == "1000"
    assert normalize_answer("yes!") == "yes"


def test_normalize_hyphen_policy():
    # interior hyphen (no space boundary) becomes a space
    assert normalize_answer("blue-green") == "blue green"
    # boundary-touching punctuation is dropped entirely
    assert normalize_answer("red - ish") == "red ish"


# ---------------------------------------------------------------------------
# vqa_score — closed form vs the published leave-one-out loop
# ---------------------------------------------------------------------------


def _published_soft_scores(gt_answers):
    """The reference loop verbatim semantics (textvqa_eval.py:235-256)."""
    answers = [normalize_answer(a) for a in gt_answers]
    gt = list(enumerate(answers))
    out = {}
    for uniq in set(answers):
        accs = []
        for g in gt:
            others = [x for x in gt if x != g]
            matching = [x for x in others if x[1] == uniq]
            accs.append(min(1, len(matching) / 3))
        out[uniq] = sum(accs) / len(accs)
    return out


def test_soft_scores_match_published_loop():
    rng = random.Random(0)
    vocab = ["yes", "no", "2", "two", "red", "blue", "a dog", "dog"]
    for _ in range(25):
        gts = [rng.choice(vocab) for _ in range(10)]
        ours = soft_answer_scores(gts)
        ref = _published_soft_scores(gts)
        assert set(ours) == set(ref)
        for k in ref:
            assert abs(ours[k] - ref[k]) < 1e-12, (gts, k)


def test_vqa_accuracy_consensus():
    # 4/10 annotators say "yes": any >=3 consensus answer scores 1.0
    rows = [{"prediction": "Yes", "gt_answers": ["yes"] * 4 + ["no"] * 6}]
    assert vqa_accuracy(rows) == 1.0
    # 1/10: each agreeing annotator sees 0 other matches, the 9 others 1/3
    rows = [{"prediction": "maybe",
             "gt_answers": ["maybe"] + ["no"] * 9}]
    assert abs(vqa_accuracy(rows) - 0.3) < 1e-12
    # unmatched prediction scores 0
    rows = [{"prediction": "green", "gt_answers": ["blue"] * 10}]
    assert vqa_accuracy(rows) == 0.0


# ---------------------------------------------------------------------------
# ANLS / relaxed / exact
# ---------------------------------------------------------------------------


def test_anls():
    assert anls_similarity("Paris", "paris") == 1.0
    assert abs(anls_similarity("hella", "hello") - 0.8) < 1e-12
    assert anls_similarity("cat", "dog") == 0.0  # below 0.5 threshold
    rows = [
        {"prediction": "hella", "gt_answers": ["hello", "hi"]},
        {"prediction": "42", "annotation": "42"},
    ]
    assert abs(anls_score(rows) - (0.8 + 1.0) / 2) < 1e-12


def test_relaxed_accuracy():
    assert relaxed_match("12.5", "12")  # 4.2% < 5%
    assert not relaxed_match("12.5", "13.2")
    assert relaxed_match("50%", "0.5")
    assert relaxed_match("Paris", "paris")
    rows = [{"prediction": "12", "annotation": ["12.4"]},
            {"prediction": "cat", "annotation": ["dog"]}]
    assert relaxed_accuracy(rows) == 0.5


def test_exact_match():
    rows = [{"prediction": " Dog ", "annotation": ["dog", "puppy"]},
            {"prediction": "cat", "annotation": "kitten"}]
    assert exact_match_accuracy(rows) == 0.5


def test_short_answer():
    assert short_answer("It is a red car.") == "red car"
    assert short_answer("There are two birds, I think") == "two birds"
    assert short_answer("the city of Paris") == "city"


# ---------------------------------------------------------------------------
# MMVP
# ---------------------------------------------------------------------------


def test_mmvp_option_extraction():
    opts = parse_options("(a) pointing up (b) pointing down")
    assert opts == {"A": "pointing up", "B": "pointing down"}
    assert extract_option("B", opts) == "B"
    assert extract_option("B. pointing down", opts) == "B"
    assert extract_option("The arrow is pointing down", opts) == "B"


def test_mmvp_pair_accuracy():
    opts = {"A": "up", "B": "down"}
    rows = [
        # pair 1: both right
        {"index": 1, "prediction": "A", "answer": "(a)", "options": opts},
        {"index": 2, "prediction": "down", "answer": "(b)", "options": opts},
        # pair 2: one wrong -> no pair credit
        {"index": 3, "prediction": "A", "answer": "(b)", "options": opts},
        {"index": 4, "prediction": "B", "answer": "(b)", "options": opts},
    ]
    out = mmvp_score(rows)
    assert out["pairs"] == 2
    assert out["pair_accuracy"] == 0.5
    assert out["question_accuracy"] == 0.75


# ---------------------------------------------------------------------------
# MM-Vet
# ---------------------------------------------------------------------------


def test_mmvet_containment_algebra():
    assert containment_score("-1 <AND> -5", "x = -1 or x = -5") == 1.0
    assert containment_score("-1 <AND> -5", "x = -1") == 0.5
    assert containment_score("cat <OR> dog", "I see a dog") == 1.0
    assert containment_score("cat <OR> dog", "a bird") == 0.0


def test_mmvet_judge_pipeline_and_capabilities():
    rows = [
        {"index": 0, "question": "q0", "answer": "gt0",
         "prediction": "p0", "capability": "rec,ocr"},
        {"index": 1, "question": "q1", "answer": "gt1",
         "prediction": "p1", "capability": "ocr"},
    ]
    replies = {"q0": "1.0", "q1": "The correctness score is 0.4"}

    def judge(prompt):
        for q, r in replies.items():
            if f"\n{q} |" in prompt:
                return r
        raise AssertionError("unmatched prompt")

    out = mmvet_score(rows, judge=judge)
    assert out["graded_by"] == "judge"
    assert abs(out["total"] - 70.0) < 1e-9
    assert abs(out["cap/rec"] - 100.0) < 1e-9
    assert abs(out["cap/ocr"] - 70.0) < 1e-9
    assert abs(out["combo/ocr,rec"] - 100.0) < 1e-9


def test_mmvet_score_parsing():
    assert parse_grader_score("0.7") == 0.7
    assert parse_grader_score("score: 1.0") == 1.0
    assert parse_grader_score("I think .4 fits") == 0.4
    assert parse_grader_score("no score here") is None
    # the few-shot table's own scores must not confuse the prompt builder
    prompt = build_grader_prompt("q", "g", "p")
    assert prompt.rstrip().endswith("|")


def test_mmvet_export_format(tmp_path):
    import json

    from bagel_tpu.eval.scorers.mmvet import export_results

    rows = [{"question_id": 7, "prediction": "seven"},
            {"index": 9, "prediction": "nine"}]
    path = tmp_path / "results.json"
    export_results(rows, str(path))
    data = json.loads(path.read_text())
    assert data == {"v1_7": "seven", "v1_9": "nine"}


# ---------------------------------------------------------------------------
# data-prep converters (published formats -> runner jsonl)
# ---------------------------------------------------------------------------


def test_data_prep_mmvp(tmp_path):
    from bagel_tpu.eval.data_prep import prep_mmvp

    root = tmp_path / "MMVP"
    root.mkdir()
    (root / "Questions.csv").write_text(
        "Index,Question,Options,Correct Answer\n"
        '1,Which way?,(a) up (b) down,(a)\n'
        '2,Which way?,(a) up (b) down,(b)\n'
    )
    out = tmp_path / "mmvp.jsonl"
    assert prep_mmvp(str(root), str(out)) == 2
    rows = [json.loads(x) for x in out.read_text().splitlines()]
    assert rows[0]["answer"] == "A" and rows[1]["answer"] == "B"
    assert rows[0]["options"] == {"A": "up", "B": "down"}
    assert "A. up" in rows[0]["question"]
    assert rows[0]["image"].endswith("MMVP Images/1.jpg")
    # scored end-to-end through the paired scorer
    from bagel_tpu.eval.scorers.mmvp import mmvp_score

    for r in rows:
        r["prediction"] = r["answer"]
    assert mmvp_score(rows)["pair_accuracy"] == 1.0


def test_data_prep_vqa_with_annotations(tmp_path):
    from bagel_tpu.eval.data_prep import prep_vqa

    test = tmp_path / "test.jsonl"
    test.write_text(
        json.dumps({"image": "i/1.jpg", "question": "How many?",
                    "question_id": 11}) + "\n"
    )
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps({"annotations": [
        {"question_id": 11,
         "answers": [{"answer": "2"}] * 7 + [{"answer": "two"}] * 3}
    ]}))
    out = tmp_path / "vqa.jsonl"
    assert prep_vqa(str(test), str(out), str(ann)) == 1
    row = json.loads(out.read_text())
    assert row["gt_answers"] == ["2"] * 7 + ["two"] * 3
    assert row["question"].endswith("single word or phrase.")
    row["prediction"] = "two"
    assert vqa_accuracy([row]) == 1.0  # normalization folds two -> 2


def test_data_prep_mmvet(tmp_path):
    from bagel_tpu.eval.data_prep import prep_mmvet

    q = tmp_path / "q.jsonl"
    q.write_text(json.dumps({
        "question_id": 3, "image": "x.png", "text": "what?",
        "answer": "cat <OR> dog", "capability": ["rec", "ocr"],
    }) + "\n")
    out = tmp_path / "mmvet.jsonl"
    assert prep_mmvet(str(q), str(out)) == 1
    row = json.loads(out.read_text())
    assert row["capability"] == "rec,ocr"
    row["prediction"] = "a dog"
    assert mmvet_score([row])["total"] == 100.0
