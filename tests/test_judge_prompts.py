"""Canonical judge-prompt byte parity (VERDICT r4 missing #3).

The vendored texts under bagel_tpu/eval/prompts/ must reproduce the
reference judge prompts byte-for-byte, and the default (no `prompts=`)
scorer paths must emit those bytes. Parity tests skip when the reference
tree is absent; the default-wiring tests always run against the vendored
files."""

import importlib.util
import os

import pytest

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _vendor():
    spec = importlib.util.spec_from_file_location(
        "vendor_judge_prompts",
        os.path.join(REPO, "scripts", "vendor_judge_prompts.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


needs_ref = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "eval")),
    reason="reference tree not available",
)


@needs_ref
def test_vendored_files_match_reference_bytes():
    """Every vendored file == the text extracted from the reference now."""
    from bagel_tpu.eval.prompts import load

    files = _vendor().extract_all(REF)
    assert len(files) >= 30  # wise 2 + gedit 6 + kris 10 + rise 14
    for (bench, name), want in sorted(files.items()):
        got = load(bench, name)
        assert got is not None, f"missing vendored {bench}/{name}"
        assert got == want, f"byte drift in {bench}/{name}"


@needs_ref
def test_wise_default_prompt_is_reference_bytes():
    """build_wise_prompt with no overrides == the reference f-string
    rendered with the same Prompt/Explanation (gpt_eval_mp.py:85-144)."""
    import re

    from bagel_tpu.eval.prompts import wise_system
    from bagel_tpu.eval.scorers.judge import build_wise_prompt

    with open(os.path.join(REF, "eval/gen/wise/gpt_eval_mp.py")) as f:
        src = f.read()
    m = re.search(r'"text":\s*f"""(.*?)"""', src, re.DOTALL)
    want = (m.group(1)
            .replace("{prompt_data['Prompt']}", "a red cube")
            .replace("{prompt_data['Explanation']}", "a cube that is red"))
    assert build_wise_prompt("a red cube", "a cube that is red") == want
    assert "Vincennes" in wise_system()  # the reference's exact system text


@needs_ref
def test_vie_tie_prompts_are_reference_composition():
    """build_vie_sc_tie_prompt / build_vie_pq_prompt == the exact
    '\\n'.join compositions of viescore/__init__.py:31-32."""
    from bagel_tpu.eval.scorers.judge import (
        build_vie_pq_prompt,
        build_vie_sc_tie_prompt,
    )

    c = _vendor().ast_string_constants(
        os.path.join(REF, "eval/gen/gedit/viescore/vie_prompts.py"))
    want_sc = "\n".join([
        c["_context_no_delimit"],
        c["_prompts_0shot_two_image_edit_rule"],
        c["_prompts_0shot_tie_rule_SC"],
    ]).replace("<instruction>", "make the cat blue")
    want_pq = "\n".join([c["_context_no_delimit"],
                         c["_prompts_0shot_rule_PQ"]])
    assert build_vie_sc_tie_prompt("make the cat blue") == want_sc
    assert build_vie_pq_prompt() == want_pq


@needs_ref
def test_kris_default_prompts_are_reference_bytes():
    from bagel_tpu.eval.scorers.kris import DEFAULT_PROMPTS

    c = _vendor().ast_string_constants(
        os.path.join(REF, "eval/gen/kris/prompts.py"))
    assert DEFAULT_PROMPTS["consistency"] == c["prompt_consist"]
    assert DEFAULT_PROMPTS["instruction_following"] == \
        c["prompt_instruction_following"]
    assert DEFAULT_PROMPTS["abnormal_instruction_following"] == \
        c["prompt_abnormal_instruction_following"]
    # quality is sent UNformatted by both pipelines: bytes keep the {{ }}
    assert DEFAULT_PROMPTS["image_quality"] == c["prompt_quality"]
    assert "{{" in DEFAULT_PROMPTS["image_quality"]
    assert DEFAULT_PROMPTS["dual_score"] == c["prompt_dual_evaluation"]
    assert DEFAULT_PROMPTS["view_instruction_following"] == \
        c["prompt_view_instruction_following"]
    assert DEFAULT_PROMPTS["consistency_multi"] == c["prompt_consist_multi"]
    assert DEFAULT_PROMPTS["instruction_multi"] == \
        c["prompt_instruction_multi"]


@needs_ref
def test_rise_default_prompts_are_reference_bytes():
    from bagel_tpu.eval.prompts import rise_defaults

    c = _vendor().ast_string_constants(
        os.path.join(REF, "eval/gen/rise/utils.py"))
    defaults = rise_defaults()
    ref_prompts = {k.replace("prompt_", "", 1): v for k, v in c.items()
                   if k.startswith("prompt_")}
    assert set(defaults) == set(ref_prompts)
    for k, v in ref_prompts.items():
        assert defaults[k] == v, f"byte drift in rise/{k}"


def test_kris_format_slots_render():
    """The canonical KRIS prompts format with the scorer's kwargs (and the
    unformatted quality prompt reaches the judge raw)."""
    from bagel_tpu.eval.scorers.kris import DEFAULT_PROMPTS, evaluate_sample

    seen = []

    def judge(prompt, images):
        seen.append((prompt, tuple(images)))
        return '{"consistency_score": 4, "reason": "r"}' \
            if "consistency" in prompt else \
            '{"instruction_score": 3, "reasoning": "r"} {"quality_score": 5}'

    evaluate_sample(judge, "color_change", "paint it red", "", "o.png",
                    "e.png")
    assert len(seen) == 3
    assert "paint it red" in seen[0][0]  # consistency, formatted
    assert "{instruct}" not in seen[0][0]
    assert seen[2][0] == DEFAULT_PROMPTS["image_quality"]  # raw


def test_rise_defaults_cover_all_plan_keys():
    """Every prompt key plan_judges can emit resolves in rise_defaults."""
    from bagel_tpu.eval.prompts import rise_defaults
    from bagel_tpu.eval.scorers.rise import plan_judges

    defaults = rise_defaults()
    items = [
        {"category": "temporal_reasoning"},
        {"category": "temporal_reasoning", "reference_img": "x",
         "reasoning_img": "y"},
        {"category": "causal_reasoning"},
        {"category": "spatial_reasoning"},
        {"category": "spatial_reasoning", "reference_img": "x"},
        {"category": "spatial_reasoning", "reasoning_img": "y"},
        {"category": "logical_reasoning"},
        {"category": "logical_reasoning", "reference_txt": "t"},
        {"category": "logical_reasoning", "reasoning_wo_ins": True},
    ]
    for item in items:
        for key in plan_judges(item)["prompt_keys"].values():
            assert key in defaults, f"no canonical prompt for {key}"
