"""Vendor the canonical judge-prompt texts from the reference eval tree.

The WISE / GEdit-VIEScore / KRIS / RISE judged benchmarks are defined as
much by their GPT-judge prompt wording as by their rubrics: reproducing
the published operating point requires the exact bytes. The prompt texts
are benchmark DATA (Apache-2.0; headers in the source files), not
framework code — this script extracts them from the reference sources
into plain text files under bagel_tpu/eval/prompts/, one file per
constant, byte-exact (no added headers inside the files; provenance lives
in README.md + this script).

Extraction is AST-based for constants modules (kris/prompts.py,
gedit/viescore/vie_prompts.py, rise/utils.py) and regex-based for the
WISE prompt embedded as an f-string in wise/gpt_eval_mp.py (the two
f-slots become {prompt} / {explanation} .format slots).

Usage: python scripts/vendor_judge_prompts.py [--reference /root/reference]
The parity test (tests/test_judge_prompts.py) re-runs the same extraction
and compares bytes, so drift between the vendored files and the reference
is caught whenever the reference tree is present.
"""

from __future__ import annotations

import argparse
import ast
import os
import re

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "bagel_tpu", "eval", "prompts")


def ast_string_constants(path: str) -> dict:
    """{name: value} for every module-level `name = \"...\"` assignment.
    Never executes the file."""
    with open(path, encoding="utf-8") as f:
        tree = ast.parse(f.read())
    out = {}
    for node in tree.body:
        if (isinstance(node, ast.Assign) and len(node.targets) == 1
                and isinstance(node.targets[0], ast.Name)
                and isinstance(node.value, ast.Constant)
                and isinstance(node.value.value, str)):
            out[node.targets[0].id] = node.value.value
    return out


def extract_wise(path: str) -> dict:
    """(system, user) texts from the build_evaluation_messages f-string
    (wise/gpt_eval_mp.py:71-155). The user text is an f-string with two
    interpolations; they become {prompt} / {explanation} format slots."""
    with open(path, encoding="utf-8") as f:
        src = f.read()
    sys_m = re.search(r'"text":\s*"((?:[^"\\]|\\.)*)"\s*\}\s*\]\s*\}',
                      src)
    user_m = re.search(r'"text":\s*f"""(.*?)"""', src, re.DOTALL)
    assert sys_m and user_m, "WISE prompt extraction failed"
    system = sys_m.group(1).encode().decode("unicode_escape")
    user = (user_m.group(1)
            .replace("{prompt_data['Prompt']}", "{prompt}")
            .replace("{prompt_data['Explanation']}", "{explanation}"))
    assert "{prompt}" in user and "{explanation}" in user
    return {"system": system, "user": user}


def extract_all(reference: str) -> dict:
    """{(bench, name): text} for every vendored prompt."""
    files = {}

    wise = extract_wise(os.path.join(
        reference, "eval/gen/wise/gpt_eval_mp.py"))
    for name, text in wise.items():
        files[("wise", name)] = text

    vie = ast_string_constants(os.path.join(
        reference, "eval/gen/gedit/viescore/vie_prompts.py"))
    for name in ("_context_no_delimit", "_prompts_0shot_two_image_edit_rule",
                 "_prompts_0shot_tie_rule_SC", "_prompts_0shot_rule_PQ",
                 "_prompts_0shot_one_image_gen_rule",
                 "_prompts_0shot_t2i_rule_SC"):
        files[("gedit", name.lstrip("_"))] = vie[name]

    kris = ast_string_constants(os.path.join(
        reference, "eval/gen/kris/prompts.py"))
    for name, text in kris.items():
        files[("kris", name.replace("prompt_", "", 1))] = text

    rise = ast_string_constants(os.path.join(
        reference, "eval/gen/rise/utils.py"))
    for name, text in rise.items():
        if name.startswith("prompt_"):
            files[("rise", name.replace("prompt_", "", 1))] = text
    return files


README = """# Canonical judge-prompt texts (vendored benchmark data)

One file per prompt constant, **byte-exact** as extracted from the
ByteDance-Seed/Bagel reference eval tree (Apache-2.0):

| dir | source |
|---|---|
| wise/ | eval/gen/wise/gpt_eval_mp.py build_evaluation_messages (system text + user f-string; the f-slots are `{prompt}` / `{explanation}` format slots here) |
| gedit/ | eval/gen/gedit/viescore/vie_prompts.py (`_`-prefix stripped) |
| kris/ | eval/gen/kris/prompts.py (`prompt_` prefix stripped; `.format` slots `{instruct}` / `{explanation}` / `{N}` preserved, incl. the literal `{{ }}` JSON braces in prompts the reference sends UNformatted — quality/generation) |
| rise/ | eval/gen/rise/utils.py (`prompt_` prefix stripped) |

Judge-prompt wording is part of the benchmark definition: the published
operating points are reproducible only with these exact bytes. Regenerate
with `python scripts/vendor_judge_prompts.py`; byte parity vs the
reference is enforced by tests/test_judge_prompts.py whenever the
reference tree is present. Loaded by `bagel_tpu.eval.prompts` as the
DEFAULT prompts of the judged scorers (rubric-equivalent paraphrases
remain as fallback when a file is missing).
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()
    files = extract_all(args.reference)
    for (bench, name), text in sorted(files.items()):
        d = os.path.join(OUT, bench)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{name}.txt")
        with open(path, "w", encoding="utf-8", newline="") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    with open(os.path.join(OUT, "README.md"), "w") as f:
        f.write(README)


if __name__ == "__main__":
    main()
