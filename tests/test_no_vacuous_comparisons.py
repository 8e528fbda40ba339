"""Meta-test: no raw latent/token/gradient allclose outside tests/asserts.py.

Round 4 found three parity gates that had been silently vacuous for three
rounds (zero-init llm2vae made the denoise a fixed point, so "latent MAE"
compared noise to noise). The spot fixes landed in 2d338c0/686c6c5; this
test is the systematic guard the verdict asked for: any NEW latent /
token / gradient comparison that bypasses the liveness helpers fails the
suite at collection time, not three rounds later.

Policy enforced over every tests/*.py file:
  * a `np.testing.assert_allclose(...)` call whose argument text (the call
    line plus the following continuation lines) mentions a latent/token/
    grad-ish identifier must either be one of the helpers in
    tests/asserts.py or carry an inline `# vacuity-ok: <reason>`
    annotation within the call's line span;
  * the annotation documents WHY liveness is separately guaranteed (an
    adjacent assert_signal_moved / divergence assert, or subjects that
    cannot share a fixed point).
"""

from __future__ import annotations

import os
import re

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))

# identifiers whose closeness comparisons have a plausible shared fixed
# point (the r4 class): flow latents, decoded tokens, gradients, images.
# Substring-matched through underscores (ref_latent, lat_q, g_pp, ...).
RISKY = re.compile(
    r"(latent|\blat\b|\blat_\w+|\bx_t\b|\bx_full\b|noise|denois|"
    r"velocity|\bv_t\b|\btoks?\b|\btok_\w+|grad|\bg_\w+|\bflat_[a-z]\w*|"
    r"\bimgs?\b|\bimg_\w+|image)"
)
CALL = re.compile(r"np\.testing\.assert_allclose\s*\(")
OK = re.compile(r"#\s*vacuity-ok:\s*\S")
SKIP_FILES = {"asserts.py", os.path.basename(__file__)}


def _call_span(lines, i):
    """Return the source text of the call starting at line i (balanced
    parens), plus its line range."""
    depth, j, buf = 0, i, []
    while j < len(lines):
        line = lines[j]
        buf.append(line)
        depth += line.count("(") - line.count(")")
        if depth <= 0 and j > i or (depth == 0 and "(" in line and j == i):
            break
        j += 1
    return "\n".join(buf), (i, j)


def test_no_raw_latent_allclose():
    offenders = []
    for fname in sorted(os.listdir(TESTS_DIR)):
        if not fname.endswith(".py") or fname in SKIP_FILES:
            continue
        path = os.path.join(TESTS_DIR, fname)
        with open(path) as f:
            lines = f.read().splitlines()
        for i, line in enumerate(lines):
            if not CALL.search(line):
                continue
            call_text, (a, b) = _call_span(lines, i)
            # include 3 lines of leading context: comprehension/loop
            # variables (for a, b in zip(flat_d, flat_p)) carry the
            # risky identifiers that the call line itself aliases away
            context = "\n".join(lines[max(i - 3, 0):i]) + "\n" + call_text
            if not RISKY.search(context):
                continue
            if OK.search(call_text):
                continue
            offenders.append(f"{fname}:{i + 1}: {line.strip()}")
    assert not offenders, (
        "raw np.testing.assert_allclose on latent/token/grad-ish values — "
        "route through tests/asserts.py (assert_close_live / "
        "assert_grad_trees_close) or annotate `# vacuity-ok: <reason>`:\n"
        + "\n".join(offenders)
    )


def test_helpers_fire_on_vacuous_input():
    """The helpers themselves must reject the r4 failure mode."""
    import numpy as np
    import pytest

    from asserts import (
        assert_close_live,
        assert_grad_trees_close,
        assert_latent_motion,
        assert_nontrivial,
        assert_signal_moved,
    )

    noise = np.random.default_rng(0).standard_normal((16, 4))
    moved = noise + 0.1

    # the fixed-point case MUST fail
    with pytest.raises(AssertionError, match="did not move"):
        assert_signal_moved(noise, noise.copy())
    with pytest.raises(AssertionError, match="did not move"):
        assert_latent_motion(noise, noise.copy())
    with pytest.raises(AssertionError, match="trivially zero"):
        assert_nontrivial(np.zeros((8, 8)))
    with pytest.raises(AssertionError, match="did not move"):
        assert_close_live(noise, noise.copy(), moved_from=noise.copy())
    with pytest.raises(AssertionError, match="trivially zero"):
        assert_grad_trees_close({"w": np.zeros(4)}, {"w": np.zeros(4)})

    # the live case passes and returns the measured motion
    assert assert_signal_moved(moved, noise) > 0.09
    assert_close_live(moved, moved.copy(), moved_from=noise,
                      rtol=0, atol=1e-12)
    assert_grad_trees_close({"w": np.ones(4)}, {"w": np.ones(4)})
    # and a genuinely-different pair still fails the closeness half
    with pytest.raises(AssertionError):
        assert_close_live(moved + 1.0, moved, moved_from=noise,
                          rtol=0, atol=1e-6)
