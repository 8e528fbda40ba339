"""Anti-vacuity comparison helpers.

Round-4 finding (NOTES, commits 2d338c0/686c6c5): the reference
zero-initializes `llm2vae` (bagel.py:96-99 parity), which makes the
rectified-flow denoise a fixed point under random-init params — three
latent "parity" gates silently compared noise to noise for three rounds.
The general failure class: a closeness assertion between two pipeline
outputs proves nothing when both outputs trivially equal a shared input
(identity transform, zero head, dead branch, all-zero grads).

Every latent / token / gradient comparison in the suite must therefore
route through these helpers, which make the liveness precondition
explicit and non-optional. `test_no_vacuous_comparisons.py` enforces this
mechanically: a raw np.testing.assert_allclose near latent/token/grad
identifiers fails the suite unless annotated `# vacuity-ok: <why>`.
"""

from __future__ import annotations

import numpy as np


def _flat(x):
    """Flatten an array or pytree (dict/list/tuple of arrays) to 1-D."""
    if isinstance(x, dict):
        leaves = [v for _, v in sorted(x.items())]
        return np.concatenate([_flat(v) for v in leaves]) if leaves else np.zeros(0)
    if isinstance(x, (list, tuple)):
        return np.concatenate([_flat(v) for v in x]) if x else np.zeros(0)
    return np.asarray(x, np.float64).ravel()


def assert_signal_moved(a, b, floor: float = 1e-3, name: str = "signal") -> float:
    """Prove `a` differs from `b` by more than `floor` mean-|diff|.

    The liveness precondition of any closeness assertion whose subjects
    share an input or fixed point: call it with (output, shared_input)
    BEFORE asserting two outputs are close to each other. Returns the
    measured motion so callers can record it."""
    fa, fb = _flat(a), _flat(b)
    assert fa.shape == fb.shape, (
        f"{name}: shape mismatch {fa.shape} vs {fb.shape} — motion check "
        "needs comparable arrays"
    )
    motion = float(np.mean(np.abs(fa - fb)))
    assert motion > floor, (
        f"{name} did not move: mean|a-b|={motion:.3e} <= floor={floor:.0e} — "
        "the downstream comparison would be vacuous (r4 zero-llm2vae class); "
        "randomize the dead head/branch or fix the fixture"
    )
    return motion


def assert_latent_motion(latent, noise, floor: float = 1e-3) -> float:
    """Denoise-specific spelling: the output latent must have moved off the
    init noise (zero llm2vae / dead flow head makes them equal)."""
    return assert_signal_moved(latent, noise, floor=floor, name="latent")


def assert_nontrivial(x, floor: float = 1e-9, name: str = "tensor") -> float:
    """Prove `x` (array or pytree) is not all-(near-)zero — the liveness
    precondition for gradient/velocity comparisons where the vacuous fixed
    point is 0 rather than a shared input."""
    mag = float(np.mean(np.abs(_flat(x))))
    assert mag > floor, (
        f"{name} is trivially zero (mean|x|={mag:.3e} <= {floor:.0e}) — "
        "comparing it against another zero proves nothing"
    )
    return mag


def assert_close_live(actual, desired, *, moved_from=None, floor: float = 1e-3,
                      rtol: float = 1e-7, atol: float = 0.0,
                      name: str = "output", err_msg: str = ""):
    """np.testing.assert_allclose with a built-in liveness gate.

    moved_from: the shared input / init (noise, prompt-free latent, ...)
    that `desired` must have moved away from. When None, `desired` must
    instead be nontrivially nonzero (the right gate for grads/velocities).
    """
    if moved_from is not None:
        assert_signal_moved(desired, moved_from, floor=floor, name=name)
    else:
        assert_nontrivial(desired, floor=floor, name=name)
    np.testing.assert_allclose(
        np.asarray(actual, np.float64), np.asarray(desired, np.float64),
        rtol=rtol, atol=atol, err_msg=err_msg or name,
    )


def assert_grad_trees_close(got, ref, rtol: float = 3e-4, atol: float = 1e-5,
                            floor: float = 1e-9, name: str = "grads"):
    """Gradient-parity comparison over whole pytrees: identical structure,
    the REFERENCE tree globally nontrivial (all-zero grads would make any
    parallelism 'parity' vacuous), then per-leaf allclose. Individual
    leaves MAY be zero (frozen/unused params) — only the aggregate must
    carry signal."""
    import jax

    flat_g, tree_g = jax.tree_util.tree_flatten(got)
    flat_r, tree_r = jax.tree_util.tree_flatten(ref)
    assert tree_g == tree_r, f"{name}: tree structure mismatch"
    assert_nontrivial([np.asarray(x) for x in flat_r], floor=floor, name=name)
    for i, (a, b) in enumerate(zip(flat_g, flat_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol,
            err_msg=f"{name} leaf {i} of {len(flat_r)}",
        )
