"""Native packing kernels: C++ vs Python fallback vs device mask builder."""

import numpy as np
import pytest

import jax.numpy as jnp

import bagel_tpu.native as native
from bagel_tpu.ops.attention import train_packed_mask


def test_native_builds():
    assert native.native_available(), "g++ build of libbagelpack.so failed"


def test_pack_spans_matches_fallback():
    spans = np.asarray([
        # doc fan noise n mode rope_start offset
        [1, -1, -1, 5, 0, 0, 0],     # causal text, sequential rope
        [1, 1, -1, 4, 1, 5, 5],      # full image, constant rope
        [2, 2, 2, 6, 1, 0, 9],       # noise image, second document
    ], np.int64)
    doc, fan, noi, pos = native.pack_spans(spans, 20)

    lib = native._lib
    native._lib = None  # force fallback
    try:
        doc2, fan2, noi2, pos2 = native.pack_spans(spans, 20)
    finally:
        native._lib = lib
    np.testing.assert_array_equal(doc, doc2)
    np.testing.assert_array_equal(fan, fan2)
    np.testing.assert_array_equal(noi, noi2)
    np.testing.assert_array_equal(pos, pos2)
    assert pos[:5].tolist() == [0, 1, 2, 3, 4]
    assert pos[5:9].tolist() == [5] * 4
    assert doc[15:].tolist() == [0] * 5  # padding untouched


def test_fill_ranges():
    out = native.fill_ranges(np.asarray([3, 10]), np.asarray([4, 2]))
    assert out.tolist() == [3, 4, 5, 6, 10, 11]


def test_native_mask_matches_device_builder():
    rng = np.random.default_rng(0)
    s = 24
    doc = rng.integers(0, 3, s).astype(np.int32)
    fan = rng.integers(-1, 3, s).astype(np.int32)
    noi = np.where(fan == 2, fan, -1).astype(np.int32)
    host = native.build_train_mask(doc, fan, noi)
    dev = np.asarray(
        train_packed_mask(jnp.asarray(doc), jnp.asarray(fan), jnp.asarray(noi))
    )
    np.testing.assert_array_equal(host, dev)


def test_pack_spans_throughput():
    """The native path should beat Python comfortably at real sizes."""
    import time

    if not native.native_available():
        pytest.skip("no native lib")
    n_spans, total = 2000, 200_000
    rng = np.random.default_rng(0)
    lens = np.full(n_spans, total // n_spans)
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
    spans = np.stack([
        rng.integers(1, 50, n_spans), rng.integers(-1, 5, n_spans),
        rng.integers(-1, 5, n_spans), lens,
        rng.integers(0, 2, n_spans), rng.integers(0, 100, n_spans), offs,
    ], 1).astype(np.int64)

    def best_of(fn, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_native = best_of(lambda: native.pack_spans(spans, total))
    lib = native._lib
    native._lib = None
    try:
        t_py = best_of(lambda: native.pack_spans(spans, total))
    finally:
        native._lib = lib
    # informational only — absolute timing is too noisy under parallel CI
    print(f"pack_spans: native {t_native*1e3:.2f}ms vs python {t_py*1e3:.2f}ms")
    assert t_native > 0 and t_py > 0
