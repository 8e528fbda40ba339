"""Corruption augmentations + split helper (+ resize parity vs reference)."""

import numpy as np
import pytest
from PIL import Image

import refutil  # noqa: F401

from bagel_tpu.data.transforms import (
    MaxLongEdgeMinShortEdgeResize,
    decolorization,
    downscale,
    gaussian_blur,
    inpainting_mask,
    shuffle_patch,
    split_integer_exp_decay,
)


def _img(rng, w=64, h=48):
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))


def test_resize_geometry_invariants():
    """Stride divisibility + max_size/max_pixels budgets hold for any input
    (reference transform semantics, data/transforms.py:15-87; the reference
    itself is not importable here — it requires torchvision)."""
    ours = MaxLongEdgeMinShortEdgeResize(512, 256, 16, max_pixels=262144)
    rng = np.random.default_rng(0)
    for _ in range(30):
        w = int(rng.integers(100, 3000))
        h = int(rng.integers(100, 3000))
        nw, nh = ours.target_size(w, h)
        assert nw % 16 == 0 and nh % 16 == 0, (w, h, nw, nh)
        assert max(nw, nh) <= 512
        assert nw * nh <= 262144 * 1.1  # snap-to-stride slack
        # aspect ratio approximately preserved
        assert abs((nw / nh) - (w / h)) / (w / h) < 0.25


def test_corruptions_preserve_shape():
    rng = np.random.default_rng(0)
    img = _img(rng)
    assert decolorization(img).size == img.size
    assert downscale(img).size == img.size
    assert gaussian_blur(img).size == img.size
    out = shuffle_patch(img, grid=4, rng=rng)
    assert out.size == (64, 48)
    masked = inpainting_mask(img, rng=rng)
    assert masked.size == img.size
    assert (np.asarray(masked) == 0).all(axis=-1).any()  # some box blacked


def test_split_integer_exp_decay():
    import random

    rng = random.Random(0)
    parts, cuts = split_integer_exp_decay(20, 1.0, rng)
    assert sum(parts) == 20 and all(p > 0 for p in parts)
    parts, _ = split_integer_exp_decay(20, 0.5, rng)
    assert sum(parts) == 20
