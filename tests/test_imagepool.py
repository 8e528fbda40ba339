"""Native threaded JPEG decode+resize pool vs the PIL reference path."""

import io

import numpy as np
import pytest
from PIL import Image

from bagel_tpu.data.transforms import ImageTransform, pil_img2rgb
from bagel_tpu.native import imagepool


def _jpeg_bytes(rng, h, w, quality=92) -> bytes:
    arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    # smooth it so JPEG error stays small and the comparison is about the
    # resize kernel, not compression noise
    arr = np.asarray(Image.fromarray(arr).resize((w, h), Image.BILINEAR))
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def test_jpeg_dims():
    if not imagepool.native_available():
        pytest.skip("no native toolchain")
    data = _jpeg_bytes(np.random.default_rng(0), 48, 70)
    assert imagepool.jpeg_dims(data) == (70, 48)
    assert imagepool.jpeg_dims(b"not a jpeg") is None


def test_decode_resize_matches_pil():
    rng = np.random.default_rng(1)
    jpegs = [_jpeg_bytes(rng, 97, 143), _jpeg_bytes(rng, 64, 64),
             _jpeg_bytes(rng, 31, 220)]
    targets = [(56, 84), (28, 28), (28, 196)]
    outs = imagepool.decode_resize_batch(jpegs, targets, n_threads=2)
    for data, (th, tw), got in zip(jpegs, targets, outs):
        assert got is not None and got.shape == (th, tw, 3)
        img = pil_img2rgb(Image.open(io.BytesIO(data)))
        want = np.asarray(img.resize((tw, th), Image.BICUBIC), np.float32)
        want = (want / 255.0 - 0.5) / 0.5
        # native path matches Pillow's uint8-intermediate rounding but keeps
        # float32 coefficients (Pillow: 8-bit fixed point) — tolerance
        # covers that coefficient quantization
        assert np.abs(got - want).max() <= 1.5 / 255.0 * 2.0, (
            np.abs(got - want).max()
        )


def test_batch_transform_policy_and_fallbacks():
    rng = np.random.default_rng(2)
    tf = ImageTransform(64, 16, 16, max_pixels=64 * 64)
    bt = imagepool.JpegBatchTransform(tf, n_threads=2)

    jpeg = _jpeg_bytes(rng, 100, 150)
    png_buf = io.BytesIO()
    Image.fromarray((rng.random((40, 52, 3)) * 255).astype(np.uint8)).save(
        png_buf, format="PNG"
    )
    outs = bt([jpeg, png_buf.getvalue(), b"garbage"])

    # JPEG row: native path must land on the reference target_size policy
    img = pil_img2rgb(Image.open(io.BytesIO(jpeg)))
    want = tf(img)
    assert outs[0] is not None and outs[0].shape == want.shape
    assert np.abs(outs[0] - want).max() <= 1.5 / 255.0 * 2.0

    # PNG row: PIL fallback, same policy
    png_img = pil_img2rgb(Image.open(io.BytesIO(png_buf.getvalue())))
    assert outs[1] is not None and outs[1].shape == tf(png_img).shape

    # corrupt row: None, not an exception
    assert outs[2] is None


def test_decode_resize_pil_only_path(monkeypatch):
    """The module must work with no native library at all."""
    monkeypatch.setattr(imagepool, "_lib", None)
    monkeypatch.setattr(imagepool, "_tried", True)
    rng = np.random.default_rng(3)
    outs = imagepool.decode_resize_batch(
        [_jpeg_bytes(rng, 40, 40)], [(24, 24)]
    )
    assert outs[0] is not None and outs[0].shape == (24, 24, 3)
