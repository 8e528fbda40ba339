"""Default GenEval detector adapter + HSV color classifier."""

import numpy as np
import pytest
from PIL import Image

from bagel_tpu.eval.detectors import (
    COCO91_NAMES,
    GENEVAL_COLORS,
    classify_colors_hsv,
    detect_default,
)
from bagel_tpu.eval.scorers.geneval import COLORS, Detection

# RGB swatches chosen to sit firmly inside each color's HSV region
SWATCHES = {
    "red": (220, 20, 30),
    "orange": (240, 130, 10),
    "yellow": (240, 220, 20),
    "green": (30, 180, 40),
    "blue": (25, 70, 220),
    "purple": (130, 40, 200),
    "pink": (250, 170, 190),
    "brown": (130, 70, 25),
    "black": (15, 15, 15),
    "white": (245, 245, 245),
}


def test_color_vocab_matches_scorer():
    assert tuple(GENEVAL_COLORS) == tuple(COLORS)


@pytest.mark.parametrize("color", list(SWATCHES))
def test_hsv_classifier_solid_swatches(color):
    img = Image.new("RGB", (64, 64), SWATCHES[color])
    det = Detection(box=(0, 0, 63, 63), score=0.9)
    assert classify_colors_hsv(img, [det]) == [color]


def test_hsv_classifier_center_crop_ignores_border():
    """An object color must win over a differently-colored border (the
    20%-margin center crop models the box containing background)."""
    img = Image.new("RGB", (100, 100), SWATCHES["green"])  # background
    px = img.load()
    for y in range(25, 75):
        for x in range(25, 75):
            px[x, y] = SWATCHES["blue"]  # the object
    det = Detection(box=(20, 20, 80, 80), score=0.9)
    assert classify_colors_hsv(img, [det]) == ["blue"]


def test_hsv_classifier_uses_mask_when_present():
    img = Image.new("RGB", (40, 40), SWATCHES["red"])
    px = img.load()
    for y in range(40):
        for x in range(20):
            px[x, y] = SWATCHES["yellow"]
    mask = np.zeros((40, 40), bool)
    mask[:, :20] = True  # mask selects the yellow half only
    det = Detection(box=(0, 0, 39, 39), score=0.9, mask=mask)
    assert classify_colors_hsv(img, [det]) == ["yellow"]


def test_hsv_classifier_accepts_path(tmp_path):
    p = tmp_path / "img.png"
    Image.new("RGB", (16, 16), SWATCHES["purple"]).save(p)
    det = Detection(box=(0, 0, 15, 15), score=0.9)
    assert classify_colors_hsv(str(p), [det]) == ["purple"]


def test_coco_names_cover_geneval_metadata_classes():
    """Spot classes GenEval metadata uses (COCO-80 names incl. the
    two-word ones) resolve in the COCO-91 list."""
    for name in ("dining table", "potted plant", "stop sign", "wine glass",
                 "teddy bear", "sports ball", "cell phone"):
        assert name in COCO91_NAMES


def test_detect_default_errors_actionably_without_torchvision(tmp_path):
    """In an env without torchvision the adapter must raise an ImportError
    that names the fix and the exact-reproduction (mmdet) recipe — never
    a bare AttributeError from half-constructed state."""
    pytest.importorskip_ = None
    try:
        import torchvision  # noqa: F401
        pytest.skip("torchvision installed: the error path is unreachable")
    except ImportError:
        pass
    p = tmp_path / "x.png"
    Image.new("RGB", (8, 8)).save(p)
    with pytest.raises(ImportError) as ei:
        detect_default(str(p))
    msg = str(ei.value)
    assert "torchvision" in msg and "mmdet" in msg and "--detections" in msg


def test_geneval_end_to_end_with_hsv_classifier(tmp_path):
    """score_layout end-to-end on a synthetic layout: a stub detector +
    the REAL hsv classifier score a color_attr prompt correctly."""
    import json
    import os

    from bagel_tpu.eval.gen_scorer import score_layout
    from bagel_tpu.eval.scorers.geneval import summarize

    folder = tmp_path / "00000" / "samples"
    os.makedirs(folder)
    img = Image.new("RGB", (64, 64), SWATCHES["white"])
    px = img.load()
    for y in range(8, 40):
        for x in range(8, 40):
            px[x, y] = SWATCHES["red"]  # a red "car"
    img.save(folder / "0000.png")
    with open(tmp_path / "00000" / "metadata.jsonl", "w") as f:
        f.write(json.dumps({
            "tag": "color_attr",
            "prompt": "a photo of a red car",
            "include": [{"class": "car", "count": 1, "color": "red"}],
        }) + "\n")

    def detect(path):
        return {"car": [Detection(box=(8, 8, 40, 40), score=0.95)]}

    results = score_layout(str(tmp_path), detect,
                           classify_colors=classify_colors_hsv)
    assert len(results) == 1 and results[0]["correct"] is True
    summary = summarize(results)
    assert summary["overall"] == 1.0

    # wrong color fails with the scorer's reason string
    with open(tmp_path / "00000" / "metadata.jsonl", "w") as f:
        f.write(json.dumps({
            "tag": "color_attr",
            "prompt": "a photo of a blue car",
            "include": [{"class": "car", "count": 1, "color": "blue"}],
        }) + "\n")
    results = score_layout(str(tmp_path), detect,
                           classify_colors=classify_colors_hsv)
    assert results[0]["correct"] is False
    assert "expected blue car" in results[0]["reason"]
