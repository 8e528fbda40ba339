"""Image transforms (host-side, PIL + numpy — no torchvision).

Semantics match the reference exactly (data/transforms.py:15-115):
- MaxLongEdgeMinShortEdgeResize: scale so the long edge <= max_size and the
  short edge >= min_size, snap both dims to stride multiples (round, min
  stride), cap total pixels (shrink + re-snap), re-cap the long edge.
- ImageTransform: resize -> [0,1] -> normalize(mean .5, std .5) => [-1, 1].

Output layout is HWC float32 (TPU conv layout), not CHW.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from PIL import Image


class MaxLongEdgeMinShortEdgeResize:
    def __init__(
        self,
        max_size: int,
        min_size: int,
        stride: int,
        max_pixels: int,
        resample=Image.BICUBIC,
    ):
        self.max_size = max_size
        self.min_size = min_size
        self.stride = stride
        self.max_pixels = max_pixels
        self.resample = resample

    def _make_divisible(self, value: float) -> int:
        return max(self.stride, int(round(value / self.stride) * self.stride))

    def _apply_scale(self, width: int, height: int, scale: float) -> Tuple[int, int]:
        w = self._make_divisible(round(width * scale))
        h = self._make_divisible(round(height * scale))
        return w, h

    def target_size(self, width: int, height: int, img_num: int = 1) -> Tuple[int, int]:
        scale = min(self.max_size / max(width, height), 1.0)
        scale = max(scale, self.min_size / min(width, height))
        new_w, new_h = self._apply_scale(width, height, scale)

        if new_w * new_h > self.max_pixels / img_num:
            scale = self.max_pixels / img_num / (new_w * new_h)
            new_w, new_h = self._apply_scale(new_w, new_h, scale)

        if max(new_w, new_h) > self.max_size:
            scale = self.max_size / max(new_w, new_h)
            new_w, new_h = self._apply_scale(new_w, new_h, scale)
        return new_w, new_h

    def __call__(self, img: Image.Image, img_num: int = 1) -> Image.Image:
        new_w, new_h = self.target_size(img.width, img.height, img_num)
        return img.resize((new_w, new_h), self.resample)


class ImageTransform:
    """resize -> HWC float32 in [-1, 1]."""

    def __init__(
        self,
        max_image_size: int,
        min_image_size: int,
        image_stride: int,
        max_pixels: int = 14 * 14 * 9 * 1024,
        image_mean=(0.5, 0.5, 0.5),
        image_std=(0.5, 0.5, 0.5),
    ):
        self.stride = image_stride
        self.resize_transform = MaxLongEdgeMinShortEdgeResize(
            max_size=max_image_size,
            min_size=min_image_size,
            stride=image_stride,
            max_pixels=max_pixels,
        )
        self.mean = np.asarray(image_mean, np.float32)
        self.std = np.asarray(image_std, np.float32)

    def __call__(self, img, img_num: int = 1) -> np.ndarray:
        if isinstance(img, np.ndarray):
            # already an HWC float array: just normalize dims to strides
            h = img.shape[0] // self.stride * self.stride
            w = img.shape[1] // self.stride * self.stride
            return img[:h, :w].astype(np.float32)
        img = self.resize_transform(img, img_num=img_num)
        arr = np.asarray(img, np.float32) / 255.0
        return (arr - self.mean) / self.std


def pil_img2rgb(image: Image.Image) -> Image.Image:
    """RGBA/transparency-aware RGB conversion (data_utils.py:118-127)."""
    if image.mode == "RGBA" or image.info.get("transparency", None) is not None:
        image = image.convert("RGBA")
        white = Image.new(mode="RGB", size=image.size, color=(255, 255, 255))
        white.paste(image, mask=image.split()[3])
        return white
    return image.convert("RGB")


def patchify_image(image: np.ndarray, patch_size: int) -> np.ndarray:
    """HWC image -> [num_patches, p*p*c] rows in (p, q, c) order
    (data_utils.py:43-50 layout parity)."""
    h, w, c = image.shape
    p = patch_size
    assert h % p == 0 and w % p == 0, (h, w, p)
    x = image.reshape(h // p, p, w // p, p, c).transpose(0, 2, 1, 3, 4)
    return x.reshape(-1, p * p * c)


def len2weight(x: int, loss_reduction: str = "square") -> float:
    """CE loss reweighting by split length (data_utils.py:168-177)."""
    if x == 0:
        return x
    if loss_reduction == "token":
        return 1.0
    if loss_reduction == "sample":
        return 1.0 / x
    if loss_reduction == "square":
        return 1.0 / (x**0.5)
    raise NotImplementedError(loss_reduction)
