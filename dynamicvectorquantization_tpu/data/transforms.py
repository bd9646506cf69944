"""Host-side image transforms (PIL + numpy), matching the reference's
torchvision pipelines.

Reference transforms:
  * ImageNet train: Resize(shorter side -> size) + RandomCrop(size) + HFlip;
    val: Resize + CenterCrop; then Normalize(0.5, 0.5) -> [-1, 1]
    (`data/imagenet_base.py:16-32`).
  * FFHQ train: RandomResizedCrop(scale 0.75-1.0, ratio 1.0) + HFlip
    (`data/faceshq.py:29-101`).

Output: HWC float32 in [-1, 1].
"""
from __future__ import annotations

import numpy as np
from PIL import Image


def _to_array(img: Image.Image) -> np.ndarray:
    arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    return arr * 2.0 - 1.0


def resize_shorter(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    if w < h:
        nw, nh = size, max(size, int(round(h * size / w)))
    else:
        nw, nh = max(size, int(round(w * size / h))), size
    return img.resize((nw, nh), Image.BILINEAR)


def center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    left = (w - size) // 2
    top = (h - size) // 2
    return img.crop((left, top, left + size, top + size))


def random_crop(img: Image.Image, size: int, rng: np.random.Generator) -> Image.Image:
    w, h = img.size
    left = int(rng.integers(0, max(w - size, 0) + 1))
    top = int(rng.integers(0, max(h - size, 0) + 1))
    return img.crop((left, top, left + size, top + size))


def random_resized_crop(
    img: Image.Image,
    size: int,
    rng: np.random.Generator,
    scale=(0.75, 1.0),
    ratio=(1.0, 1.0),
) -> Image.Image:
    w, h = img.size
    area = w * h
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1])))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if cw <= w and ch <= h:
            left = int(rng.integers(0, w - cw + 1))
            top = int(rng.integers(0, h - ch + 1))
            img2 = img.crop((left, top, left + cw, top + ch))
            return img2.resize((size, size), Image.BILINEAR)
    return center_crop(resize_shorter(img, size), size)


def imagenet_train_transform(img, size, rng):
    img = resize_shorter(img, size)
    img = random_crop(img, size, rng)
    if rng.uniform() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    return _to_array(img)


def imagenet_val_transform(img, size, rng=None):
    img = resize_shorter(img, size)
    img = center_crop(img, size)
    return _to_array(img)


def ffhq_train_transform(img, size, rng):
    img = random_resized_crop(img, size, rng)
    if rng.uniform() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    return _to_array(img)


def ffhq_val_transform(img, size, rng=None):
    return _to_array(img.resize((size, size), Image.BILINEAR))
