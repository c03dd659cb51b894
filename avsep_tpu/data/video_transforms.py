"""Temporally-consistent video frame transforms (numpy/PIL, NHWC output).

Equivalent of reference ``dataset/video_transforms.py``: each transform
applies ONE random draw to the whole list of frames so a clip stays
temporally consistent.  Output is a float32 [T, H, W, 3] array, ImageNet-
normalized (the reference stacks to C x T x H x W; we keep TPU-native
channels-last).
"""

from __future__ import annotations

import random
from typing import List, Sequence

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def resize_shorter_dims(w: int, h: int, size: int):
    """Target dims for shorter-side-to-``size`` resize.  Shared by the PIL
    path below and the native decode path (dataset._native_frames) so both
    produce identical geometry."""
    if w < h:
        return size, int(round(size * h / w))
    return int(round(size * w / h)), size


def resize_shorter(frames: List[Image.Image], size: int) -> List[Image.Image]:
    """Resize shorter side to ``size`` (bicubic), like torchvision Resize
    with an int argument (reference base.py:100,104)."""
    out = []
    for img in frames:
        nw, nh = resize_shorter_dims(*img.size, size)
        out.append(img.resize((nw, nh), Image.BICUBIC))
    return out


def pad_img(frames: List[Image.Image], pad: int, size: int,
            mode: str = "constant") -> List[Image.Image]:
    """Pad each frame to at least ``size`` (reference
    video_transforms.PadImg, :27-45; used by the demo's vis_aug)."""
    out = []
    for img in frames:
        w, h = img.size
        if w >= size and h >= size:
            out.append(img)
            continue
        nw, nh = max(w + 2 * pad, size), max(h + 2 * pad, size)
        canvas = Image.new("RGB", (nw, nh), (0, 0, 0))
        canvas.paste(img, ((nw - w) // 2, (nh - h) // 2))
        out.append(canvas)
    return out


def center_crop(frames: List[Image.Image], size: int) -> List[Image.Image]:
    out = []
    for img in frames:
        w, h = img.size
        left = int(round((w - size) / 2.0))
        top = int(round((h - size) / 2.0))
        out.append(img.crop((left, top, left + size, top + size)))
    return out


def random_crop(frames: List[Image.Image], size: int,
                rng: random.Random) -> List[Image.Image]:
    """One crop position for the whole clip (reference
    video_transforms.py:68-123: get_params drawn once)."""
    w, h = frames[0].size
    if w == size and h == size:
        return frames
    left = rng.randint(0, max(w - size, 0))
    top = rng.randint(0, max(h - size, 0))
    return [img.crop((left, top, left + size, top + size)) for img in frames]


def rrc_params(w: int, h: int, rng: random.Random,
               scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """RandomResizedCrop parameter draw (one draw per clip).  Returns
    (left, top, cw, ch) or None for the 10-attempt fallback (center crop
    of min(w, h)).  Split out so the native decode path consumes the SAME
    rng sequence as the PIL path."""
    import math
    area = w * h
    for _ in range(10):
        target = rng.uniform(*scale) * area
        log_r = (math.log(ratio[0]), math.log(ratio[1]))
        ar = math.exp(rng.uniform(*log_r))
        cw = int(round(math.sqrt(target * ar)))
        ch = int(round(math.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            left = rng.randint(0, w - cw)
            top = rng.randint(0, h - ch)
            return left, top, cw, ch
    return None


def center_crop_box(w: int, h: int, size: int):
    """(left, top) of a PIL-convention center crop (see center_crop)."""
    return int(round((w - size) / 2.0)), int(round((h - size) / 2.0))


def random_resized_crop(frames: List[Image.Image], size: int,
                        rng: random.Random,
                        scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)
                        ) -> List[Image.Image]:
    """torchvision/mmaction-style RandomResizedCrop with one draw for the
    whole clip (used by the clip pipeline, reference dataset/music.py:181)."""
    w, h = frames[0].size
    p = rrc_params(w, h, rng, scale, ratio)
    if p is None:  # fallback: center crop
        return [img.resize((size, size), Image.BICUBIC)
                for img in center_crop(frames, min(w, h))]
    left, top, cw, ch = p
    return [img.crop((left, top, left + cw, top + ch))
            .resize((size, size), Image.BICUBIC) for img in frames]


def random_hflip(frames: List[Image.Image],
                 rng: random.Random) -> List[Image.Image]:
    """One coin for the whole clip (reference video_transforms.py:126-152)."""
    if rng.random() < 0.5:
        return [img.transpose(Image.FLIP_LEFT_RIGHT) for img in frames]
    return frames


def to_normalized_array(frames: Sequence[Image.Image]) -> np.ndarray:
    """PIL list -> [T, H, W, 3] float32, /255 then ImageNet-normalized
    (reference video_transforms.py:155-203)."""
    arrs = [np.asarray(img.convert("RGB"), np.float32) / 255.0
            for img in frames]
    x = np.stack(arrs)  # T, H, W, 3
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def to_uint8_array(frames: Sequence[Image.Image]) -> np.ndarray:
    """PIL list -> [T, H, W, 3] uint8 'wire format': normalization is
    deferred to the device (``engine.normalize_frames``).  4x fewer
    host->device bytes than float32 and no per-pixel float math on the
    loader CPUs — the TPU does the /255-mean-std inside the jit program."""
    return np.stack([np.asarray(img.convert("RGB"), np.uint8)
                     for img in frames])


def train_transform(frames: List[Image.Image], img_size: int,
                    rng: random.Random, normalize: bool = True) -> np.ndarray:
    """Resize(1.1x) -> RandomCrop -> RandomHFlip -> normalize
    (reference dataset/base.py:99-110).  With ``normalize=False`` the
    output is uint8 and normalization happens on device."""
    frames = resize_shorter(frames, int(img_size * 1.1))
    frames = random_crop(frames, img_size, rng)
    frames = random_hflip(frames, rng)
    return to_normalized_array(frames) if normalize \
        else to_uint8_array(frames)


def val_transform(frames: List[Image.Image], img_size: int,
                  normalize: bool = True) -> np.ndarray:
    """Resize -> CenterCrop -> normalize (reference dataset/base.py:103-106)."""
    frames = resize_shorter(frames, img_size)
    frames = center_crop(frames, img_size)
    return to_normalized_array(frames) if normalize \
        else to_uint8_array(frames)


def denormalize(frame: np.ndarray) -> np.ndarray:
    """[H, W, 3] normalized -> uint8 RGB (reference utils.recover_rgb).
    uint8 wire-format frames are already RGB and pass through."""
    if frame.dtype == np.uint8:
        return frame
    x = frame * IMAGENET_STD + IMAGENET_MEAN
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)
