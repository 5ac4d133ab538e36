"""Clip-joint video transforms (host-side numpy/cv2).

Reference: /root/reference/datasets/transforms_video.py — all ops act jointly
on frames + boxes + masks + weak_masks + weights:
  * RandomResize(scales, max_size) — shorter side to scale, cap longer side
  * RandomSizeCrop — random crop, boxes clamped, `Check` recomputes per-frame
    validity afterwards (:19-55)
  * RandomHorizontalFlip — flips pixels/boxes and swaps "left"<->"right" in
    the caption (:576-586)
  * PhotometricDistort — brightness/contrast/saturation/hue jitter
  * Normalize — ImageNet mean/std, boxes -> normalized cxcywh (:653-675)

The train recipe mirrors `make_coco_transforms` (`datasets/ytvos.py:250-285`):
RandomSelect(resize | resize+crop+resize) -> hflip -> normalize.

TPU addition: `pad_to_canvas` pads every clip to a fixed /32-aligned canvas
(static shapes for XLA) and records the pad mask — the NestedTensor
equivalent (`util/misc.py:354-379`).
"""

from __future__ import annotations

import dataclasses
import random
from typing import Dict, List, Optional, Tuple

import numpy as np
import cv2

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

TRAIN_SCALES = [288, 320, 352, 392, 416, 448, 480, 512]


@dataclasses.dataclass
class Clip:
    """Mutable clip record passing through the transform pipeline.

    frames: (T, H, W, 3) uint8 or float; boxes: (T, 4) absolute xyxy;
    masks/weak_masks/weights: (T, H, W) float; valid: (T,); caption: str.
    """
    frames: np.ndarray
    boxes: np.ndarray
    masks: np.ndarray
    weak_masks: np.ndarray
    weights: np.ndarray
    valid: np.ndarray
    labels: np.ndarray
    caption: str

    @property
    def size(self) -> Tuple[int, int]:
        return self.frames.shape[1], self.frames.shape[2]


def _resize_clip(clip: Clip, size: Tuple[int, int]) -> Clip:
    h, w = clip.size
    oh, ow = size
    if (oh, ow) == (h, w):
        return clip

    def rs(x, interp):
        return np.stack([cv2.resize(f, (ow, oh), interpolation=interp) for f in x])

    clip.frames = rs(clip.frames, cv2.INTER_LINEAR)
    clip.masks = rs(clip.masks, cv2.INTER_NEAREST)
    clip.weak_masks = rs(clip.weak_masks, cv2.INTER_NEAREST)
    clip.weights = rs(clip.weights, cv2.INTER_LINEAR)
    sx, sy = ow / w, oh / h
    clip.boxes = clip.boxes * np.array([sx, sy, sx, sy], np.float32)
    return clip


def _target_size(h: int, w: int, size: int, max_size: Optional[int]) -> Tuple[int, int]:
    """torchvision-style shorter-side resize with longer-side cap."""
    short, long = (h, w) if h < w else (w, h)
    if max_size is not None and size / short * long > max_size:
        size = int(round(max_size * short / long))
    if h < w:
        oh, ow = size, int(round(size * w / h))
    else:
        ow, oh = size, int(round(size * h / w))
    return oh, ow


def random_resize(clip: Clip, scales: List[int], max_size: Optional[int] = None,
                  rng: Optional[random.Random] = None) -> Clip:
    rng = rng or random
    size = rng.choice(scales)
    return _resize_clip(clip, _target_size(*clip.size, size, max_size))


def random_size_crop(clip: Clip, min_size: int, max_size: int,
                     rng: Optional[random.Random] = None) -> Clip:
    rng = rng or random
    h, w = clip.size
    cw = rng.randint(min_size, min(w, max_size))
    ch = rng.randint(min_size, min(h, max_size))
    y0 = rng.randint(0, h - ch)
    x0 = rng.randint(0, w - cw)

    clip.frames = clip.frames[:, y0:y0 + ch, x0:x0 + cw]
    clip.masks = clip.masks[:, y0:y0 + ch, x0:x0 + cw]
    clip.weak_masks = clip.weak_masks[:, y0:y0 + ch, x0:x0 + cw]
    clip.weights = clip.weights[:, y0:y0 + ch, x0:x0 + cw]
    boxes = clip.boxes - np.array([x0, y0, x0, y0], np.float32)
    boxes[:, 0::2] = boxes[:, 0::2].clip(0, cw)
    boxes[:, 1::2] = boxes[:, 1::2].clip(0, ch)
    clip.boxes = boxes
    return check_validity(clip)


def check_validity(clip: Clip) -> Clip:
    """Recompute per-frame `valid` after spatial edits (transforms_video.py:19-55)."""
    area = (clip.boxes[:, 2] - clip.boxes[:, 0]) * (clip.boxes[:, 3] - clip.boxes[:, 1])
    has_mask = clip.masks.reshape(clip.masks.shape[0], -1).sum(-1) > 0
    clip.valid = ((area > 0) & has_mask).astype(np.int32)
    return clip


def random_hflip(clip: Clip, p: float = 0.5, rng: Optional[random.Random] = None) -> Clip:
    rng = rng or random
    if rng.random() >= p:
        return clip
    h, w = clip.size
    clip.frames = clip.frames[:, :, ::-1].copy()
    clip.masks = clip.masks[:, :, ::-1].copy()
    clip.weak_masks = clip.weak_masks[:, :, ::-1].copy()
    clip.weights = clip.weights[:, :, ::-1].copy()
    b = clip.boxes.copy()
    b[:, 0], b[:, 2] = w - clip.boxes[:, 2], w - clip.boxes[:, 0]
    clip.boxes = b
    # caption left <-> right (transforms_video.py:576-586)
    clip.caption = (
        clip.caption.replace("left", "@").replace("right", "left").replace("@", "right")
    )
    return clip


def photometric_distort(clip: Clip, rng: Optional[random.Random] = None) -> Clip:
    rng = rng or random
    img = clip.frames.astype(np.float32)
    if rng.random() < 0.5:
        img += rng.uniform(-32, 32)
    if rng.random() < 0.5:
        img *= rng.uniform(0.5, 1.5)
    img = img.clip(0, 255)
    if rng.random() < 0.5:
        hsv = np.stack([cv2.cvtColor(f.astype(np.uint8), cv2.COLOR_RGB2HSV) for f in img]).astype(np.float32)
        hsv[..., 1] *= rng.uniform(0.5, 1.5)
        hsv[..., 0] += rng.uniform(-18, 18)
        hsv[..., 0] %= 180
        hsv = hsv.clip(0, 255).astype(np.uint8)
        img = np.stack([cv2.cvtColor(f, cv2.COLOR_HSV2RGB) for f in hsv]).astype(np.float32)
    clip.frames = img
    return clip


def normalize(clip: Clip, images: bool = True) -> Clip:
    """to float [0,1], ImageNet normalize; boxes -> normalized cxcywh.

    ``images=False`` leaves frames in 0..255 (the compact uint8 wire format
    — ImageNet normalization then happens ON DEVICE in the jitted step, see
    loader.decompress_batch; 4x less host->device traffic per batch)."""
    if images:
        img = clip.frames.astype(np.float32)
        if img.max() > 2.0:
            img = img / 255.0
        clip.frames = (img - IMAGENET_MEAN) / IMAGENET_STD
    h, w = clip.size
    b = clip.boxes.astype(np.float32)
    cx = (b[:, 0] + b[:, 2]) / 2 / w
    cy = (b[:, 1] + b[:, 3]) / 2 / h
    bw = (b[:, 2] - b[:, 0]) / w
    bh = (b[:, 3] - b[:, 1]) / h
    clip.boxes = np.stack([cx, cy, bw, bh], -1)
    return clip


def train_transform(clip: Clip, max_size: int = 640,
                    rng: Optional[random.Random] = None,
                    photometric: bool = False,
                    normalize_images: bool = True) -> Clip:
    """make_coco_transforms 'train' branch (ytvos.py:257-276)."""
    rng = rng or random
    if rng.random() < 0.5:
        clip = random_resize(clip, TRAIN_SCALES, max_size, rng)
        clip = check_validity(clip)
    else:
        clip = random_resize(clip, [400, 500, 600], None, rng)
        clip = random_size_crop(clip, 384, 600, rng)
        clip = random_resize(clip, TRAIN_SCALES, max_size, rng)
        clip = check_validity(clip)
    clip = random_hflip(clip, 0.5, rng)
    if photometric:
        clip = photometric_distort(clip, rng)
    return normalize(clip, images=normalize_images)


def val_transform(clip: Clip, size: int = 360, max_size: int = 640,
                  normalize_images: bool = True) -> Clip:
    clip = _resize_clip(clip, _target_size(*clip.size, size, max_size))
    return normalize(clip, images=normalize_images)


def pad_to_canvas(clip: Clip, canvas: Tuple[int, int],
                  compact: bool = False) -> Dict[str, np.ndarray]:
    """Pad to a fixed (H, W) canvas (bottom/right) and emit the batch dict entry.

    ``compact=True`` emits the compact wire format (see
    loader.decompress_batch): frames as un-normalized uint8 RGB, binary
    masks/weak_masks as uint8, soft heatmaps as float16 — ~3x fewer
    host->device bytes per batch.  Exact for the binary maps; frames lose
    <=0.5/255 to rounding of interpolated pixels (below JPEG noise);
    heatmap f16 quantization is ~5e-4 relative.
    """
    h, w = clip.size
    ch, cw = canvas
    assert h <= ch and w <= cw, (h, w, canvas)
    t = clip.frames.shape[0]

    def pad(x, dtype=np.float32):
        out = np.zeros((t, ch, cw) + x.shape[3:], dtype=dtype)
        out[:, :h, :w] = x
        return out

    mask = np.ones((t, ch, cw), bool)
    mask[:, :h, :w] = False
    if compact:
        frames = pad(np.rint(np.clip(clip.frames, 0, 255)), np.uint8)
        masks = pad(clip.masks, np.uint8)
        weights = pad(clip.weights, np.float16)
        weak = pad(clip.weak_masks, np.uint8)
    else:
        frames = pad(clip.frames)
        masks = pad(clip.masks)
        weights = pad(clip.weights)
        weak = pad(clip.weak_masks)
    return {
        "samples": frames,
        "samples_mask": mask,
        "targets": {
            "labels": clip.labels.astype(np.int32),
            "boxes": clip.boxes.astype(np.float32),
            "valid": clip.valid.astype(np.int32),
            "masks": masks,
            "weights": weights,
            "weak_masks": weak,
            "size": np.array([h, w], np.int32),
        },
        "caption": clip.caption,
    }


def canvas_for(max_size: int = 640, divisor: int = 32) -> Tuple[int, int]:
    """One fixed canvas covering every train/val scale (<=512 short, <=640 long)."""
    side = ((max_size + divisor - 1) // divisor) * divisor
    short = ((512 + divisor - 1) // divisor) * divisor
    return short, side
