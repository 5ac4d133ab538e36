"""Overlay helpers (utils/visualize.py) — the --visualize port.

Reference semantics: inference_ytvos.py:266-296 (vis_add_mask 50/50 blend,
reference-point crosses, sample-point dots); the snapshot defines but never
calls them, so these tests pin the restored behavior analytically.
"""
import numpy as np
from PIL import Image, ImageDraw

from ocpg_tpu.utils.visualize import (
    COLORS,
    draw_reference_points,
    draw_sample_points,
    save_overlay,
    vis_add_mask,
)


def test_vis_add_mask_blend_math():
    img = np.full((4, 6, 3), 200, np.uint8)
    mask = np.zeros((4, 6), np.float32)
    mask[1:3, 2:5] = 1.0
    out = vis_add_mask(img, mask, (0, 100, 255))
    # outside: untouched; inside: int(0.5*img + 0.5*color)
    np.testing.assert_array_equal(out[0, 0], [200, 200, 200])
    np.testing.assert_array_equal(out[1, 2], [100, 150, 227])
    assert out.dtype == np.uint8
    # input not mutated
    assert img[1, 2, 0] == 200


def test_draw_helpers_mark_pixels():
    img = Image.new("RGB", (64, 48), (0, 0, 0))
    draw = ImageDraw.Draw(img)
    draw_reference_points(draw, [(0.5, 0.5)], img.size, (255, 0, 0))
    arr = np.asarray(img)
    assert (arr[:, :, 0] == 255).any()          # cross drawn
    draw_sample_points(draw, [[(10, 10), (12, 10)]], img.size, COLORS)
    arr2 = np.asarray(img)
    assert (arr2 != arr).any() or (arr2[10, 10] != 0).any()


def test_save_overlay_writes_png(tmp_path):
    frame = np.random.default_rng(0).integers(0, 255, (32, 40, 3)).astype(np.uint8)
    mask = np.zeros((32, 40), np.float32)
    mask[8:20, 10:30] = 1.0
    p = tmp_path / "overlay.png"
    save_overlay(p, frame, mask, COLORS[0], ref_point_norm=(0.4, 0.6))
    img = Image.open(p)
    assert img.mode == "RGB" and img.size == (40, 32)
