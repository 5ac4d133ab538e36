"""Native ocpg_io decode library: parity vs PIL, error paths, front door.

The native path must be a drop-in for `Image.open(...).convert("RGB"|"P")`
on the formats the datasets hold (reference readers:
/root/reference/datasets/ytvos.py:171-174, davis.py).  JPEG decode is
bit-exact against PIL on this host (both are libjpeg-family decoders); the
tests still allow |diff| <= 1 per channel so a different libjpeg build
cannot break CI, while palette-PNG indices must match exactly (they are
object ids).
"""

import io as bio

import numpy as np
import pytest
from PIL import Image

from ocpg_tpu.native import io as nio
from ocpg_tpu.data import imageio

pytestmark = pytest.mark.skipif(not nio.available(),
                                reason="native ocpg_io toolchain unavailable")


def _jpeg_bytes(img, quality=90, progressive=False):
    b = bio.BytesIO()
    Image.fromarray(img).save(b, "JPEG", quality=quality,
                              progressive=progressive)
    return b.getvalue()


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_jpeg_matches_pil(rng):
    img = rng.integers(0, 256, (120, 190, 3), np.uint8)
    data = _jpeg_bytes(img)
    nat = nio.decode_jpeg(data)
    pil = np.asarray(Image.open(bio.BytesIO(data)).convert("RGB"))
    assert nat.shape == pil.shape == (120, 190, 3)
    assert np.abs(nat.astype(int) - pil.astype(int)).max() <= 1


def test_jpeg_progressive_and_gray(rng):
    img = rng.integers(0, 256, (64, 80, 3), np.uint8)
    data = _jpeg_bytes(img, progressive=True)
    pil = np.asarray(Image.open(bio.BytesIO(data)).convert("RGB"))
    assert np.abs(nio.decode_jpeg(data).astype(int) - pil.astype(int)).max() <= 1

    gray = rng.integers(0, 256, (50, 70), np.uint8)
    b = bio.BytesIO()
    Image.fromarray(gray, mode="L").save(b, "JPEG", quality=95)
    nat = nio.decode_jpeg(b.getvalue())
    pil = np.asarray(Image.open(b).convert("RGB"))
    assert nat.shape == (50, 70, 3)
    assert np.abs(nat.astype(int) - pil.astype(int)).max() <= 1


def test_jpeg_dct_prescale(rng):
    # smooth gradient: DCT-domain prescale approximates an area downsample
    # only for band-limited content (noise fails by construction)
    yy, xx = np.mgrid[0:720, 0:1280]
    img = np.stack([(yy // 4) % 256, (xx // 4) % 256,
                    ((yy + xx) // 8) % 256], axis=-1).astype(np.uint8)
    data = _jpeg_bytes(img)
    half = nio.decode_jpeg(data, denom=2)
    assert half.shape == (360, 640, 3)
    # the prescaled decode is a real image, not garbage: close to an area
    # downsample of the full decode
    full = nio.decode_jpeg(data).astype(np.float32)
    ref = full.reshape(360, 2, 640, 2, 3).mean(axis=(1, 3))
    assert np.abs(half.astype(np.float32) - ref).mean() < 8.0
    # odd sizes round up like libjpeg says they do
    odd = _jpeg_bytes(rng.integers(0, 256, (101, 75, 3), np.uint8))
    assert nio.decode_jpeg(odd, denom=8).shape == (13, 10, 3)


def test_png_palette_exact(rng):
    idx = rng.integers(0, 7, (97, 133), np.uint8)
    pimg = Image.fromarray(idx, mode="P")
    pimg.putpalette(list(rng.integers(0, 256, 7 * 3)))
    b = bio.BytesIO()
    pimg.save(b, "PNG")
    nat = nio.decode_png(b.getvalue())
    pil = np.asarray(Image.open(bio.BytesIO(b.getvalue())).convert("P"))
    assert nat.dtype == np.uint8 and nat.shape == (97, 133)
    assert np.array_equal(nat, pil)


def test_png_palette_low_bitdepth(rng):
    # 2 colors -> PIL writes 1-bit palette rows; png_set_packing must unpack
    idx = rng.integers(0, 2, (40, 61), np.uint8)
    pimg = Image.fromarray(idx, mode="P")
    pimg.putpalette([0, 0, 0, 255, 255, 255])
    b = bio.BytesIO()
    pimg.save(b, "PNG", bits=1)
    nat = nio.decode_png(b.getvalue())
    pil = np.asarray(Image.open(bio.BytesIO(b.getvalue())).convert("P"))
    assert np.array_equal(nat, pil)


def test_png_gray_and_rgb(rng):
    gray = rng.integers(0, 256, (33, 47), np.uint8)
    b = bio.BytesIO()
    Image.fromarray(gray, mode="L").save(b, "PNG")
    assert np.array_equal(nio.decode_png(b.getvalue()), gray)

    rgb = rng.integers(0, 256, (21, 34, 3), np.uint8)
    b = bio.BytesIO()
    Image.fromarray(rgb).save(b, "PNG")
    assert np.array_equal(nio.decode_png(b.getvalue()), rgb)

    rgba = rng.integers(0, 256, (15, 18, 4), np.uint8)
    b = bio.BytesIO()
    Image.fromarray(rgba, mode="RGBA").save(b, "PNG")
    assert np.array_equal(nio.decode_png(b.getvalue()), rgba[:, :, :3])


def test_corrupt_streams_raise():
    with pytest.raises(ValueError):
        nio.decode_jpeg(b"\xff\xd8not a real jpeg")
    with pytest.raises(ValueError):
        nio.decode_png(b"\x89PNG\r\n\x1a\njunkjunkjunk")
    # truncated but well-started streams must error, not crash
    img = np.zeros((32, 32, 3), np.uint8)
    b = bio.BytesIO()
    Image.fromarray(img).save(b, "PNG")
    with pytest.raises(ValueError):
        nio.decode_png(b.getvalue()[: len(b.getvalue()) // 2])


def test_imageio_front_door(tmp_path, rng):
    img = rng.integers(0, 256, (60, 90, 3), np.uint8)
    jpg = tmp_path / "f.jpg"
    Image.fromarray(img).save(jpg, quality=92)
    out = imageio.read_rgb(jpg)
    pil = np.asarray(Image.open(jpg).convert("RGB"))
    assert np.abs(out.astype(int) - pil.astype(int)).max() <= 1

    idx = rng.integers(0, 4, (44, 52), np.uint8)
    png = tmp_path / "m.png"
    pimg = Image.fromarray(idx, mode="P")
    pimg.putpalette(list(range(12)))
    pimg.save(png)
    assert np.array_equal(imageio.read_palette(png), idx)

    # PNG frames read through read_rgb (JHMDB Rename_Images are PNG)
    rgbp = tmp_path / "f.png"
    Image.fromarray(img).save(rgbp)
    assert np.array_equal(imageio.read_rgb(rgbp), img)
    # gray png promotes to 3 channels
    Image.fromarray(img[:, :, 0], mode="L").save(rgbp)
    assert np.array_equal(imageio.read_rgb(rgbp),
                          np.repeat(img[:, :, :1], 3, axis=2))


def test_front_door_env_disable(tmp_path, rng, monkeypatch):
    img = rng.integers(0, 256, (20, 30, 3), np.uint8)
    jpg = tmp_path / "f.jpg"
    Image.fromarray(img).save(jpg, quality=92)
    ref = imageio.read_rgb(jpg)
    monkeypatch.setenv("OCPG_NATIVE_IO", "0")
    assert np.array_equal(imageio.read_rgb(jpg), ref)


# ---- native COCO RLE codec (the role pycocotools' C mask.c plays in the
# reference; /root/reference/models/postprocessors.py:47) ----------------

def _py_rle_encode(mask):
    """The pure-numpy oracle (evaluation/rle.py's fallback path, inlined so
    the test pins the oracle even while rle.py routes through the native
    codec)."""
    from ocpg_tpu.evaluation.rle import _compress
    h, w = mask.shape
    flat = np.asfortranarray(mask > 0).reshape(-1, order="F").astype(np.uint8)
    diffs = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    boundaries = np.concatenate([[0], diffs, [flat.size]])
    counts = np.diff(boundaries).tolist()
    if flat.size and flat[0] == 1:
        counts = [0] + counts
    return {"size": [int(h), int(w)], "counts": _compress(counts)}


def test_rle_native_byte_identical(rng):
    yy, xx = np.mgrid[:61, :83]
    cases = [
        np.zeros((7, 5), np.uint8),
        np.ones((7, 5), np.uint8),
        np.array([[1]], np.uint8),
        (rng.random((61, 83)) > 0.5).astype(np.uint8),       # worst case
        (rng.random((61, 83)) > 0.97).astype(np.uint8),
        (((yy - 30) ** 2 + (xx - 40) ** 2) < 20 ** 2).astype(np.uint8),
        (rng.random((33, 47)) > 0.7).astype(np.uint8) * 255,  # non-binary fg
    ]
    for i, m in enumerate(cases):
        oracle = _py_rle_encode(m)
        assert nio.rle_encode_str(m) == oracle["counts"], i
        got = nio.rle_decode_str(oracle["counts"], *m.shape)
        np.testing.assert_array_equal(got, (m > 0).astype(np.uint8), str(i))


def test_rle_module_roundtrip_uses_native(rng):
    from ocpg_tpu.evaluation.rle import rle_decode, rle_encode
    m = (rng.random((48, 64)) > 0.8).astype(np.uint8)
    e = rle_encode(m)
    assert e == _py_rle_encode(m)
    np.testing.assert_array_equal(rle_decode(e), m)


def test_rle_native_rejects_malformed():
    with pytest.raises(ValueError):
        nio.rle_decode_str("[", 4, 4)            # truncated continuation
    with pytest.raises(ValueError):
        nio.rle_decode_str("d", 4, 4)            # counts don't sum to h*w


def test_read_rgb_palette_png_maps_through_palette(tmp_path, rng):
    """A palette PNG through read_rgb must yield palette COLORS, not indices
    repeated as gray (regression: the native decode returns indices, which
    read_rgb must route through a palette-aware decoder)."""
    idx = rng.integers(0, 4, (30, 40), np.uint8)
    pimg = Image.fromarray(idx, mode="P")
    # a palette where color != index so the bug cannot pass by accident
    pimg.putpalette([200, 10, 30,  0, 250, 60,  5, 5, 220,  120, 120, 0])
    png = tmp_path / "pal.png"
    pimg.save(png)
    expected = np.asarray(Image.open(png).convert("RGB"))
    assert np.array_equal(imageio.read_rgb(png), expected)
    if nio.available():
        with open(png, "rb") as f:
            assert nio.png_is_palette(f.read()) is True
