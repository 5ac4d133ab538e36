"""Image decode front door for the data path: native ocpg_io with PIL fallback.

`read_rgb(path)` and `read_palette(path)` are drop-in equivalents of
`np.asarray(Image.open(path).convert("RGB"|"P"))` for the formats the
datasets actually hold (JPEG frames, palette-PNG annotation masks — see
/root/reference/datasets/ytvos.py:171-174).  The native path (ocpg_tpu.native.io,
libjpeg/libpng via ctypes) is bit-exact with PIL on those formats and
releases the GIL for the whole decode, so the thread-pool loader scales with
host cores; anything the native decoder does not cover (exotic color types,
missing toolchain, OCPG_NATIVE_IO=0) silently routes to PIL.
"""

from __future__ import annotations

import os
from typing import Union

import numpy as np

try:
    from ..native import io as _native
except Exception:  # pragma: no cover - import error == no native path
    _native = None


def _use_native() -> bool:
    return (_native is not None
            and os.environ.get("OCPG_NATIVE_IO", "auto") != "0"
            and _native.available())


def _read_bytes(path) -> bytes:
    with open(path, "rb") as f:
        return f.read()


def read_rgb(path: Union[str, "os.PathLike"]) -> np.ndarray:
    """(H, W, 3) uint8 RGB — `Image.open(path).convert("RGB")` equivalent."""
    if _use_native():
        data = _read_bytes(path)
        try:
            if data[:2] == b"\xff\xd8":          # JPEG magic
                return _native.decode_jpeg(data)
            if (data[:8] == b"\x89PNG\r\n\x1a\n"
                    and not _native.png_is_palette(data)):
                # palette PNGs defer to PIL: the native decode yields indices,
                # which only mean colors through the palette table
                out = _native.decode_png(data)
                if out.ndim == 3:
                    return out
                return np.repeat(out[:, :, None], 3, axis=2)  # gray -> RGB
        except ValueError:
            pass  # corrupt-for-us stream: let PIL try (and raise its error)
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def read_palette(path: Union[str, "os.PathLike"]) -> np.ndarray:
    """(H, W) uint8 palette indices — `Image.open(path).convert("P")`
    equivalent for palette/gray PNGs (annotation masks: index == object id)."""
    if _use_native():
        data = _read_bytes(path)
        try:
            if data[:8] == b"\x89PNG\r\n\x1a\n":
                out = _native.decode_png(data)
                if out.ndim == 2:   # palette indices or gray — what callers want
                    return out
                # truecolor PNG: PIL's convert("P") quantizes; defer to it
        except ValueError:
            pass
    from PIL import Image

    return np.asarray(Image.open(path).convert("P"))
