"""ctypes bindings for the native ocpg_io decode library.

Compiles `ocpg_io.cpp` with the system g++ on first import (cached in
`native/_build/` keyed by a hash of the source + compile flags) and exposes

    decode_jpeg(data, denom=1)  -> (H, W, 3) uint8 RGB
    decode_png(data)            -> (H, W) uint8 palette-index/gray, or
                                   (H, W, 3) uint8 RGB
    available()                 -> bool

ctypes releases the GIL around every foreign call, so the thread-pool loader
(data/loader.py) scales decode across real cores with no worker processes —
the role torch DataLoader `num_workers` plays in the reference
(/root/reference/main.py:197-214).

If the toolchain or the codec dev libraries are missing the module degrades
to `available() == False` and callers (data/imageio.py) fall back to PIL.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ocpg_io.cpp")
_FLAGS = ["-O2", "-shared", "-fPIC", "-std=c++17", "-Wall"]
_LIBS = ["-ljpeg", "-lpng"]

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

OK, EBAD, ESIZE, EARG = 0, -1, -2, -3

_u8p = ctypes.POINTER(ctypes.c_ubyte)
_i32p = ctypes.POINTER(ctypes.c_int)


def _build() -> Optional[str]:
    with open(_SRC, "rb") as f:
        src = f.read()
    key = hashlib.sha256(src + " ".join(_FLAGS + _LIBS).encode()).hexdigest()[:16]
    out_dir = os.path.join(_HERE, "_build")
    so_path = os.path.join(out_dir, f"ocpg_io_{key}.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(out_dir, exist_ok=True)
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = ["g++", *_FLAGS, _SRC, "-o", tmp, *_LIBS]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    os.replace(tmp, so_path)  # atomic under concurrent builders
    return so_path


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("OCPG_NATIVE_IO", "auto") == "0":
            return None
        so_path = _build()
        if so_path is None:
            return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            return None
        lib.ocpg_jpeg_info.argtypes = [_u8p, ctypes.c_ulong, ctypes.c_int,
                                       _i32p, _i32p]
        lib.ocpg_decode_jpeg.argtypes = [_u8p, ctypes.c_ulong, ctypes.c_int,
                                         _u8p, ctypes.c_ulong, _i32p, _i32p]
        lib.ocpg_png_info.argtypes = [_u8p, ctypes.c_ulong, _i32p, _i32p, _i32p]
        lib.ocpg_png_is_palette.argtypes = [_u8p, ctypes.c_ulong]
        lib.ocpg_decode_png.argtypes = [_u8p, ctypes.c_ulong, _u8p,
                                        ctypes.c_ulong, _i32p, _i32p, _i32p]
        lib.ocpg_rle_encode.argtypes = [_u8p, ctypes.c_long,
                                        ctypes.c_char_p, ctypes.c_long,
                                        ctypes.POINTER(ctypes.c_long)]
        lib.ocpg_rle_decode.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                        ctypes.c_long, _u8p]
        for fn in (lib.ocpg_jpeg_info, lib.ocpg_decode_jpeg,
                   lib.ocpg_png_info, lib.ocpg_decode_png,
                   lib.ocpg_png_is_palette,
                   lib.ocpg_rle_encode, lib.ocpg_rle_decode):
            fn.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _as_u8p(data: bytes) -> Tuple[_u8p, int]:
    return (ctypes.cast(ctypes.c_char_p(data), _u8p), len(data))


def decode_jpeg(data: bytes, denom: int = 1) -> np.ndarray:
    """Decode a JPEG byte string to (H, W, 3) uint8 RGB.

    `denom` in {1, 2, 4, 8} requests libjpeg's DCT-domain prescale: the image
    is decoded at ~1/denom of full size for ~denom^2 less IDCT work.  denom=1
    (the default everywhere in the data path) matches a full PIL decode.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native ocpg_io unavailable")
    buf, n = _as_u8p(data)
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.ocpg_jpeg_info(buf, n, denom, ctypes.byref(h), ctypes.byref(w))
    if rc != OK:
        raise ValueError(f"bad JPEG stream (rc={rc})")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.ocpg_decode_jpeg(buf, n, denom,
                              out.ctypes.data_as(_u8p), out.nbytes,
                              ctypes.byref(h), ctypes.byref(w))
    if rc != OK:
        raise ValueError(f"JPEG decode failed (rc={rc})")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte string.

    Palette images return their palette INDICES as (H, W) uint8 — for
    DAVIS/YTVOS annotation masks the index IS the object id, so this skips
    PIL's P-image round-trip entirely.  Gray images return (H, W) uint8;
    truecolor returns (H, W, 3) uint8 (alpha stripped).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native ocpg_io unavailable")
    buf, n = _as_u8p(data)
    h, w, c = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    rc = lib.ocpg_png_info(buf, n, ctypes.byref(h), ctypes.byref(w),
                           ctypes.byref(c))
    if rc != OK:
        raise ValueError(f"bad PNG stream (rc={rc})")
    out = np.empty((h.value, w.value, c.value), np.uint8)
    rc = lib.ocpg_decode_png(buf, n, out.ctypes.data_as(_u8p), out.nbytes,
                             ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
    if rc != OK:
        raise ValueError(f"PNG decode failed (rc={rc})")
    return out[:, :, 0] if c.value == 1 else out


def png_is_palette(data: bytes) -> bool:
    """True if the PNG stream is palette-coded (decode_png then yields the
    palette INDICES, not colors — RGB readers must defer to a palette-aware
    decoder)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native ocpg_io unavailable")
    buf, n = _as_u8p(data)
    rc = lib.ocpg_png_is_palette(buf, n)
    if rc < 0:
        raise ValueError(f"bad PNG stream (rc={rc})")
    return bool(rc)


def rle_encode_str(mask: np.ndarray) -> str:
    """C-order (H, W) uint8 mask -> COCO compressed-RLE counts string.

    Byte-identical to evaluation/rle.py's pure-Python codec (the oracle);
    the native role pycocotools' mask.c plays in the reference."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native ocpg_io unavailable")
    # hand the C side the pixels already in column-major order: numpy's
    # blocked transpose copy beats a strided column walk in C
    flat = np.asfortranarray(np.asarray(mask, np.uint8)).reshape(-1, order="F")
    cap = 7 * flat.size + 16
    # np.empty, not ctypes.create_string_buffer: the latter zero-fills the
    # whole worst-case buffer on every call (~1 ms at DAVIS resolution)
    out = np.empty(cap, np.uint8)
    out_len = ctypes.c_long()
    rc = lib.ocpg_rle_encode(flat.ctypes.data_as(_u8p), flat.size,
                             out.ctypes.data_as(ctypes.c_char_p), cap,
                             ctypes.byref(out_len))
    if rc != OK:
        raise ValueError(f"RLE encode failed (rc={rc})")
    return out[:out_len.value].tobytes().decode("ascii")


def rle_decode_str(counts: str, h: int, w: int) -> np.ndarray:
    """COCO compressed-RLE counts string -> C-order (H, W) uint8 mask."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native ocpg_io unavailable")
    s = counts.encode("ascii") if isinstance(counts, str) else bytes(counts)
    flat = np.empty(h * w, np.uint8)
    rc = lib.ocpg_rle_decode(s, len(s), h * w, flat.ctypes.data_as(_u8p))
    if rc != OK:
        raise ValueError(f"RLE decode failed (rc={rc})")
    # same F-order view the numpy fallback returns (rle.py)
    return flat.reshape((h, w), order="F")
