"""Native image IO (ctypes wrapper over native/libfastio.so) with PIL
fallback.

The host side of the pipeline is codec-bound on small hosts; libfastio
decodes PNG/JPEG straight into packed RGB and writes masks as
filter-NONE/level-1 PNGs, bypassing PIL's conversion layers. If the shared
library is missing it is built on first use (g++ + libpng/libjpeg, see
native/Makefile); if that fails every entry point silently falls back to
PIL so the framework stays pure-Python-runnable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libfastio.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and (_NATIVE_DIR / "Makefile").exists():
            try:
                subprocess.run(["make", "-C", str(_NATIVE_DIR)],
                               capture_output=True, timeout=120, check=True)
            except Exception:
                return None
        if not _LIB_PATH.exists():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        ip = ctypes.POINTER(ctypes.c_int)
        for name, args in [
            ("decode_png_rgb", [ctypes.c_char_p, ip, ip, u8p]),
            ("decode_jpeg_rgb", [ctypes.c_char_p, ip, ip, u8p]),
            ("encode_png_gray",
             [ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]),
            ("encode_png_rgb",
             [ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]),
        ]:
            fn = getattr(lib, name)
            fn.argtypes = args
            fn.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _pil_decode(path: str) -> np.ndarray:
    from PIL import Image

    im = Image.open(path)
    if im.mode in ("I;16", "I;16B", "I;16L", "I"):
        # PIL's I->RGB convert CLIPS >255 to white; the reference decodes
        # 16-bit images through cv2.imread, which keeps the high byte
        # (so does the native libpng path via png_set_strip_16) — match.
        a = np.asarray(im, dtype=np.uint32)
        im = Image.fromarray((a >> 8).astype(np.uint8))
    return np.array(im.convert("RGB"))


def decode_rgb(path) -> np.ndarray:
    """Decode a PNG/JPEG file to (H, W, 3) uint8 RGB."""
    path = str(path)
    lib = _load()
    suffix = os.path.splitext(path)[1].lower()
    if lib is None or suffix not in (".png", ".jpg", ".jpeg"):
        return _pil_decode(path)
    fn = lib.decode_png_rgb if suffix == ".png" else lib.decode_jpeg_rgb
    w = ctypes.c_int()
    h = ctypes.c_int()
    pathb = path.encode()
    if fn(pathb, ctypes.byref(w), ctypes.byref(h), None) != 0:
        return _pil_decode(path)
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = fn(pathb, ctypes.byref(w), ctypes.byref(h),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc != 0:
        return _pil_decode(path)
    return out


def encode_png_gray(path, img: np.ndarray, level: int = 1) -> None:
    """Write an (H, W) uint8 array as a grayscale PNG (fast settings)."""
    img = np.ascontiguousarray(img, np.uint8)
    lib = _load()
    if lib is None:
        from PIL import Image

        Image.fromarray(img).save(str(path), compress_level=level)
        return
    rc = lib.encode_png_gray(
        str(path).encode(),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        img.shape[0], img.shape[1], level)
    if rc != 0:
        from PIL import Image

        Image.fromarray(img).save(str(path), compress_level=level)


def encode_png_rgb(path, img: np.ndarray, level: int = 1) -> None:
    """Write an (H, W, 3) uint8 array as an RGB PNG (fast settings)."""
    img = np.ascontiguousarray(img, np.uint8)
    lib = _load()
    if lib is None:
        from PIL import Image

        Image.fromarray(img).save(str(path), compress_level=level)
        return
    rc = lib.encode_png_rgb(
        str(path).encode(),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        img.shape[0], img.shape[1], level)
    if rc != 0:
        from PIL import Image

        Image.fromarray(img).save(str(path), compress_level=level)
