"""ctypes bindings for the authored native runtime library.

The reference's hot host-side paths all run in *third-party* native code
(Pillow codecs/resampling, OpenSSL hashing via hashlib, sqlite-vec's scan —
SURVEY.md §2 native table). tpuclip authors its own where the work is hot:

- ``sha256_file`` / ``sha256_bytes`` — from-scratch SHA-256 (sha256.cc),
- ``binary_scan`` / ``dedup_champions`` / ``hamming_rows`` — packed-bit
  popcount ops (hamming.cc) behind the duplicate filter and the CPU binary
  search fallback,
- ``resize_batch`` — multithreaded PIL-algorithm bicubic resize (resize.cc)
  assembling the (B, S, S, 3) uint8 device batch in one call.

The library auto-builds with ``make`` on first use (g++ is a baked-in tool);
every entry point has a pure-Python/numpy fallback so the framework works
without a compiler. ``available()`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libtpuclip_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=str(_DIR), check=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, timeout=240,
        )
        return _LIB_PATH.exists()
    except Exception:  # noqa: BLE001
        return False


def lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if
    unavailable (no compiler / build failure / TPUCLIP_NO_NATIVE=1)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("TPUCLIP_NO_NATIVE") == "1":
            return None
        if not _LIB_PATH.exists() and not _build():
            return None
        try:
            l = ctypes.CDLL(str(_LIB_PATH))
            l.tpuclip_sha256_file.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
            l.tpuclip_sha256_file.restype = ctypes.c_int
            l.tpuclip_sha256.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p]
            l.tpuclip_binary_scan.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p,
            ]
            l.tpuclip_hamming_rows.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
                ctypes.c_void_p,
            ]
            l.tpuclip_dedup_champions.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
                ctypes.c_int32, ctypes.c_void_p,
            ]
            l.tpuclip_dedup_champions.restype = ctypes.c_int64
            l.tpuclip_resize_bicubic.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p,
            ]
            l.tpuclip_resize_batch.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ]
            _lib = l
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return lib() is not None


# =============================================================================
# SHA-256
# =============================================================================


def sha256_file(path: str) -> str:
    """Hex digest of a file — native if available, hashlib otherwise."""
    l = lib()
    if l is not None:
        out = ctypes.create_string_buffer(32)
        if l.tpuclip_sha256_file(os.fsencode(path), out) == 0:
            return out.raw.hex()
    from tpuclip.io.hashing import file_sha256

    return file_sha256(path)


def sha256_bytes(data: bytes) -> str:
    l = lib()
    if l is not None:
        out = ctypes.create_string_buffer(32)
        l.tpuclip_sha256(data, len(data), out)
        return out.raw.hex()
    import hashlib

    return hashlib.sha256(data).hexdigest()


# =============================================================================
# Packed-bit ops (rows are uint8-packed bits, np.packbits order; the word
# interpretation is internal — both sides of every comparison go through the
# same packing, so bit order cancels).
# =============================================================================


def _as_words(packed: np.ndarray) -> np.ndarray:
    """(n, bytes) packed uint8 → (n, words) uint64, zero-padded."""
    n, nbytes = packed.shape
    pad = (-nbytes) % 8
    if pad:
        packed = np.pad(packed, ((0, 0), (0, pad)))
    return np.ascontiguousarray(packed).view(np.uint64)


def hamming_rows(a_packed: np.ndarray, b_packed: np.ndarray) -> np.ndarray:
    """Row-wise Hamming distances between two (n, bytes) packed arrays."""
    l = lib()
    a = _as_words(np.atleast_2d(a_packed))
    b = _as_words(np.atleast_2d(b_packed))
    if l is None:
        from tpuclip.ops.hamming import hamming_distance_packed

        return hamming_distance_packed(np.atleast_2d(a_packed), np.atleast_2d(b_packed))
    n, words = a.shape
    out = np.empty((n,), np.uint32)
    l.tpuclip_hamming_rows(
        a.ctypes.data, b.ctypes.data, n, words, out.ctypes.data
    )
    return out.astype(np.int32)


def binary_scan(query_packed: np.ndarray, matrix_packed: np.ndarray, threads: int = 0) -> np.ndarray:
    """Match counts popcount(q & row) for every row (reference binary score,
    image_database.py:1621)."""
    l = lib()
    if l is None:
        q = np.unpackbits(query_packed)
        m = np.unpackbits(matrix_packed, axis=1)
        return (m @ q.astype(np.int32)).astype(np.int32)
    qw = _as_words(query_packed.reshape(1, -1))[0]
    mw = _as_words(matrix_packed)
    n, words = mw.shape
    out = np.empty((n,), np.int32)
    if threads <= 0:
        threads = min(16, os.cpu_count() or 1)
    l.tpuclip_binary_scan(
        np.ascontiguousarray(qw).ctypes.data, mw.ctypes.data, n, words, threads,
        out.ctypes.data,
    )
    return out


def dedup_champions(
    packed_rows: np.ndarray, similarities: np.ndarray, tolerance_bits: int
) -> np.ndarray:
    """Reference-compatible duplicate clustering (image_database.py:1278-1294):
    returns, per row, the index of its cluster's final (highest-similarity)
    champion."""
    l = lib()
    n = packed_rows.shape[0]
    if l is None or n == 0:
        # numpy fallback mirroring the same pass structure
        from tpuclip.ops.hamming import hamming_distance_packed

        champs: List[int] = []
        cluster_of = np.zeros(n, np.int64)
        for i in range(n):
            found = -1
            for ci, ch in enumerate(champs):
                if hamming_distance_packed(packed_rows[i], packed_rows[ch]) <= tolerance_bits:
                    found = ci
                    break
            if found < 0:
                cluster_of[i] = len(champs)
                champs.append(i)
            else:
                cluster_of[i] = found
                if similarities[i] > similarities[champs[found]]:
                    champs[found] = i
        return np.array([champs[c] for c in cluster_of], np.int64)
    words = _as_words(packed_rows)
    sims = np.ascontiguousarray(similarities, np.float32)
    out = np.empty((n,), np.int64)
    l.tpuclip_dedup_champions(
        words.ctypes.data, sims.ctypes.data, n, words.shape[1],
        tolerance_bits, out.ctypes.data,
    )
    return out


# =============================================================================
# Resize
# =============================================================================


def resize_bicubic(image_u8: np.ndarray, out_size: int) -> np.ndarray:
    """PIL-algorithm bicubic resize of one RGB uint8 (h, w, 3) image."""
    l = lib()
    if l is None:
        from PIL import Image

        from tpuclip.io.preprocess import resize_to_uint8

        return resize_to_uint8(Image.fromarray(image_u8), out_size)
    img = np.ascontiguousarray(image_u8, np.uint8)
    h, w, _ = img.shape
    out = np.empty((out_size, out_size, 3), np.uint8)
    l.tpuclip_resize_bicubic(img.ctypes.data, h, w, out_size, out.ctypes.data)
    return out


def resize_batch(images: List[np.ndarray], out_size: int, threads: int = 0) -> np.ndarray:
    """Resize a list of RGB uint8 arrays into one (n, S, S, 3) batch."""
    l = lib()
    n = len(images)
    out = np.zeros((n, out_size, out_size, 3), np.uint8)
    if l is None:
        for i, img in enumerate(images):
            out[i] = resize_bicubic(img, out_size)
        return out
    imgs = [np.ascontiguousarray(im, np.uint8) for im in images]
    ptrs = (ctypes.c_void_p * n)(*[im.ctypes.data for im in imgs])
    hs = np.array([im.shape[0] for im in imgs], np.int32)
    ws = np.array([im.shape[1] for im in imgs], np.int32)
    if threads <= 0:
        threads = min(16, os.cpu_count() or 1)
    l.tpuclip_resize_batch(
        ptrs, hs.ctypes.data, ws.ctypes.data, n, out_size, threads, out.ctypes.data
    )
    return out
