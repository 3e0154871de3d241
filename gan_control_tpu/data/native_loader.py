"""ctypes bridge to the native C++ data loader (native/gcdata.cpp).

The native backend replaces the reference's torch-DataLoader worker pool
(ffhq_dataset.py 'workers': 32) with a C++ thread pool doing JPEG/PNG
decode + random-resized-crop + bilinear resize + flip + [-1,1] normalization,
handing ready NHWC float32 batches to ``jax.device_put``. Falls back
gracefully when the .so has not been built (``make -C native``).

NOTE on resize parity: the native resampler is torch
F.interpolate-style 4-tap bilinear (tested against a torch oracle);
the Python fallback uses PIL BILINEAR, which antialiases on
downscale — for large downscales (1024 -> 256) the two backends
produce different pixel statistics. Pick one backend per run.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

from gan_control_tpu.utils.logging_utils import get_logger

_log = get_logger(__name__)

# Minimum native ABI this bridge understands (3 = per-batch failed counts
# via gc_loader_next2; 2 was PNG decode + global failed-slot accounting).
# A stale .so is treated as NOT AVAILABLE — the Python fallback loader is
# used and the user is told to `make -C native` — instead of silently
# feeding zero-filled batches for PNG datasets.
_MIN_ABI = 3

_LIB_PATHS = [
    # the env override comes FIRST so a debug/patched build can shadow the
    # in-tree library
    Path(os.environ.get("GCDATA_LIB", "")),
    Path(__file__).resolve().parents[2] / "native" / "libgcdata.so",
]

_lib = None


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        if p and p.is_file():
            try:
                lib = ctypes.CDLL(str(p))
            except OSError as e:
                # corrupt / wrong-arch .so: fall through to the next
                # candidate (and ultimately the Python loader) instead of
                # crashing startup
                _log.warning("cannot load %s (%s) — skipping", p, e)
                continue
            if not hasattr(lib, "gc_abi_version"):
                _log.warning(
                    "%s predates the supported native ABI — rebuild with "
                    "`make -C native` (falling back to the Python loader)", p
                )
                continue
            lib.gc_abi_version.restype = ctypes.c_long
            if lib.gc_abi_version() < _MIN_ABI:
                _log.warning(
                    "%s has native ABI %d < %d — rebuild with `make -C "
                    "native` (falling back to the Python loader)",
                    p, lib.gc_abi_version(), _MIN_ABI,
                )
                continue
            lib.gc_loader_failed_slots.restype = ctypes.c_long
            lib.gc_loader_failed_slots.argtypes = [ctypes.c_void_p]
            lib.gc_loader_create.restype = ctypes.c_void_p
            lib.gc_loader_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
                ctypes.c_float,
            ]
            lib.gc_loader_next.restype = ctypes.c_int
            lib.gc_loader_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
            lib.gc_loader_next2.restype = ctypes.c_int
            lib.gc_loader_next2.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_long),
            ]
            lib.gc_loader_destroy.argtypes = [ctypes.c_void_p]
            lib.gc_decode_one.restype = ctypes.c_int
            lib.gc_decode_one.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float)
            ]
            _lib = lib
            return lib
    return None


def available() -> bool:
    return load_library() is not None


def decode_one(path: str | Path, size: int) -> np.ndarray:
    """Decode+resize one JPEG/PNG to [size,size,3] float32 in [-1,1]."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("libgcdata.so not built (make -C native)")
    out = np.empty((size, size, 3), np.float32)
    rc = lib.gc_decode_one(
        str(path).encode(), size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    if rc != 0:
        raise IOError(f"decode failed: {path}")
    return out


def native_loader(
    paths: Sequence[str | Path],
    size: int,
    batch_size: int,
    workers: int = 4,
    seed: int = 0,
    hflip: bool = True,
    random_resized_crop_p: float = 0.0,
) -> Iterator[np.ndarray]:
    """Infinite NHWC float32 [-1,1] batch stream from the C++ backend."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("libgcdata.so not built (make -C native)")
    enc = [str(p).encode() for p in paths]
    arr = (ctypes.c_char_p * len(enc))(*enc)
    handle = lib.gc_loader_create(
        arr, len(enc), size, batch_size, workers, seed, int(hflip),
        float(random_resized_crop_p),
    )
    if not handle:
        raise RuntimeError("gc_loader_create failed")
    try:
        while True:
            out = np.empty((batch_size, size, size, 3), np.float32)
            failed = ctypes.c_long(0)
            rc = lib.gc_loader_next2(
                handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.byref(failed),
            )
            if rc != 0:
                return
            # per-batch accounting from the native side: abort only when the
            # batch about to be yielded is ENTIRELY zero-filled; otherwise
            # warn with the failure attributed to this exact batch
            if failed.value >= batch_size:
                raise RuntimeError(
                    f"native loader: all {batch_size} image slots in a batch "
                    f"failed to decode (corrupt/unsupported dataset?) — "
                    f"refusing to train on zero-filled batches"
                )
            if failed.value > 0:
                _log.warning(
                    "native loader: %d/%d image slot(s) in this batch failed "
                    "to decode and were zero-filled (total %d)",
                    failed.value, batch_size,
                    int(lib.gc_loader_failed_slots(handle)),
                )
            yield out
    finally:
        lib.gc_loader_destroy(handle)
