"""ctypes bindings for the native C++ batch loader (native/tpu_seg_loader.cpp).

Replaces the reference stack's native input tier (SURVEY.md §2.3: the torch
DataLoader's speed came from Pillow-SIMD/libjpeg-turbo in C): a C++ thread
pool decodes JPEG/PNG pairs into a prefetch ring of uint8 NHWC batches, with
the Cityscapes-style raw-id→train-id LUT applied during the copy. Python
only moves ready buffers to the device; the ctypes call releases the GIL, so
decode overlaps both the train step and the H2D transfer.

Falls back transparently to the pure-Python `pipeline.batch_iterator` when
the shared library is absent and cannot be built (no g++).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import typing as tp

import numpy as np

# The shared lib lives in the source tree's native/ dir (built by its
# Makefile on first use). For non-source-tree installs (`pip install .`
# without -e), point TPU_SEG_NATIVE_LIB at a prebuilt .so.
_NATIVE_DIR = os.environ.get(
    "TPU_SEG_NATIVE_DIR",
    os.path.join(os.path.dirname(__file__), "..", "..", "native"))
_SO = os.environ.get("TPU_SEG_NATIVE_LIB", os.path.abspath(
    os.path.join(_NATIVE_DIR, "libtpu_seg_loader.so")))

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        # `make` builds into _NATIVE_DIR; it can only satisfy the default
        # path. An env-pointed _SO that doesn't exist is just unavailable.
        if _SO != os.path.abspath(
                os.path.join(_NATIVE_DIR, "libtpu_seg_loader.so")):
            raise RuntimeError(f"native loader unavailable: "
                               f"TPU_SEG_NATIVE_LIB={_SO} does not exist")
        try:
            subprocess.run(["make"], cwd=os.path.abspath(_NATIVE_DIR),
                           check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError) as e:
            raise RuntimeError(f"native loader unavailable: {e}") from e
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:   # keep the documented transparent fallback path
        raise RuntimeError(f"native loader unavailable: {e}") from e
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
    ]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_void_p]
    lib.loader_error.restype = ctypes.c_char_p
    lib.loader_error.argtypes = [ctypes.c_void_p]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.decode_image.restype = ctypes.c_int
    lib.decode_image.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load_lib()
        return True
    except RuntimeError:
        return False


def decode_image(path: str, channels: int = 3,
                 max_side: int = 8192) -> np.ndarray:
    """Decode one JPEG/PNG via the native codecs (test/tool helper)."""
    lib = _load_lib()
    buf = np.empty((max_side * max_side * channels,), np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    ok = lib.decode_image(path.encode(), buf.ctypes.data_as(ctypes.c_void_p),
                          ctypes.byref(h), ctypes.byref(w), channels,
                          buf.size)
    if not ok:
        raise IOError(f"native decode failed: {path}")
    arr = buf[: h.value * w.value * channels].reshape(h.value, w.value,
                                                      channels)
    return arr.copy() if channels > 1 else arr.reshape(h.value, w.value).copy()


class NativeBatchLoader:
    """Iterator of (images (B,H,W,3) u8, labels (B,H,W) u8) host batches."""

    def __init__(self, image_paths: tp.Sequence[str],
                 label_paths: tp.Sequence[str] | None,
                 batch_size: int, height: int, width: int, *,
                 num_threads: int = 4, prefetch: int = 3,
                 label_lut: np.ndarray | None = None, seed: int = 0,
                 shuffle: bool = True, epochs: int = 0,
                 start_batch: int = 0,
                 sample_slice: tuple[int, int] | None = None):
        lib = _load_lib()
        n = len(image_paths)
        if label_paths is not None and len(label_paths) != n:
            raise ValueError("image/label path count mismatch")
        # multi-host contract (parallel.distributed.local_shard_range):
        # walk the full deterministic global order but decode + emit only
        # samples [lo, hi) of each global batch
        lo, hi = sample_slice if sample_slice is not None else (0, batch_size)
        if not 0 <= lo < hi <= batch_size:
            raise ValueError(f"bad sample_slice {sample_slice} for batch "
                             f"{batch_size}")
        self._imgs = (ctypes.c_char_p * n)(*[p.encode() for p in image_paths])
        self._lbls = ((ctypes.c_char_p * n)(*[p.encode() for p in label_paths])
                      if label_paths is not None else None)
        lut_buf = (bytes(np.asarray(label_lut, np.uint8))
                   if label_lut is not None else None)
        self._handle = lib.loader_create(
            self._imgs, self._lbls, n, batch_size, height, width,
            num_threads, prefetch, lut_buf, seed, int(shuffle), epochs,
            start_batch, lo, hi)
        if not self._handle:
            raise RuntimeError("loader_create failed")
        self._lib = lib
        self._shape = (hi - lo, height, width)
        self._has_labels = label_paths is not None

    def __iter__(self):
        return self

    def __next__(self):
        b, h, w = self._shape
        img = np.empty((b, h, w, 3), np.uint8)
        lbl = np.empty((b, h, w), np.uint8) if self._has_labels else None
        rc = self._lib.loader_next(
            self._handle, img.ctypes.data_as(ctypes.c_void_p),
            lbl.ctypes.data_as(ctypes.c_void_p) if lbl is not None else None)
        if rc == 0:
            raise StopIteration
        if rc < 0:
            raise IOError(self._lib.loader_error(self._handle).decode())
        return (img, lbl) if self._has_labels else img

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        self.close()


def native_batch_iterator(dataset, batch_size: int, *, shuffle: bool = True,
                          seed: int = 0, num_threads: int = 4,
                          prefetch: int = 3, epochs: int = 0,
                          label_lut: np.ndarray | None = None,
                          height: int | None = None,
                          width: int | None = None,
                          start_batch: int = 0,
                          sample_slice: tuple[int, int] | None = None):
    """Drop-in for `pipeline.batch_iterator` over path-pair datasets
    (Cityscapes/CamVid/BDD/Mapillary expose image_paths/label_paths).
    Probes the first image for H×W when not given."""
    paths = getattr(dataset, "image_paths", None)
    lbls = getattr(dataset, "label_paths", None)
    if paths is None:
        raise TypeError("dataset has no image_paths; use the Python loader")
    if height is None or width is None:
        probe = decode_image(paths[0], 3)
        height, width = probe.shape[0], probe.shape[1]
    return NativeBatchLoader(paths, lbls, batch_size, height, width,
                             num_threads=num_threads, prefetch=prefetch,
                             label_lut=label_lut, seed=seed, shuffle=shuffle,
                             epochs=epochs, start_batch=start_batch,
                             sample_slice=sample_slice)
