"""Python bindings + dataset for the native TUB loader (native/tubloader.cpp).

The TUB format is a single mmap-able flat file of fixed-size records —
designed for the TPU training loop's access pattern (random gather of a few
MB per step): the C++ side is pointer arithmetic + a persistent thread pool
doing uint8->f32 conversion straight into numpy buffers; the page cache
holds the raw bytes once. Contrast with npz shards (one zip+npy parse per
model per epoch).

Build: compiled on demand with g++ (no pybind11 needed — plain C ABI via
ctypes), cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Iterator

import numpy as np

from tpu_unsup_pc.utils.config import Config

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "tubloader.cpp")
_LOCK = threading.Lock()
_LIB = None

MAGIC = b"TUPC"
VERSION = 2  # v2 records carry f32 distance[V]; v1 files stay readable


def _build_lib() -> str:
    so = os.path.join(os.path.dirname(_SRC), "libtubloader.so")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-pthread", "-o", so, _SRC],
            check=True, capture_output=True)
    return so


def _lib():
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build_lib())
            lib.tub_open.restype = ctypes.c_void_p
            lib.tub_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
            lib.tub_close.argtypes = [ctypes.c_void_p]
            lib.tub_num_models.restype = ctypes.c_int64
            lib.tub_num_models.argtypes = [ctypes.c_void_p]
            lib.tub_dims.argtypes = [ctypes.c_void_p] + \
                [ctypes.POINTER(ctypes.c_int64)] * 3
            lib.tub_has_distance.restype = ctypes.c_int64
            lib.tub_has_distance.argtypes = [ctypes.c_void_p]
            lib.tub_fill_batch.restype = ctypes.c_int64
            lib.tub_fill_batch.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64] + [ctypes.POINTER(ctypes.c_float)] * 5
            _LIB = lib
    return _LIB


def write_tub_dataset(path: str, images: np.ndarray, masks: np.ndarray,
                      azimuth: np.ndarray, elevation: np.ndarray,
                      distance: np.ndarray | None = None) -> None:
    """Serialize (M,V,H,W,3)/(M,V,H,W)/(M,V)/(M,V) arrays as one TUB file.
    images in [0,1] float or uint8; masks thresholded at 0.5. With
    `distance` (M,V) the file is version 2 (per-view camera distances —
    the jittered-distance configs); without it a version-1 file, so the
    legacy read path stays exercised."""
    M, V, H, W = masks.shape
    version = VERSION if distance is not None else 1
    if images.dtype != np.uint8:
        images = (np.clip(images, 0, 1) * 255 + 0.5).astype(np.uint8)
    masks_u8 = (masks > 0.5).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(np.asarray([version, M, V, H, W], np.uint32).tobytes())
        for m in range(M):
            f.write(azimuth[m].astype(np.float32).tobytes())
            f.write(elevation[m].astype(np.float32).tobytes())
            if distance is not None:
                f.write(distance[m].astype(np.float32).tobytes())
            f.write(masks_u8[m].tobytes())
            f.write(images[m].tobytes())


class TubDataset:
    """Iterator[Batch] over a TUB file via the native loader; schema
    matches SyntheticShapes / ShapeNetViews."""

    def __init__(self, cfg: Config, path: str, split: str = "train",
                 num_threads: int = 8, seed: int | None = None,
                 prefetch: int = 2):
        self.cfg = cfg
        lib = _lib()
        self._lib = lib
        self._h = lib.tub_open(path.encode(), num_threads)
        if not self._h:
            raise FileNotFoundError(f"cannot open TUB file {path!r}")
        v = ctypes.c_int64()
        hh = ctypes.c_int64()
        w = ctypes.c_int64()
        lib.tub_dims(self._h, ctypes.byref(v), ctypes.byref(hh),
                     ctypes.byref(w))
        self.V, self.H, self.W = v.value, hh.value, w.value
        assert self.V >= cfg.num_views, (self.V, cfg.num_views)
        self.has_distance = bool(lib.tub_has_distance(self._h))
        self._n = lib.tub_num_models(self._h)
        self._rng = np.random.default_rng(cfg.seed if seed is None else seed)
        self._prefetch = prefetch

    def __len__(self):
        return self._n

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.tub_close(self._h)
                self._h = None
        except Exception:
            pass

    def get_batch(self, idx) -> Dict[str, np.ndarray]:
        idx = np.ascontiguousarray(np.asarray(idx, np.int64))
        B, V, H, W = len(idx), self.V, self.H, self.W
        img = np.empty((B, V, H, W, 3), np.float32)
        mask = np.empty((B, V, H, W), np.float32)
        az = np.empty((B, V), np.float32)
        el = np.empty((B, V), np.float32)
        c_f = ctypes.POINTER(ctypes.c_float)
        dist = np.empty((B, V), np.float32) if self.has_distance else None
        bad = self._lib.tub_fill_batch(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            B, img.ctypes.data_as(c_f), mask.ctypes.data_as(c_f),
            az.ctypes.data_as(c_f), el.ctypes.data_as(c_f),
            dist.ctypes.data_as(c_f) if dist is not None else None)
        if bad >= 0:
            raise IndexError(
                f"model index {int(idx[bad])} out of range [0, {self._n})")
        Vc = self.cfg.num_views
        batch = {"image": img[:, :Vc], "mask": mask[:, :Vc],
                 "azimuth": az[:, :Vc], "elevation": el[:, :Vc]}
        if dist is not None:
            batch["distance"] = dist[:, :Vc]
        return batch

    def eval_arrays(self, n: int):
        """Bounded (images, azimuth, elevation) materialization for the
        in-train pose eval — same accessor as SyntheticShapes/
        ShapeNetViews so best-checkpoint selection works on TUB runs."""
        b = self.get_batch(np.arange(min(int(n), self._n)))
        return b["image"], b["azimuth"], b["elevation"]

    def sample_batch(self, batch_size: int | None = None) -> Dict:
        bs = batch_size or self.cfg.batch_size
        return self.get_batch(self._rng.integers(0, self._n, size=bs))

    def batches(self, steps: int,
                batch_size: int | None = None) -> Iterator[Dict]:
        from tpu_unsup_pc.data.prefetch import prefetch_batches
        return prefetch_batches(lambda: self.sample_batch(batch_size),
                                steps, maxsize=self._prefetch)

    def __iter__(self):
        while True:
            yield self.sample_batch()
