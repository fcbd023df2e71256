"""Training data pipeline: native C++ sampler with a prefetch thread.

The hot loop (random crops of the byte corpus, widened to int32) runs in
native/dataloader.cc via ctypes; this wrapper owns the library build, a
double-buffered background prefetcher so host sampling overlaps device
steps, and a pure-python fallback when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "native", "dataloader.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "build", "libfcsa_data.so")


def _build_lib() -> Optional[str]:
    if os.path.exists(_LIB):
        return _LIB
    if not os.path.exists(_SRC):
        return None
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    cmd = ["g++", "-O2", "-shared", "-fPIC", _SRC, "-o", _LIB, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"native dataloader build failed ({e}); using python sampler")
        return None


class _NativeCorpus:
    def __init__(self, path: str):
        lib_path = _build_lib()
        if lib_path is None:
            raise RuntimeError("native loader unavailable")
        lib = ctypes.CDLL(lib_path)
        lib.dl_open.restype = ctypes.c_void_p
        lib.dl_open.argtypes = [ctypes.c_char_p]
        lib.dl_size.restype = ctypes.c_long
        lib.dl_size.argtypes = [ctypes.c_void_p]
        lib.dl_sample.restype = ctypes.c_int
        lib.dl_sample.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.c_uint64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.dl_close.argtypes = [ctypes.c_void_p]
        handle = lib.dl_open(path.encode())
        if not handle:
            raise RuntimeError(f"dl_open failed for {path}")
        self._lib, self._handle = lib, handle
        self.size = lib.dl_size(handle)

    def sample(self, start: int, end: int, batch: int, width: int,
               seed: int) -> np.ndarray:
        out = np.empty((batch, width), np.int32)
        rc = self._lib.dl_sample(
            self._handle, start, end, batch, width,
            seed & 0xFFFFFFFFFFFFFFFF, out)
        if rc != 0:
            raise ValueError("dl_sample: bad range")
        return out

    def __del__(self):
        try:
            self._lib.dl_close(self._handle)
        except Exception:
            pass


class _PythonCorpus:
    """Fallback sampler with identical semantics (different RNG stream)."""

    def __init__(self, data: np.ndarray):
        self._data = data
        self.size = len(data)

    def sample(self, start, end, batch, width, seed):
        rng = np.random.default_rng(seed)
        starts = rng.integers(start, end - width, size=batch)
        return np.stack(
            [self._data[s:s + width] for s in starts]).astype(np.int32)


class TextSampler:
    """Random-crop batch sampler over a train/valid byte-corpus split
    (replaces reference TextSamplerDataset, train.py:75-92), with an
    N-deep background prefetch queue."""

    def __init__(self, path_or_array, train_frac: float = 0.947,
                 seed: int = 0, prefetch: int = 2):
        if isinstance(path_or_array, str):
            try:
                self._c = _NativeCorpus(path_or_array)
                self.backend = "native"
            except RuntimeError:
                import gzip
                opener = gzip.open if path_or_array.endswith(".gz") else open
                with opener(path_or_array, "rb") as f:
                    data = np.frombuffer(f.read(), np.uint8)
                self._c = _PythonCorpus(data)
                self.backend = "python"
        else:
            self._c = _PythonCorpus(np.asarray(path_or_array, np.uint8))
            self.backend = "python"
        self._split = int(self._c.size * train_frac)
        self._seed = seed
        self._prefetch_depth = prefetch
        self._queues = {}
        self._threads = {}

    def _range(self, split: str):
        return (0, self._split) if split == "train" else (
            self._split, self._c.size)

    def sample(self, split: str, batch: int, seq_len: int) -> np.ndarray:
        start, end = self._range(split)
        self._seed += 1
        return self._c.sample(start, end, batch, seq_len + 1, self._seed)

    def stream(self, split: str, batch: int, seq_len: int):
        """Generator backed by a background prefetch thread."""
        key = (split, batch, seq_len)
        if key not in self._queues:
            q: queue.Queue = queue.Queue(maxsize=self._prefetch_depth)
            self._queues[key] = q

            def worker():
                while True:
                    q.put(self.sample(split, batch, seq_len))

            t = threading.Thread(target=worker, daemon=True)
            t.start()
            self._threads[key] = t
        q = self._queues[key]
        while True:
            yield q.get()
