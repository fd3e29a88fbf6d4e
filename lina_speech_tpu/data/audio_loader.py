"""ctypes wrapper over the native C++ audio loader (native/audioloader.cpp),
with a pure-numpy fallback when no C++ toolchain is available.

Replaces the reference's torch DataLoader + soundfile path for the codec/
vocoder training workload (decoder/dataset.py): WAV decode, random crop and
random gain normalization run in native worker threads off the GIL.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libaudioloader.so"))
_SRC_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "audioloader.cpp"))


def build_native(force: bool = False) -> Optional[str]:
    """Compile the shared library if needed; returns its path or None."""
    if os.path.exists(_SO_PATH) and not force:
        return _SO_PATH
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
             _SRC_PATH, "-o", _SO_PATH],
            check=True, capture_output=True,
        )
        return _SO_PATH
    except (OSError, subprocess.CalledProcessError):
        return None


class NativeAudioLoader:
    """Iterator of (batch, crop_len) float32 audio batches."""

    def __init__(self, paths: List[str], crop_len: int, batch: int,
                 n_threads: int = 2, seed: int = 0, train: bool = True):
        so = build_native()
        if so is None:
            raise RuntimeError("native audioloader unavailable (no g++?)")
        self._lib = ctypes.CDLL(so)
        self._lib.loader_create.restype = ctypes.c_void_p
        self._lib.loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
        ]
        self._lib.loader_next.restype = ctypes.c_int
        self._lib.loader_next.argtypes = [ctypes.c_void_p,
                                          ctypes.POINTER(ctypes.c_float)]
        self._lib.loader_destroy.argtypes = [ctypes.c_void_p]

        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._handle = self._lib.loader_create(
            arr, len(paths), crop_len, batch, n_threads, seed, int(train)
        )
        if not self._handle:
            raise RuntimeError("loader_create failed")
        self.batch = batch
        self.crop_len = crop_len

    def __iter__(self) -> Iterator[np.ndarray]:
        return self

    def __next__(self) -> np.ndarray:
        out = np.empty((self.batch, self.crop_len), np.float32)
        rc = self._lib.loader_next(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if rc != 0:
            raise StopIteration
        return out

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NumpyAudioLoader:
    """Fallback: same behavior in pure numpy (WAV via the stdlib wave parser
    would miss float32 files; we parse RIFF directly)."""

    def __init__(self, paths: List[str], crop_len: int, batch: int,
                 seed: int = 0, train: bool = True,
                 gain_db: tuple = (-6.0, -1.0)):
        self.paths = paths
        self.crop_len = crop_len
        self.batch = batch
        self.train = train
        self.gain_db = gain_db
        self.rng = np.random.default_rng(seed)

    def _read(self, path: str) -> np.ndarray:
        import struct

        with open(path, "rb") as f:
            data = f.read()
        assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
        pos, fmt = 12, None
        while pos + 8 <= len(data):
            tag = data[pos : pos + 4]
            size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
            body = data[pos + 8 : pos + 8 + size]
            if tag == b"fmt ":
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif tag == b"data" and fmt:
                code, ch, _, _, _, bits = fmt
                if code == 1 and bits == 16:
                    x = np.frombuffer(body, "<i2").astype(np.float32) / 32768.0
                elif code == 1 and bits == 32:
                    x = np.frombuffer(body, "<i4").astype(np.float32) / 2147483648.0
                elif code == 3 and bits == 32:
                    x = np.frombuffer(body, "<f4").astype(np.float32)
                else:
                    raise ValueError(f"unsupported wav format {fmt}")
                return x.reshape(-1, ch).mean(axis=1)
            pos += 8 + size + (size & 1)
        raise ValueError("no data chunk")

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        out = np.zeros((self.batch, self.crop_len), np.float32)
        for b in range(self.batch):
            x = self._read(self.paths[self.rng.integers(len(self.paths))])
            start = 0
            if self.train and len(x) > self.crop_len:
                start = int(self.rng.integers(0, len(x) - self.crop_len + 1))
            seg = x[start : start + self.crop_len]
            gain_db = self.rng.uniform(*self.gain_db)
            gain = 10 ** (gain_db / 20.0) / max(np.abs(x).max(), 1e-9)
            out[b, : len(seg)] = seg * gain
        return out


def make_audio_loader(paths: List[str], crop_len: int, batch: int, **kw):
    """Native loader when buildable, numpy fallback otherwise."""
    try:
        return NativeAudioLoader(paths, crop_len, batch, **kw)
    except (RuntimeError, OSError):
        kw.pop("n_threads", None)
        return NumpyAudioLoader(paths, crop_len, batch, **kw)
