"""Arithmetic (range) coding for neural-codec compression.

Working TPU-framework counterpart of the reference's entropy-coding stack
(reference encoder/quantization/ac.py — dead code in that snapshot: it
imports a ``..binary`` module that does not exist, SURVEY.md §2.2). This
is a from-scratch integer arithmetic coder with the same role and
contract: quantize a model pdf to a stable integer cdf (so encoder and
decoder derive bit-identical tables from slightly different float
arithmetic), then code symbols to/from a bitstream. Entropy coding is
host-side work by nature (sequential, data-dependent branching) — the
TPU's job is producing the pdfs (codec/lm.py), the coder runs in numpy.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np


class BitPacker:
    """MSB-first bit writer."""

    def __init__(self):
        self._bytes = bytearray()
        self._cur = 0
        self._n = 0

    def push(self, bit: int):
        self._cur = (self._cur << 1) | (bit & 1)
        self._n += 1
        if self._n == 8:
            self._bytes.append(self._cur)
            self._cur = 0
            self._n = 0

    def flush(self) -> bytes:
        if self._n:
            self._bytes.append(self._cur << (8 - self._n))
            self._cur = 0
            self._n = 0
        return bytes(self._bytes)


class BitUnpacker:
    """MSB-first bit reader; returns 0 past the end (decoder padding)."""

    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0

    def pull(self) -> int:
        byte, bit = divmod(self._pos, 8)
        self._pos += 1
        if byte >= len(self._data):
            return 0
        return (self._data[byte] >> (7 - bit)) & 1


def build_stable_quantized_cdf(pdf: np.ndarray, total_range_bits: int = 24,
                               roundoff: float = 1e-8) -> np.ndarray:
    """Float pdf -> integer cdf (int64, length n+1, cdf[n] == 2**bits).

    Stability contract (mirrors the reference ac.py API): the pdf is
    first truncated to ``roundoff`` quanta so encoder and decoder reach
    identical tables from float pdfs that differ below that threshold;
    every symbol gets a count >= 1 so any symbol stays decodable.
    """
    pdf = np.asarray(pdf, np.float64)
    if roundoff:
        pdf = np.floor(pdf / roundoff) * roundoff
    n = pdf.shape[-1]
    total = 1 << total_range_bits
    norm = pdf.sum()
    scaled = np.floor(pdf / max(norm, 1e-30) * (total - n)).astype(np.int64) + 1
    # fix rounding drift on the largest bin (keeps all counts >= 1)
    scaled[np.argmax(scaled)] += total - int(scaled.sum())
    cdf = np.zeros(n + 1, np.int64)
    np.cumsum(scaled, out=cdf[1:])
    return cdf


class ArithmeticCoder:
    """Integer arithmetic encoder over per-symbol quantized cdfs."""

    _P = 32  # internal precision; must exceed total_range_bits + 2

    def __init__(self):
        self._low = 0
        self._high = (1 << self._P) - 1
        self._pending = 0
        self._packer = BitPacker()

    def _emit(self, bit: int):
        self._packer.push(bit)
        while self._pending:
            self._packer.push(1 - bit)
            self._pending -= 1

    def push(self, symbol: int, cdf: np.ndarray):
        total = int(cdf[-1])
        span = self._high - self._low + 1
        self._high = self._low + span * int(cdf[symbol + 1]) // total - 1
        self._low = self._low + span * int(cdf[symbol]) // total
        half = 1 << (self._P - 1)
        quarter = 1 << (self._P - 2)
        while True:
            if self._high < half:
                self._emit(0)
            elif self._low >= half:
                self._emit(1)
                self._low -= half
                self._high -= half
            elif self._low >= quarter and self._high < 3 * quarter:
                self._pending += 1
                self._low -= quarter
                self._high -= quarter
            else:
                break
            self._low <<= 1
            self._high = (self._high << 1) | 1

    def flush(self) -> bytes:
        # one disambiguating interval bit + pending carries
        self._pending += 1
        if self._low < (1 << (self._P - 2)):
            self._emit(0)
        else:
            self._emit(1)
        return self._packer.flush()


class _NotBuilt(Exception):
    pass


_NATIVE_LIB = None


def _native_lib():
    """Build/load the C++ coder (native/ac.cpp); None when unavailable or
    disabled via LINA_NATIVE_AC=0."""
    global _NATIVE_LIB
    if _NATIVE_LIB is not None:
        return _NATIVE_LIB or None
    import ctypes
    import os
    import subprocess

    if os.environ.get("LINA_NATIVE_AC", "1") != "1":
        _NATIVE_LIB = False
        return None
    ndir = os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                        "native"))
    so, src = os.path.join(ndir, "libac.so"), os.path.join(ndir, "ac.cpp")
    try:
        if not os.path.exists(so):
            subprocess.run(["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                            src, "-o", so], check=True, capture_output=True)
        lib = ctypes.CDLL(so)
    except (OSError, subprocess.CalledProcessError):
        _NATIVE_LIB = False
        return None
    c = ctypes
    lib.ac_enc_create.restype = c.c_void_p
    lib.ac_enc_push.argtypes = [c.c_void_p, c.POINTER(c.c_int64), c.c_int,
                                c.c_int]
    lib.ac_enc_push_many.argtypes = [c.c_void_p, c.POINTER(c.c_int64),
                                     c.POINTER(c.c_int32), c.c_int, c.c_int]
    lib.ac_enc_flush_size.restype = c.c_int64
    lib.ac_enc_flush_size.argtypes = [c.c_void_p]
    lib.ac_enc_copy.argtypes = [c.c_void_p, c.POINTER(c.c_uint8)]
    lib.ac_enc_destroy.argtypes = [c.c_void_p]
    lib.ac_dec_create.restype = c.c_void_p
    lib.ac_dec_create.argtypes = [c.POINTER(c.c_uint8), c.c_int64]
    lib.ac_dec_pull.restype = c.c_int
    lib.ac_dec_pull.argtypes = [c.c_void_p, c.POINTER(c.c_int64), c.c_int]
    lib.ac_dec_pull_many.argtypes = [c.c_void_p, c.POINTER(c.c_int64),
                                     c.c_int, c.c_int, c.POINTER(c.c_int32)]
    lib.ac_dec_destroy.argtypes = [c.c_void_p]
    _NATIVE_LIB = lib
    return lib


def _i64p(a):
    import ctypes

    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


class NativeArithmeticCoder:
    """C++ encoder (native/ac.cpp), bit-identical to ArithmeticCoder."""

    def __init__(self, lib):
        self._lib = lib
        self._h = lib.ac_enc_create()

    def push(self, symbol: int, cdf: np.ndarray):
        cdf = np.ascontiguousarray(cdf, np.int64)
        self._lib.ac_enc_push(self._h, _i64p(cdf), len(cdf) - 1, int(symbol))

    def push_many(self, symbols: np.ndarray, cdfs: np.ndarray):
        """symbols (m,), cdfs (m, n+1): one native call for a whole step."""
        import ctypes

        cdfs = np.ascontiguousarray(cdfs, np.int64)
        syms = np.ascontiguousarray(symbols, np.int32)
        self._lib.ac_enc_push_many(
            self._h, _i64p(cdfs),
            syms.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cdfs.shape[0], cdfs.shape[1] - 1)

    def flush(self) -> bytes:
        import ctypes

        n = self._lib.ac_enc_flush_size(self._h)
        out = np.zeros(int(n), np.uint8)
        self._lib.ac_enc_copy(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        self._lib.ac_enc_destroy(self._h)
        self._h = None
        return out.tobytes()


class NativeArithmeticDecoder:
    """C++ decoder, bit-identical to ArithmeticDecoder."""

    def __init__(self, lib, data: bytes):
        import ctypes

        self._lib = lib
        buf = np.frombuffer(data, np.uint8)
        self._h = lib.ac_dec_create(
            np.ascontiguousarray(buf).ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)), len(data))

    def pull(self, cdf: np.ndarray) -> int:
        cdf = np.ascontiguousarray(cdf, np.int64)
        return int(self._lib.ac_dec_pull(self._h, _i64p(cdf), len(cdf) - 1))

    def pull_many(self, cdfs: np.ndarray) -> np.ndarray:
        import ctypes

        cdfs = np.ascontiguousarray(cdfs, np.int64)
        out = np.zeros(cdfs.shape[0], np.int32)
        self._lib.ac_dec_pull_many(
            self._h, _i64p(cdfs), cdfs.shape[0], cdfs.shape[1] - 1,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out

    def __del__(self):
        if getattr(self, "_h", None) is not None:
            self._lib.ac_dec_destroy(self._h)
            self._h = None


def make_coder():
    """Native encoder when buildable, Python fallback otherwise."""
    lib = _native_lib()
    return NativeArithmeticCoder(lib) if lib else ArithmeticCoder()


def make_decoder(data: bytes):
    lib = _native_lib()
    return NativeArithmeticDecoder(lib, data) if lib else ArithmeticDecoder(data)


class ArithmeticDecoder:
    """Mirror of :class:`ArithmeticCoder`."""

    _P = ArithmeticCoder._P

    def __init__(self, data: bytes):
        self._low = 0
        self._high = (1 << self._P) - 1
        self._unpacker = BitUnpacker(data)
        self._value = 0
        for _ in range(self._P):
            self._value = (self._value << 1) | self._unpacker.pull()

    def pull(self, cdf: np.ndarray) -> int:
        total = int(cdf[-1])
        span = self._high - self._low + 1
        offset = ((self._value - self._low + 1) * total - 1) // span
        symbol = int(np.searchsorted(cdf, offset, side="right")) - 1
        self._high = self._low + span * int(cdf[symbol + 1]) // total - 1
        self._low = self._low + span * int(cdf[symbol]) // total
        half = 1 << (self._P - 1)
        quarter = 1 << (self._P - 2)
        while True:
            if self._high < half:
                pass
            elif self._low >= half:
                self._low -= half
                self._high -= half
                self._value -= half
            elif self._low >= quarter and self._high < 3 * quarter:
                self._low -= quarter
                self._high -= quarter
                self._value -= quarter
            else:
                break
            self._low <<= 1
            self._high = (self._high << 1) | 1
            self._value = (self._value << 1) | self._unpacker.pull()
        return symbol
