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
