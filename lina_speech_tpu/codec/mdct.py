"""MDCT / IMDCT with TDAC windows (reference decoder/spectral_ops.py:78-192).

Implemented as cosine-basis matmuls (MXU-friendly at vocoder frame sizes;
the reference uses an FFT twiddle factorization — same transform). The
Princen-Bradley sine window gives perfect reconstruction under 50% overlap,
verified in tests.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

Array = jnp.ndarray


def _basis(frame_len: int) -> np.ndarray:
    """(2N, N) cosine basis: C[n, k] = cos(pi/N (n + 0.5 + N/2)(k + 0.5))."""
    N = frame_len // 2
    n = np.arange(2 * N)[:, None]
    k = np.arange(N)[None, :]
    return np.cos(np.pi / N * (n + 0.5 + N / 2) * (k + 0.5))


def _window(frame_len: int) -> np.ndarray:
    n = np.arange(frame_len)
    return np.sin(np.pi / frame_len * (n + 0.5))


def mdct(audio: Array, frame_len: int, padding: str = "same") -> Array:
    """(B, T) -> (B, L, N) MDCT coefficients; hop = N = frame_len/2."""
    N = frame_len // 2
    if padding == "same":
        audio = jnp.pad(audio, ((0, 0), (N // 2, N // 2)))
    elif padding == "center":
        audio = jnp.pad(audio, ((0, 0), (N, N)))
    T = audio.shape[-1]
    L = (T - frame_len) // N + 1
    idx = np.arange(L)[:, None] * N + np.arange(frame_len)[None, :]
    frames = audio[:, idx] * jnp.asarray(_window(frame_len).astype(np.float32))
    basis = jnp.asarray((_basis(frame_len) * np.sqrt(2.0 / N)).astype(np.float32))
    return frames @ basis  # (B, L, N)


def imdct(coeffs: Array, padding: str = "same") -> Array:
    """(B, L, N) -> (B, ~L*N) waveform via windowed overlap-add."""
    B, L, N = coeffs.shape
    frame_len = 2 * N
    # analysis scale * synthesis scale must equal 2/N for TDAC reconstruction
    basis = jnp.asarray((_basis(frame_len).T * np.sqrt(2.0 / N)).astype(np.float32))
    frames = coeffs @ basis  # (B, L, 2N)
    frames = frames * jnp.asarray(_window(frame_len).astype(np.float32))

    out_len = (L - 1) * N + frame_len
    pos = (np.arange(L)[:, None] * N + np.arange(frame_len)[None, :]).reshape(-1)
    y = jnp.zeros((B, out_len), frames.dtype).at[:, pos].add(frames.reshape(B, -1))
    # TDAC: w^2 overlap sums to 1 with the sine window (x 2/N scale folded in)
    if padding == "same":
        return y[:, N // 2 : out_len - N // 2]
    if padding == "center":
        return y[:, N : out_len - N]
    return y
