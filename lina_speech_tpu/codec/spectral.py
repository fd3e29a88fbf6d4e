"""Spectral ops: ISTFT with "same" padding as fused XLA.

The reference implements a custom ISTFT because torch.istft cannot do "same"
padding (decoder/spectral_ops.py:7-75). Here the overlap-add is an XLA
scatter-add over statically-computed frame positions and the window envelope
is a compile-time constant, so the whole head fuses into a few TPU kernels.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

Array = jnp.ndarray


def istft_same(spec: Array, n_fft: int, hop_length: int, win_length: int | None = None) -> Array:
    """Inverse STFT with "same" padding.

    Args:
        spec: (B, n_fft//2+1, T) complex spectrogram.
        n_fft, hop_length, win_length: STFT params (win_length defaults n_fft).

    Returns: (B, T*hop) real waveform (padding trimmed), matching the
    reference's output length (spectral_ops.py:60-75): (T-1)*hop + win
    minus (win-hop) of trim == T*hop.
    """
    win_length = win_length or n_fft
    window = jnp.asarray(np.hanning(win_length + 1)[:-1], jnp.float32)
    pad = (win_length - hop_length) // 2
    B, _, T = spec.shape

    # inverse real FFT over the frequency axis
    ifft = jnp.fft.irfft(spec, n=n_fft, axis=1, norm="backward")  # (B, n_fft, T)
    ifft = ifft * window[None, :, None]

    output_size = (T - 1) * hop_length + win_length
    # frame positions are static: scatter-add the windowed frames
    pos = (np.arange(T)[:, None] * hop_length + np.arange(win_length)[None, :]).reshape(-1)
    frames = ifft.transpose(0, 2, 1).reshape(B, -1)  # (B, T*win)
    y = jnp.zeros((B, output_size), frames.dtype).at[:, pos].add(frames)

    # window envelope is a compile-time constant
    env = np.zeros(output_size, np.float64)
    w2 = np.asarray(np.hanning(win_length + 1)[:-1]) ** 2
    for t in range(T):
        env[t * hop_length : t * hop_length + win_length] += w2
    env = np.maximum(env, 1e-11)

    y = y / jnp.asarray(env, jnp.float32)[None, :]
    return y[:, pad : output_size - pad]
