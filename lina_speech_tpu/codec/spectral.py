"""Spectral ops: ISTFT with "same" padding as fused XLA.

The reference implements a custom ISTFT because torch.istft cannot do "same"
padding (decoder/spectral_ops.py:7-75). Here the overlap-add is an XLA
scatter-add over statically-computed frame positions and the window envelope
is a compile-time constant, so the whole head fuses into a few TPU kernels.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

Array = jnp.ndarray


@functools.lru_cache(maxsize=8)
def _irfft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real cos/sin bases (F, n_fft) such that for a hermitian spectrum
    X (F = n_fft//2+1 bins), irfft(X)[n] = Re(X) @ C + Im(X) @ S.

    irfft as two real matmuls: MXU-shaped, and — unlike complex64
    arithmetic — safe to execute eagerly on the axon TPU backend
    (eager complex ops hit UNIMPLEMENTED; measured, see BASELINE.md).
    """
    F = n_fft // 2 + 1
    k = np.arange(F)[:, None]
    n = np.arange(n_fft)[None, :]
    w = np.full((F, 1), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    ang = 2.0 * np.pi * k * n / n_fft
    cos_b = (w * np.cos(ang) / n_fft).astype(np.float32)
    sin_b = (-w * np.sin(ang) / n_fft).astype(np.float32)
    return cos_b, sin_b


def istft_same(spec: Array | tuple[Array, Array], n_fft: int, hop_length: int,
               win_length: int | None = None) -> Array:
    """Inverse STFT with "same" padding.

    Args:
        spec: (B, n_fft//2+1, T) complex spectrogram, or a (real, imag)
            tuple of float arrays of that shape (preferred on TPU — no
            complex dtype ever materializes).
        n_fft, hop_length, win_length: STFT params (win_length defaults n_fft).

    Returns: (B, T*hop) real waveform (padding trimmed), matching the
    reference's output length (spectral_ops.py:60-75): (T-1)*hop + win
    minus (win-hop) of trim == T*hop.
    """
    win_length = win_length or n_fft
    # host-cast f64->f32: the axon TPU backend cannot run a device-side
    # f64 convert (measured: Unimplemented at runtime)
    window = jnp.asarray(np.hanning(win_length + 1)[:-1].astype(np.float32))
    pad = (win_length - hop_length) // 2
    if isinstance(spec, tuple):
        re, im = spec
    else:
        re, im = spec.real, spec.imag
    B, _, T = re.shape

    # inverse real FFT over the frequency axis as two real matmuls
    cos_b, sin_b = _irfft_basis(n_fft)
    ifft = (jnp.einsum("bft,fn->bnt", re, jnp.asarray(cos_b))
            + jnp.einsum("bft,fn->bnt", im, jnp.asarray(sin_b)))  # (B, n_fft, T)
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

    y = y / jnp.asarray(env.astype(np.float32))[None, :]
    return y[:, pad : output_size - pad]
