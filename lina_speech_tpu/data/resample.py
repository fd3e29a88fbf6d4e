"""Audio resampling for the data pipeline.

The reference's codec dataset resamples via torchaudio
(decoder/dataset.py:44-84); here host-side polyphase resampling via scipy
(this is input-pipeline work, not device compute).
"""
from __future__ import annotations

from math import gcd

import numpy as np


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """(..., T) waveform resampled with a polyphase filter."""
    if orig_sr == target_sr:
        return audio
    from scipy.signal import resample_poly

    g = gcd(orig_sr, target_sr)
    return resample_poly(audio, target_sr // g, orig_sr // g, axis=-1).astype(
        np.asarray(audio).dtype
    )
