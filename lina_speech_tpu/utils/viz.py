"""Visualization helpers: cross-attention alignment maps, mel spectrograms.

The reference surfaces attention maps from every forward for alignment
debugging (crossatt.py:203-209, matplotlib use in lina.py); here the
equivalents render GenerateResult.att / training att outputs.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def attention_figure(att: np.ndarray, title: str = "cross-attention"):
    """att: (heads, T, M) or (T, M) -> matplotlib figure (lazy import)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    att = np.asarray(att)
    if att.ndim == 2:
        att = att[None]
    h = att.shape[0]
    fig, axes = plt.subplots(1, h, figsize=(4 * h, 4), squeeze=False)
    for i in range(h):
        axes[0][i].imshow(att[i].T, origin="lower", aspect="auto",
                          interpolation="nearest")
        axes[0][i].set_xlabel("audio step")
        axes[0][i].set_ylabel("text position")
        axes[0][i].set_title(f"{title} [head {i}]")
    fig.tight_layout()
    return fig


def save_attention(att: np.ndarray, path: str, title: str = "cross-attention") -> None:
    fig = attention_figure(att, title)
    fig.savefig(path, dpi=120)


def mel_figure(mel: np.ndarray, title: str = "mel"):
    """mel: (n_mels, T) log-mel -> figure (the reference logs these to
    TensorBoard during vocoder training, experiment.py:195-216)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 3))
    ax.imshow(np.asarray(mel), origin="lower", aspect="auto")
    ax.set_title(title)
    fig.tight_layout()
    return fig
