"""RVQ delay pattern, masking and padding utilities (pure jnp / numpy).

Semantics mirror the reference utilities in ``model/tools.py`` of
theodorblackbird/lina-speech (delay_rvq: tools.py:46-59, undelay_rvq:
tools.py:61-67, sequence_mask: tools.py:69-77, packmask_2d: tools.py:17-35,
pad_2d_sequence: tools.py:8-15) re-expressed with static-shape, jit-friendly
jnp code. Host-side helpers that build masks from Python length lists return
numpy arrays so they can be computed in the input pipeline, off-device.
"""
from __future__ import annotations

from itertools import accumulate
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np


def delay_rvq(code: jnp.ndarray, head_token: int = -2, tail_token: int = -3) -> jnp.ndarray:
    """Apply the RVQ delay pattern to a (q, n) code matrix.

    Quantizer row ``i`` is shifted right by ``i + 1`` steps. The sequence is
    extended by ``q + 1`` frames holding a lower-triangular "head token"
    triangle at the front (after the roll) and a "tail token" triangle at the
    end, exactly as the reference builds it (tools.py:46-59).

    Returns an int32 array of shape (q, n + q + 1).
    """
    code = jnp.asarray(code)
    q, _ = code.shape
    head = jnp.tril(jnp.ones((q, q + 1))) * head_token
    tail = jnp.tril(jnp.ones((q + 1, q)), -1).T * tail_token
    extension = jnp.flip(head + tail, axis=1)
    extended = jnp.concatenate([code, extension.astype(code.dtype)], axis=1)
    rows = [jnp.roll(extended[i], i + 1) for i in range(q)]
    return jnp.stack(rows).astype(jnp.int32)


def undelay_rvq(extended_code: jnp.ndarray) -> jnp.ndarray:
    """Invert :func:`delay_rvq` on a (q, b, n) tensor (tools.py:61-67).

    Rolls quantizer row ``i`` left by ``i + 1`` and drops the last ``q + 1``
    frames. Returns shape (q, b, n - q - 1).
    """
    q, _, _ = extended_code.shape
    rows = [jnp.roll(extended_code[i], -(i + 1), axis=1) for i in range(q)]
    out = jnp.stack(rows, axis=0)
    return out[:, :, : -(q + 1)]


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(b,) lengths -> (b, max_len) bool mask; True where position < length."""
    ids = jnp.arange(max_len)[None, :]
    return ids < jnp.asarray(lengths)[:, None]


def packmask_2d(xlen: Sequence[int], ylen: Sequence[int], offset: int = 0) -> np.ndarray:
    """Block-diagonal cross-attention mask for sequence-packed batches.

    Row block ``i`` (of height ``xlen[i]``) may attend to column span ``i``
    (of width ``ylen[i]``), optionally widened by ``offset`` on both sides
    (tools.py:17-35). Host-side: takes Python ints, returns numpy bool array
    of shape (sum(xlen), sum(ylen)).
    """
    ybound = [0] + list(accumulate(ylen))
    lb, hb = [], []
    for n, lo, hi in zip(xlen, ybound[:-1], ybound[1:]):
        lb += [lo] * n
        hb += [hi] * n
    lb = np.asarray(lb) - offset
    hb = np.asarray(hb) + offset
    rge = np.arange(ybound[-1])
    return (rge[None, :] >= lb[:, None]) & (rge[None, :] < hb[:, None])


def packed_reset_mask(ylen: Sequence[int], total: int | None = None) -> np.ndarray:
    """True at the first position of every packed segment.

    Used as the GLA ``reset_mask`` (gla.py:182-184 in the reference): the
    decay gate is forced to ~0 there so recurrent state never leaks across
    packed-sequence boundaries.
    """
    total = total if total is not None else int(sum(ylen))
    mask = np.zeros((total,), dtype=bool)
    pos = 0
    for n in ylen:
        if pos < total:
            mask[pos] = True
        pos += n
    return mask


def pad_2d_sequence(seqs: List[np.ndarray], padding_value: int = 0) -> np.ndarray:
    """Pad a list of 2D arrays to a common shape and stack (tools.py:8-15)."""
    max_x = max(s.shape[0] for s in seqs)
    max_y = max(s.shape[1] for s in seqs)
    out = np.full((len(seqs), max_x, max_y), padding_value, dtype=np.asarray(seqs[0]).dtype)
    for i, s in enumerate(seqs):
        out[i, : s.shape[0], : s.shape[1]] = s
    return out
