"""Simple-GLA backbone: GLA recurrence with a scalar-per-head decay gate.

Reference model/simple_gla.py:117-180 (built on FLA's
SimpleGatedLinearAttention). Here it is the same :class:`AttentiveGLA`
architecture with ``scalar_gate=True`` on every token mixer — the chunked
kernel, decode step, state pytrees, and initial-state tuning all come for
free. FLA's simple layer defaults expand_v to 1.0.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from lina_speech_tpu.models.attentive_rnn import AttentiveGLA


def AttentiveSimpleGLA(
    d_model: int,
    n_layer: int,
    heads: int,
    dropout_att: float = 0.0,
    dropout: float = 0.0,
    d_blind: Optional[int] = None,
    blind: bool = False,
    cross_att_pp: bool = False,
    rotary: bool = False,
    use_short_conv: bool = False,
    expand_k: float = 1.0,
    expand_v: float = 1.0,
    pos_type: str = "sinusoidal",
    chunk_size: int = 64,
    remat: bool = False,
    kernel_mode: str = "auto",
    cp_axis: Optional[str] = None,
    dtype: Any = jnp.float32,
) -> AttentiveGLA:
    return AttentiveGLA(
        d_model=d_model, n_layer=n_layer, heads=heads, dropout_att=dropout_att,
        dropout=dropout, d_blind=d_blind, blind=blind, cross_att_pp=cross_att_pp,
        rotary=rotary, use_short_conv=use_short_conv, expand_k=expand_k,
        expand_v=expand_v, pos_type=pos_type, chunk_size=chunk_size,
        remat=remat, scalar_gate=True, kernel_mode=kernel_mode,
        cp_axis=cp_axis, dtype=dtype,
    )
