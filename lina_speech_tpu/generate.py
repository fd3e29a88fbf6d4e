"""Jitted autoregressive generation engine (voice cloning by prompt continuation).

TPU-native rebuild of ``LinaModel.generate_batch`` (reference
modeling_lina.py:111-192), redesigned around XLA's compilation model:

- the Python ``for t in range(max_seqlen)`` token loop becomes a single
  ``lax.while_loop`` with fixed-shape token/attention buffers and an
  all-rows-stopped predicate (same early-exit economics as the reference's
  ``break``, modeling_lina.py:172-173, but compiled);
- the speaker prompt is *prefilled chunk-parallel* through the training-path
  kernel instead of fed token-by-token (the recurrence is identical — the
  reference teacher-forces prompt embeddings, modeling_lina.py:175-179, so
  forcing them in parallel gives the same states and the same per-step
  predictions);
- sampling uses explicit PRNG keys (top-k + temperature for quantizers
  below ``first_greedy_quant``, greedy for the rest; modeling_lina.py:159-164);
- batch parallelism is a leading axis (vmap-free, shardable over a mesh for
  multi-chip serving).

Outputs keep fixed shapes; :func:`cut_outputs` applies the reference's
per-row stop-token trimming host-side (modeling_lina.py:181-192).
"""
from __future__ import annotations

import functools
import os
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.models.lina import LinaModel
from lina_speech_tpu.ops.sampling import topk_sampling
from lina_speech_tpu.ops.tools import undelay_rvq

Array = jnp.ndarray


class GenerateResult(NamedTuple):
    tokens: Array       # (q, b, max_seqlen) sampled (delayed) codec tokens
    stop_mask: Array    # (b, max_seqlen) True where an all-stop was emitted
    lengths: Array      # (b,) 1 + index of first stop (== steps generated)
    att: Optional[Array]  # (b, max_seqlen, heads, m) cross-attention maps or None
    n_steps: Array      # () total decode-loop steps actually executed


def _sample_tokens(key: jax.Array, logits: Array, k: int, temp: float,
                   first_greedy_quant: int,
                   reference_compat: bool = False,
                   approx: bool = True) -> Array:
    """logits: (b, q, l) -> (b, q) int32; top-k for q < first_greedy_quant."""
    b, nq, _ = logits.shape
    cols = []
    for i in range(nq):
        key, sub = jax.random.split(key)
        if i < first_greedy_quant:
            cols.append(topk_sampling(sub, logits[:, i], k=k, temp=temp,
                                      reference_compat=reference_compat,
                                      approx=approx))
        else:
            cols.append(topk_sampling(sub, logits[:, i], k=1))
    return jnp.stack(cols, axis=1)


def _tile_state(model: LinaModel, state, b: int):
    """Duplicate every state leaf along its batch axis (leaf-wise axis
    inference against the b=1 state shapes) — CFG doubles the batch."""
    one = jax.eval_shape(lambda: model.empty_state(1))
    ref = jax.eval_shape(lambda: model.empty_state(b))

    def tile(leaf, l1, lb):
        ax = next(i for i in range(len(lb.shape))
                  if lb.shape[i] == b and l1.shape[i] == 1
                  and lb.shape[:i] + lb.shape[i + 1:]
                  == l1.shape[:i] + l1.shape[i + 1:])
        return jnp.concatenate([leaf, leaf], axis=ax)

    return jax.tree_util.tree_map(tile, state, one, ref)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "max_seqlen", "k", "first_greedy_quant", "temp",
        "force_max_seqlen", "return_att", "reference_compat_sampling",
        "approx_topk", "lazy_window", "weight_quant", "quant_min_size",
        "quant_exclude", "state_quant", "cfg_coef",
    ),
)
def generate_batch(
    model: LinaModel,
    params,
    x: Array,
    key: jax.Array,
    prompt: Optional[Array] = None,
    init_state=None,
    max_seqlen: int = 1000,
    k: int = 100,
    first_greedy_quant: int = 1,
    temp: float = 1.0,
    force_max_seqlen: bool = False,
    return_att: bool = False,
    reference_compat_sampling: bool = False,
    approx_topk: bool = False,
    lazy_window: int = 0,
    weight_quant: Optional[str] = None,
    quant_min_size: int = 1 << 16,
    quant_exclude=None,
    state_quant: Optional[str] = None,
    cfg_coef: Optional[float] = None,
) -> GenerateResult:
    """Generate codec tokens for a batch.

    Args:
        x: (b, m) BPE text ids (already repeated to batch).
        prompt: optional (q, b, p) raw codec codes for voice cloning; offset
            by ``n_special_token_in`` internally (modeling_lina.py:136).
        init_state: optional BackboneState (e.g. from initial-state tuning).
        approx_topk: opt-in TPU-native approximate top-k candidate
            selection (``jax.lax.approx_max_k``, recall ~0.95) for the
            sampled quantizers — the exact sort is a measurable per-step
            cost at 4099 logits, so the perf benches enable this. Default
            False: sampling is exact unless asked (greedy k=1 and
            reference-compat paths are always exact either way).
        weight_quant: "int8" stores the Dense kernels int8 + per-channel
            scales for the TOKEN LOOP only (prefill / text encoding stay
            full precision); QDense routes them through the native int8
            Pallas GEMV (ops/qlinear.py), streaming int8 from HBM — b1
            decode is weights-read-bound, so this raises its bandwidth
            roofline ~2x. Opt-in quality knob.
        quant_min_size: minimum element count for a kernel to be
            quantized (tests lower it so tiny configs qualify).
        quant_exclude: optional hashable ``fn(tree_path) -> bool`` —
            matching kernels stay full precision. Measured knob
            (scripts/quality_w8_sensitivity.py): the SwiGLU FFN and the
            logits head dominate the W8 flip rate while q|k|v|g|o are
            near-lossless; excluding ``logits_weight`` (~1% of weight
            bytes) buys a disproportionate quality win.
        state_quant: "int8" stores the lazy-decode base states int8 with
            per-row scales (requires ``lazy_window > 0``; GLA backbones).
            b64 decode is HBM-bound on the read-only state read (measured
            647 GB/s achievable on v5e), so int8 halves the dominant
            traffic. Opt-in quality knob: states requantize at every
            fold, the scale rides the readout query for free. "int4"
            nibble-packs the state (quarter the bf16 bytes) at 16x the
            int8 quantization error — measured speed AND quality bounds
            in BASELINE.md before reaching for it.
        cfg_coef: opt-in classifier-free guidance (requires a model
            trained with ``mask_text_p > 0``): the batch is doubled with
            the all-mask text and every step samples from
            ``l_uncond + cfg_coef * (l_cond - l_uncond)``. ``cfg_coef=1``
            is exactly the unguided run (tested); >1 sharpens text
            adherence at 2x decode compute.
        lazy_window: > 0 enables lazy micro-chunk decode with that window
            size L (GLA backbones only): recurrent states become READ-ONLY
            between folds, token contributions ride small (L, ...) buffers,
            and one fold per window does the single state read+write — the
            chunked-scan math applied incrementally, mathematically the
            same recurrence. Decode then runs in windows of L tokens
            (early-stop at window granularity).
    """
    b = x.shape[0]
    nq = model.n_quant
    stop_id = 2
    if state_quant is not None and lazy_window <= 0:
        raise ValueError("state_quant requires lazy_window > 0 (the "
                         "read-only base state is what gets quantized)")

    # Classifier-free guidance (opt-in): the model trains with text
    # dropout to a dedicated mask token (mask_text_p, LinaModel.__call__ —
    # reference modeling_lina.py:68-70), so at inference the batch is
    # DOUBLED with the all-mask text and every step's logits are guided
    # l = l_uncond + cfg_coef * (l_cond - l_uncond) (cfg_coef=1 ==
    # unguided exactly; tested). 2x decode compute, opt-in quality knob.
    cfg = cfg_coef is not None
    if cfg:
        if model.mask_text_p <= 0.0:
            raise ValueError("cfg_coef requires a model trained with "
                             "mask_text_p > 0 (no mask token otherwise)")
        x = jnp.concatenate(
            [x, jnp.full_like(x, model.n_txt_vocab - 1)], axis=0)

    def guide(logits):
        """(2b, ...) -> (b, ...) guided logits (identity without CFG)."""
        if not cfg:
            return logits
        lc, lu = logits[:b], logits[b:]
        return (lu + cfg_coef * (lc - lu)).astype(logits.dtype)

    tile = (lambda z: jnp.concatenate([z, z], axis=0)) if cfg \
        else (lambda z: z)

    x_enc = model.apply(params, x, method=LinaModel.encode_text)

    # Pre-cast fp32 params to the compute dtype ONCE, outside the decode
    # loop. The flax modules cast per call; inside the token while_loop
    # that re-converts the full ~359M-param tree every step unless XLA
    # hoists it — pre-casting makes the loop body read the small dtype
    # unconditionally. Numerics: identical wherever modules already cast
    # (Dense/embeddings); norms keep fp32 statistics internally.
    cdt = model.dtype
    if cdt != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(cdt)
            if (hasattr(p, "dtype") and p.dtype == jnp.float32) else p,
            params,
        )

    if weight_quant == "int8":
        from lina_speech_tpu.utils.quantize import quantize_dense_params

        # Dense kernels become {int8_q, int8_s} pairs *in the tree*; QDense
        # (ops/qlinear.py) streams them through the native int8 Pallas GEMV.
        # No traced dequant, no bf16 weight materialization.
        params_q = quantize_dense_params(params, min_size=quant_min_size,
                                         exclude=quant_exclude)
        loop_params = lambda: params_q
    elif weight_quant is not None:
        raise ValueError(f"unknown weight_quant {weight_quant!r}")
    else:
        loop_params = lambda: params

    embed = lambda toks: model.apply(params, toks, method=LinaModel.embed_tokens)
    y_start = jnp.ones((nq, b, 1), jnp.int32)
    y_embd0 = embed(y_start)  # (b, 1, d)

    if init_state is None:
        init_state = model.empty_state(2 * b if cfg else b)
    elif cfg:
        init_state = _tile_state(model, init_state, b)

    # int8/int4 state_quant: have the PREFILL KERNELS *emit* their final
    # states in f32 and cast to the state dtype outside the kernel —
    # in-kernel bf16 emission costs ~13% end-to-end on the int8-state
    # decode (b64 190 vs 218 x-realtime, A/B'd 3x on v5e; an XLA
    # layout/fusion artifact of the fused generate program — the
    # post-cast bf16 value the quantize reads is identical either way,
    # and downstream copies / optimization_barrier round-trips do NOT
    # recover it). XLA schedules the casts at end of prefill, so all
    # layers' f32 emissions stay live at once: gate by the estimated
    # live set — flagship b256 = 12.8 GB fits a 16 GB v5e, b384 =
    # 19.2 GB OOMs (measured); big batches keep in-kernel bf16 emission.
    from lina_speech_tpu.models.gla_layer import GLAState

    sf_emit_dtype = None
    if state_quant is not None and all(
            isinstance(lyr, GLAState) for lyr in init_state.layers):
        sf_gb = 4e-9 * sum(lyr.s.size for lyr in init_state.layers)
        budget = float(os.environ.get("LINA_SF32_BUDGET_GB", "14"))
        if sf_gb <= budget:
            sf_emit_dtype = jnp.float32

    # ---- chunk-parallel prompt prefill ----
    if prompt is not None:
        p_len = prompt.shape[-1]
        prompt_in = embed(prompt.astype(jnp.int32) + model.n_special_token_in)
        if model.spk_encoder is not None:
            spk = model.apply(params, prompt_in, method=lambda m, e: m.spk_encoder(e))
            prompt_in = prompt_in.at[:, 0].set(spk)
        forced = jnp.concatenate([y_embd0, prompt_in], axis=1)  # (b, p+1, d)
    else:
        p_len = 0
        forced = y_embd0

    logits_pre, att_pre, state = model.apply(
        params, tile(forced), x_enc, init_state, return_att=return_att,
        sf_emit_dtype=sf_emit_dtype, method=LinaModel.prefill,
    )  # logits_pre: (b, p+1, q, l) — (2b, ...) under CFG
    logits_pre = guide(logits_pre)
    if return_att and cfg:
        att_pre = att_pre[:b]

    # Sample the recorded predictions for steps 0..p_len (vectorized).
    n_pre = p_len + 1
    keys_pre = jax.random.split(key, n_pre + 1)
    key = keys_pre[0]
    pre_tokens = jax.vmap(
        lambda kk, lg: _sample_tokens(kk, lg, k, temp, first_greedy_quant,
                                      reference_compat_sampling, approx_topk),
        in_axes=(0, 1), out_axes=1,
    )(keys_pre[1:], logits_pre)  # (b, n_pre, q)

    m = x_enc.shape[1]

    # lazy mode decodes whole windows; buffers get the overshoot room and
    # outputs are sliced back to max_seqlen at the end
    L = lazy_window
    if L:
        buf_len = n_pre + -(-(max(max_seqlen - n_pre, 0)) // L) * L
        buf_len = max(buf_len, max_seqlen)
    else:
        buf_len = max_seqlen

    tokens_buf = jnp.zeros((buf_len, b, nq), jnp.int32)
    tokens_buf = jax.lax.dynamic_update_slice_in_dim(
        tokens_buf, pre_tokens.transpose(1, 0, 2)[:max_seqlen], 0, axis=0
    )
    stop_buf = jnp.zeros((buf_len, b), bool)
    pre_stop = jnp.all(pre_tokens == stop_id, axis=-1)  # (b, n_pre)
    stop_buf = jax.lax.dynamic_update_slice_in_dim(
        stop_buf, pre_stop.transpose(1, 0)[:max_seqlen], 0, axis=0
    )

    if return_att:
        att_dim = att_pre.shape[1]  # heads axis of returned attention
        att_buf = jnp.zeros((buf_len, b, att_dim, m), att_pre.dtype)
        att_pre_t = att_pre.transpose(2, 0, 1, 3)  # (n_pre, b, heads, m)
        att_buf = jax.lax.dynamic_update_slice_in_dim(
            att_buf, att_pre_t[:max_seqlen], 0, axis=0
        )
    else:
        att_buf = None

    stopped = jnp.any(pre_stop, axis=1)  # (b,) rows that already emitted stop
    # next input: embedding of the last prefill sample (free-running start)
    y_next = tile(embed(pre_tokens[:, -1].T[:, :, None])[:, 0])  # (b, d)

    class Carry(NamedTuple):
        t: Array
        y_embd: Array
        state: Any
        tokens: Array
        stops: Array
        att: Any
        stopped: Array
        key: Array

    def cond(c: Carry):
        if force_max_seqlen:
            return c.t < max_seqlen
        return jnp.logical_and(c.t < max_seqlen, ~jnp.all(c.stopped))

    def token_step(c: Carry, lazy_p=None) -> Carry:
        lp = loop_params()
        logits, att, state = model.apply(
            lp, c.y_embd, x_enc, c.state, time_step=c.t, lazy_p=lazy_p,
            method=LinaModel.decode_step,
        )
        key, sub = jax.random.split(c.key)
        toks = _sample_tokens(sub, guide(logits), k, temp,
                              first_greedy_quant,
                              reference_compat_sampling, approx_topk)  # (b, q)
        tokens = jax.lax.dynamic_update_index_in_dim(c.tokens, toks, c.t, axis=0)
        is_stop = jnp.all(toks == stop_id, axis=-1)
        stops = jax.lax.dynamic_update_index_in_dim(c.stops, is_stop, c.t, axis=0)
        att_b = c.att
        if return_att:
            att_b = jax.lax.dynamic_update_index_in_dim(c.att, att[:b],
                                                        c.t, axis=0)
        y_embd = tile(model.apply(lp, toks.T[:, :, None],
                                  method=LinaModel.embed_tokens)[:, 0])
        return Carry(c.t + 1, y_embd, state, tokens, stops, att_b,
                     c.stopped | is_stop, key)

    if L:
        from lina_speech_tpu.models.attentive_rnn import (
            add_lazy_buffers, fold_lazy_state,
        )

        state = add_lazy_buffers(state, L, dtype=y_embd0.dtype,
                                 state_quant=state_quant)

        def body(c: Carry) -> Carry:
            # one WINDOW: L lazy steps (base states read-only, loop carries
            # only the small buffers' updates), then one unconditional fold
            c = jax.lax.fori_loop(
                0, L, lambda j, cc: token_step(cc, lazy_p=j), c)
            return c._replace(state=fold_lazy_state(c.state))

    else:
        body = token_step

    init = Carry(jnp.asarray(n_pre), y_next, state, tokens_buf, stop_buf,
                 att_buf, stopped, key)
    out = jax.lax.while_loop(cond, body, init)

    tokens = out.tokens[:max_seqlen].transpose(2, 1, 0)  # (q, b, max_seqlen)
    stop_mask = out.stops[:max_seqlen].transpose(1, 0)  # (b, max_seqlen)
    first_stop = jnp.argmax(stop_mask, axis=1)
    n_steps = jnp.minimum(out.t, max_seqlen)
    lengths = jnp.where(jnp.any(stop_mask, axis=1), first_stop + 1, n_steps)
    att = out.att[:max_seqlen].transpose(1, 0, 2, 3) if return_att else None
    return GenerateResult(tokens, stop_mask, lengths, att, n_steps)


def cut_outputs(result: GenerateResult, n_quant: int, n_special_token_in: int = 3):
    """Host-side per-row trimming (reference modeling_lina.py:181-192).

    Returns a list of (codes (q, 1, len_i), att_i or None) with the delay
    pattern inverted and special-token offset removed.
    """
    qs = np.asarray(result.tokens)
    rvq = np.asarray(undelay_rvq(jnp.asarray(qs))) - n_special_token_in
    rvq = np.clip(rvq, 0, None)
    att = np.asarray(result.att) if result.att is not None else None
    stop = np.asarray(result.stop_mask)
    outs = []
    for i, L in enumerate(np.asarray(result.lengths)):
        # first stop position (reference stop_idx unique()[1],
        # modeling_lina.py:187-191); rows that never stopped use n_steps
        idx = int(L) - 1 if stop[i].any() else int(L)
        end = max(idx - n_quant, 0)
        outs.append(
            (
                rvq[:, [i], :end],
                att[i, :idx] if att is not None else None,
            )
        )
    return outs
