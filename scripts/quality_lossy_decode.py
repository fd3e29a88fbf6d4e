"""Quality bounds for the lossy decode knobs (VERDICT r3 weak #6 / next #5).

Measures, at flagship shapes on hardware (or --tiny on CPU for the test):

1. ``state_quant="int8"`` (the int8 recurrent-state decode behind the b64
   headline): greedy b64 token agreement vs exact bf16, per-row
   first-divergence steps, AND teacher-forced per-step logits deltas along
   the SAME token trajectory (isolates quantization numerics from greedy
   AR trajectory divergence — one flipped argmax forks the suffix).
2. ``approx_topk=True`` (the bench's approx_max_k candidate selection,
   recall ~0.95): step-local candidate recall + TV distance of the
   sampling distribution along the greedy trajectory.
3. ``weight_quant="int8"`` (the b1 decode knob): greedy token agreement
   + per-row first divergence vs the bf16 weights, classic decode path.

Prints one JSON line; record the numbers in BASELINE.md next to the
speedup claims. Reference sampling contract: model/tools.py:38-44.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def forced_decode_logits(model, params, x, tokens, lazy_window, state_quant,
                         weight_quant=None, quant_min_size=1 << 16,
                         quant_exclude=None):
    """Teacher-forced decode along a FIXED (q, b, T) token stream through
    the exact lazy decode path generate_batch uses; returns (T, b, q, l)
    logits. The input at step t is the embedding of tokens[:, :, t-1]
    (step 0 uses the BOS ones vector), mirroring generate.py's loop.
    ``weight_quant="int8"`` quantizes the decode-loop tree like
    generate_batch (text encode + embeddings stay full precision, the
    serving/prefill contract)."""
    import jax
    import jax.numpy as jnp

    from lina_speech_tpu.models.attentive_rnn import (
        add_lazy_buffers, fold_lazy_state,
    )
    from lina_speech_tpu.models.lina import LinaModel

    q, b, T = tokens.shape
    L = lazy_window
    assert L > 0 and T % L == 0, (T, L)

    @jax.jit
    def run(params, x, tokens):
        x_enc = model.apply(params, x, method=LinaModel.encode_text)
        cdt = model.dtype
        if cdt != jnp.float32:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(cdt)
                if (hasattr(p, "dtype") and p.dtype == jnp.float32) else p,
                params)
        if weight_quant == "int8":
            from lina_speech_tpu.utils.quantize import quantize_dense_params

            loop_params = quantize_dense_params(params,
                                                min_size=quant_min_size,
                                                exclude=quant_exclude)
        else:
            loop_params = params
        embed = lambda t: model.apply(params, t,
                                      method=LinaModel.embed_tokens)
        y0 = embed(jnp.ones((q, b, 1), jnp.int32))[:, 0]  # (b, d)
        # conv rings in the compute dtype (generate_batch reaches the
        # decode loop via prefill, whose output rings are already cdt)
        state = add_lazy_buffers(
            model.attentive_rnn.empty_state(b, dtype=y0.dtype), L,
            dtype=y0.dtype, state_quant=state_quant)
        # inputs: BOS embedding then embeddings of tokens[..., :-1]
        ins = jnp.concatenate(
            [y0[None], embed(tokens[:, :, :-1]).transpose(1, 0, 2)], axis=0)

        def window(carry, win):
            state, t = carry
            ins_w, = win

            def step(j, acc):
                state, logits_w = acc
                lg, _, state = model.apply(
                    loop_params, ins_w[j], x_enc, state, time_step=t + j,
                    lazy_p=j, method=LinaModel.decode_step)
                return state, logits_w.at[j].set(lg.astype(jnp.float32))

            logits_w = jnp.zeros((L, b, q, model.n_target_vocab),
                                 jnp.float32)
            state, logits_w = jax.lax.fori_loop(0, L, step,
                                                (state, logits_w))
            return (fold_lazy_state(state), t + L), logits_w

        (_, _), logits = jax.lax.scan(
            window, (state, jnp.asarray(0, jnp.int32)),
            (ins.reshape(T // L, L, *ins.shape[1:]),))
        return logits.reshape(T, b, q, -1)

    return run(params, x, tokens)


def agreement_stats(a: np.ndarray, b: np.ndarray):
    """a, b: (q, batch, T) token streams -> agreement + first divergence."""
    eq = (a == b).all(axis=0)  # (batch, T)
    T = eq.shape[1]
    div = np.where(eq.all(axis=1), T, np.argmin(eq, axis=1))
    return {
        "token_agreement": float((a == b).mean()),
        "rows_identical": float(eq.all(axis=1).mean()),
        "first_divergence_step_median": float(np.median(div)),
        "first_divergence_step_min": int(div.min()),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny config on CPU")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--text-len", type=int, default=32)
    ap.add_argument("--lazy", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--int4", action="store_true",
                    help="also measure state_quant='int4' (greedy + "
                         "teacher-forced arms)")
    args = ap.parse_args(argv)

    if args.cpu or args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from lina_speech_tpu.config import build_model, lina_gla_169m, lina_gla_tiny
    from lina_speech_tpu.generate import generate_batch

    if args.tiny:
        cfg = lina_gla_tiny(compute_dtype="bfloat16")
    else:
        cfg = lina_gla_169m(compute_dtype="bfloat16")
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone,
                                          state_dtype="bfloat16"))
    model = build_model(cfg)

    b, m, T = args.batch, args.text_len, args.steps
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (b, m), 3, cfg.n_txt_vocab)
    xi = x[:2]
    y = jax.random.randint(key, (2, 16, cfg.n_quant), 3, cfg.n_codebook + 3)
    # jit the init: eager init of the 359M model over the axon tunnel takes
    # minutes of per-op RTT (CLAUDE.md); jitted it is one cached program
    params = jax.jit(model.init)(
        jax.random.PRNGKey(1), xi, y, jnp.ones((2, m, m), bool),
        jnp.ones((2, 16, m), bool), jnp.ones((2, 16), bool))

    gen = functools.partial(
        generate_batch, model, params, x, max_seqlen=T,
        force_max_seqlen=True, lazy_window=args.lazy)
    report = {"batch": b, "steps": T, "lazy_window": args.lazy,
              "config": "tiny" if args.tiny else "lina_gla_169m",
              "device": str(jax.devices()[0])}

    # ---- 1. state_quant="int8": greedy agreement vs exact bf16
    t0 = time.perf_counter()
    tok_fp = np.asarray(gen(jax.random.PRNGKey(3), k=1).tokens)
    tok_q = np.asarray(gen(jax.random.PRNGKey(3), k=1,
                           state_quant="int8").tokens)
    report["state_int8_greedy"] = agreement_stats(tok_fp, tok_q)

    # teacher-forced logits deltas along the bf16 trajectory: pure
    # numerics, no AR forking. Both logit tensors STAY on device — at
    # flagship shapes they are ~270 MB each and the axon tunnel fetches
    # ~100 KB/s (CLAUDE.md); only scalar reductions come to the host.
    lg_fp = forced_decode_logits(
        model, params, x, jnp.asarray(tok_fp), args.lazy, None)
    lg_q = forced_decode_logits(
        model, params, x, jnp.asarray(tok_fp), args.lazy, "int8")

    @jax.jit
    def forced_stats(lf, lq):
        d = jnp.abs(lf - lq)
        return (d.mean(), d.max(), jnp.abs(lf).mean(),
                (lf.argmax(-1) != lq.argmax(-1)).mean())

    dm, dx, sc, fl = forced_stats(lg_fp, lg_q)
    report["state_int8_forced"] = {
        "logit_delta_mean": float(dm),
        "logit_delta_max": float(dx),
        "logit_scale_mean_abs": float(sc),
        "argmax_flip_rate": float(fl),
    }

    # ---- 1b. state_quant="int4" (opt-in): same two arms as int8
    if args.int4:
        tok_q4 = np.asarray(gen(jax.random.PRNGKey(3), k=1,
                                state_quant="int4").tokens)
        report["state_int4_greedy"] = agreement_stats(tok_fp, tok_q4)
        lg_q4 = forced_decode_logits(
            model, params, x, jnp.asarray(tok_fp), args.lazy, "int4")
        dm, dx, sc, fl = forced_stats(lg_fp, lg_q4)
        report["state_int4_forced"] = {
            "logit_delta_mean": float(dm),
            "logit_delta_max": float(dx),
            "logit_scale_mean_abs": float(sc),
            "argmax_flip_rate": float(fl),
        }

    # ---- 2. approx_topk: step-local distributional bound. Token-level
    # agreement is meaningless for a sampled path (identical keys drive
    # different-shaped categoricals, and trajectories fork at the first
    # differing sample), so measure what the knob actually changes: the
    # candidate set (recall vs the exact top-k) and the total-variation
    # distance between the two sampling distributions at each step of the
    # bf16 greedy trajectory. NB on CPU approx_max_k falls back to exact
    # (recall 1, tv 0); the flagship numbers must come from TPU.
    kk = min(100, model.n_target_vocab - 4)
    lg = lg_fp[:, :, 0, :]  # sampled quantizer 0: (T, b, l), stays on device

    @jax.jit
    def approx_stats(lg):
        vocab = lg.shape[-1]
        kth = jax.lax.top_k(lg, kk)[0][..., -1:]
        p_e = jax.nn.softmax(jnp.where(lg < kth, -jnp.inf, lg), axis=-1)
        vals, idx = jax.lax.approx_max_k(lg, kk, recall_target=0.95)
        p_c = jax.nn.softmax(vals, axis=-1)
        p_a = jnp.zeros_like(p_e).at[
            jnp.arange(lg.shape[0])[:, None, None],
            jnp.arange(lg.shape[1])[None, :, None], idx].add(p_c)
        tv = 0.5 * jnp.abs(p_e - p_a).sum(-1)
        exact_set = jnp.zeros((*lg.shape[:-1], vocab), bool).at[
            jnp.arange(lg.shape[0])[:, None, None],
            jnp.arange(lg.shape[1])[None, :, None],
            jax.lax.top_k(lg, kk)[1]].set(True)
        in_exact = jnp.take_along_axis(exact_set, idx, axis=-1)
        recall = in_exact.mean(-1)
        # scalar reductions only (the tunnel fetch is the bottleneck)
        return tv.mean(), tv.max(), recall.mean(), recall.min()

    tv_m, tv_x, rc_m, rc_n = approx_stats(lg)
    report[f"approx_topk_k{kk}"] = {
        "tv_distance_mean": float(tv_m),
        "tv_distance_max": float(tv_x),
        "candidate_recall_mean": float(rc_m),
        "candidate_recall_min": float(rc_n),
    }

    # ---- 3. weight_quant="int8": greedy agreement on the classic decode
    # path (b1's knob — lazy loses at b1, so measure what b1 actually runs)
    gen_c = functools.partial(
        generate_batch, model, params, x, max_seqlen=T,
        force_max_seqlen=True, lazy_window=0)
    tok_w = np.asarray(gen_c(jax.random.PRNGKey(3), k=1).tokens)
    tok_wq = np.asarray(gen_c(jax.random.PRNGKey(3), k=1,
                              weight_quant="int8",
                              quant_min_size=1 << 8 if args.tiny
                              else 1 << 16).tokens)
    report["weight_int8_greedy"] = agreement_stats(tok_w, tok_wq)

    # teacher-forced W8 numerics along the same bf16 trajectory — the
    # per-step error behind the fast greedy divergence above
    lg_w = forced_decode_logits(
        model, params, x, jnp.asarray(tok_fp), args.lazy, None,
        weight_quant="int8",
        quant_min_size=1 << 8 if args.tiny else 1 << 16)
    dm, dx, sc, fl = forced_stats(lg_fp, lg_w)
    report["weight_int8_forced"] = {
        "logit_delta_mean": float(dm),
        "logit_delta_max": float(dx),
        "logit_scale_mean_abs": float(sc),
        "argmax_flip_rate": float(fl),
    }

    # W8 with the measured-sensitive groups excluded (quant_exclude knob;
    # attribution: scripts/quality_w8_sensitivity.py — SwiGLU FFN >> head
    # ~ crossatt-v >> q|k|v|g|o). "no_head" costs ~1% of weight bytes.
    def _skip_head(p):
        return p.endswith("logits_weight")

    def _skip_head_ffn(p):
        return (p.endswith("logits_weight")
                or p.split("/")[-2] in ("p_in", "p_out"))

    for nm, excl in (("no_head", _skip_head), ("no_head_ffn", _skip_head_ffn)):
        lg_e = forced_decode_logits(
            model, params, x, jnp.asarray(tok_fp), args.lazy, None,
            weight_quant="int8",
            quant_min_size=1 << 8 if args.tiny else 1 << 16,
            quant_exclude=excl)
        dm, dx, sc, fl = forced_stats(lg_fp, lg_e)
        report[f"weight_int8_forced_{nm}"] = {
            "logit_delta_mean": float(dm),
            "logit_delta_max": float(dx),
            "argmax_flip_rate": float(fl),
        }
    report["wall_s"] = round(time.perf_counter() - t0, 1)

    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
