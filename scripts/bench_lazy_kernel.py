"""Microbench the lazy decode step/fold kernels vs the XLA lazy path at
flagship b64 shapes (25 layers back-to-back, iters >= 100, scalar fetch;
every chain feeds the fetched scalar so XLA can't DCE the work).

Roofline per layer per token (b64 h4 dk256 dv512, bf16 S):
  S read 67.1 MB + buf read ~5 MB + slice writes ~1 MB ~= 73 MB
  -> 89 us at 819 GB/s -> 2.23 ms for 25 layers.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--h", type=int, default=4)
    ap.add_argument("--dk", type=int, default=256)
    ap.add_argument("--dv", type=int, default=512)
    ap.add_argument("--w", type=int, default=4)
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--layers", type=int, default=25)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--which", type=str, default="fused,xla,fold")
    args = ap.parse_args()

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from lina_speech_tpu.ops.gla_pallas import (
        gla_decode_lazy_conv_fused, gla_fold_fused,
    )

    b, h, dk, dv, w, L, NL = (args.b, args.h, args.dk, args.dv, args.w,
                              args.L, args.layers)
    ks = jax.random.split(jax.random.PRNGKey(0), 16)
    bf = jnp.bfloat16
    x_q = jax.random.normal(ks[0], (b, h, dk), bf)
    x_k = jax.random.normal(ks[1], (b, h, dk), bf)
    x_v = jax.random.normal(ks[2], (b, h, dv), bf)
    g = -jnp.abs(jax.random.normal(ks[3], (b, h, dk), jnp.float32)) * 0.1
    wq = jax.random.normal(ks[4], (w, h, dk), bf) * 0.2
    wk = jax.random.normal(ks[5], (w, h, dk), bf) * 0.2
    wv = jax.random.normal(ks[6], (w, h, dv), bf) * 0.2
    cq = jnp.zeros((w, b, h, dk), bf)
    ck = jnp.zeros((w, b, h, dk), bf)
    cv = jnp.zeros((w, b, h, dv), bf)
    # one state PER LAYER, as DISTINCT arrays (a stacked (NL, ...) array
    # makes XLA materialize a 67 MB S[l] copy before every pallas call;
    # sharing ONE S lets XLA read it once per token and fake a 25x
    # speedup — both measured, both wrong vs the real per-layer pytree)
    S = [jax.random.normal(ks[7], (b, h, dk, dv), bf) * 0.05
         for _ in range(NL)]
    kbuf = [jnp.zeros((L, b, h, dk), bf) for _ in range(NL)]
    vbuf = [jnp.zeros((L, b, h, dv), bf) for _ in range(NL)]
    cbuf = [jnp.zeros((L, b, h, dk), jnp.float32) for _ in range(NL)]
    cc = [jnp.zeros((b, h, dk), jnp.float32) for _ in range(NL)]

    def timed(name, many, *a, per="layer-token"):
        r = many(*a)
        float(r)
        t0 = time.perf_counter()
        float(many(*a))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:14s}: {dt*1e3:8.3f} ms/token ({NL} layers)"
              f"  = {dt/NL*1e6:6.1f} us/{per}", flush=True)
        return dt

    which = args.which.split(",")

    if "fused" in which:
        cqs = [cq for _ in range(NL)]
        cks = [ck for _ in range(NL)]
        cvs = [cv for _ in range(NL)]

        @jax.jit
        def many_fused(x_q, x_k, x_v, g, cqs, cks, cvs, S,
                       kbuf, vbuf, cbuf, cc):
            def it(carry, i):
                x_q, cqs, cks, cvs, kbuf, vbuf, cbuf, cc = carry
                acc = jnp.float32(0)
                nxt = [[], [], [], [], [], [], []]
                for l in range(NL):
                    o, cqn, ckn, cvn, kb, vb, cb, ccn = \
                        gla_decode_lazy_conv_fused(
                            x_q, x_k, x_v, g, wq, wk, wv,
                            cqs[l], cks[l], cvs[l], S[l], kbuf[l], vbuf[l],
                            cbuf[l], cc[l], i % L, donate=True)
                    acc = acc + o.astype(jnp.float32).sum()
                    for dst, val in zip(nxt, (cqn, ckn, cvn, kb, vb, cb, ccn)):
                        dst.append(val)
                x_q = x_q + (1e-30 * acc).astype(x_q.dtype)
                return (x_q, *nxt), None
            carry, _ = jax.lax.scan(
                it, (x_q, cqs, cks, cvs, kbuf, vbuf, cbuf, cc),
                jnp.arange(args.iters))
            return carry[0].astype(jnp.float32).sum()

        timed("fused-step", many_fused, x_q, x_k, x_v, g, cqs, cks, cvs,
              S, kbuf, vbuf, cbuf, cc)

    if "xla" in which:
        from lina_speech_tpu.ops.gla import gla_decode_lazy_step
        from lina_speech_tpu.ops.short_conv import short_conv_step

        taps = lambda m, d: m.transpose(1, 2, 0).reshape(h * d, w)
        wq2, wk2, wv2 = taps(wq, dk), taps(wk, dk), taps(wv, dv)

        @jax.jit
        def many_xla(x_q, x_k, x_v, g, cq, ck, cv, S, kbuf, vbuf, cbuf, cc):
            mrg = lambda z, d: z.reshape(z.shape[0], b, h * d)
            cq2, ck2, cv2 = mrg(cq, dk), mrg(ck, dk), mrg(cv, dv)

            def it(carry, i):
                x_q, kbuf, vbuf, cbuf, cc = carry
                acc = jnp.float32(0)
                kb_n, vb_n, cb_n, cc_n = [], [], [], []
                for l in range(NL):
                    q, _ = short_conv_step(x_q.reshape(b, h * dk), cq2, wq2)
                    k, _ = short_conv_step(x_k.reshape(b, h * dk), ck2, wk2)
                    v, _ = short_conv_step(x_v.reshape(b, h * dv), cv2, wv2)
                    o, kb, vb, cb, ccn = gla_decode_lazy_step(
                        q.reshape(b, h, dk), k.reshape(b, h, dk),
                        v.reshape(b, h, dv), g, S[l], kbuf[l], vbuf[l],
                        cbuf[l], cc[l], i % L)
                    acc = acc + o.astype(jnp.float32).sum()
                    kb_n.append(kb); vb_n.append(vb); cb_n.append(cb)
                    cc_n.append(ccn)
                x_q = x_q + (1e-30 * acc).astype(x_q.dtype)
                return (x_q, kb_n, vb_n, cb_n, cc_n), None
            carry, _ = jax.lax.scan(
                it, (x_q, kbuf, vbuf, cbuf, cc),
                jnp.arange(args.iters))
            return carry[0].astype(jnp.float32).sum()

        timed("xla-step", many_xla, x_q, x_k, x_v, g, cq, ck, cv, S,
              kbuf, vbuf, cbuf, cc)

    if "fusedq" in which:
        from lina_speech_tpu.ops.gla import quantize_state_rows
        from lina_speech_tpu.ops.gla_pallas import gla_fold_fused_q

        Sq, Ssc = zip(*(quantize_state_rows(s) for s in S))
        Sq, Ssc = list(Sq), list(Ssc)
        cqs = [cq for _ in range(NL)]
        cks = [ck for _ in range(NL)]
        cvs = [cv for _ in range(NL)]

        @jax.jit
        def many_fq(x_q, x_k, x_v, g, cqs, cks, cvs, Sq, Ssc,
                    kbuf, vbuf, cbuf, cc):
            def it(carry, i):
                x_q, cqs, cks, cvs, kbuf, vbuf, cbuf, cc = carry
                acc = jnp.float32(0)
                nxt = [[], [], [], [], [], [], []]
                for l in range(NL):
                    o, cqn, ckn, cvn, kb, vb, cb, ccn = \
                        gla_decode_lazy_conv_fused(
                            x_q, x_k, x_v, g, wq, wk, wv,
                            cqs[l], cks[l], cvs[l], Sq[l], kbuf[l], vbuf[l],
                            cbuf[l], cc[l], i % L, donate=True,
                            s_scale=Ssc[l])
                    acc = acc + o.astype(jnp.float32).sum()
                    for dst, val in zip(nxt, (cqn, ckn, cvn, kb, vb, cb, ccn)):
                        dst.append(val)
                x_q = x_q + (1e-30 * acc).astype(x_q.dtype)
                return (x_q, *nxt), None
            carry, _ = jax.lax.scan(
                it, (x_q, cqs, cks, cvs, kbuf, vbuf, cbuf, cc),
                jnp.arange(args.iters))
            return carry[0].astype(jnp.float32).sum()

        timed("fused-step-q8", many_fq, x_q, x_k, x_v, g, cqs, cks, cvs,
              Sq, Ssc, kbuf, vbuf, cbuf, cc)

    if "foldq" in which:
        from lina_speech_tpu.ops.gla import quantize_state_rows
        from lina_speech_tpu.ops.gla_pallas import gla_fold_fused_q

        kb1 = jax.random.normal(ks[8], (L, b, h, dk), bf)
        vb1 = jax.random.normal(ks[9], (L, b, h, dv), bf)
        cb1 = -jnp.abs(jax.random.normal(ks[10], (L, b, h, dk),
                                         jnp.float32)) * 0.1
        Sq, Ssc = zip(*(quantize_state_rows(s) for s in S))

        @jax.jit
        def many_foldq(Sq, Ssc, kb1, vb1, cb1, cc):
            def it(carry, _):
                Sq, Ssc = carry
                out = [gla_fold_fused_q(Sq[l], Ssc[l], kb1, vb1, cb1,
                                        cc[l] - 0.05, donate=True)
                       for l in range(NL)]
                return (tuple(o[0] for o in out),
                        tuple(o[1] for o in out)), None
            carry, _ = jax.lax.scan(it, (tuple(Sq), tuple(Ssc)), None,
                                    length=args.iters)
            return sum(s.astype(jnp.float32).sum() for s in carry[0])

        timed("fused-fold-q8", many_foldq, tuple(Sq), tuple(Ssc), kb1, vb1,
              cb1, cc, per="layer-fold")

    if "bw" in which:
        _bw_probe(args, S, NL)

    if "xlafold" in which:
        from lina_speech_tpu.ops.gla import gla_decode_lazy_fold

        kb1 = jax.random.normal(ks[8], (L, b, h, dk), bf)
        vb1 = jax.random.normal(ks[9], (L, b, h, dv), bf)
        cb1 = -jnp.abs(jax.random.normal(ks[10], (L, b, h, dk),
                                         jnp.float32)) * 0.1

        @jax.jit
        def many_xfold(S, kb1, vb1, cb1, cc):
            def it(S, _):
                S = [gla_decode_lazy_fold(S[l], kb1, vb1, cb1,
                                          cc[l] - 0.05)
                     for l in range(NL)]
                return S, None
            S, _ = jax.lax.scan(it, S, None, length=args.iters)
            return sum(s.astype(jnp.float32).sum() for s in S)

        timed("xla-fold", many_xfold, S, kb1, vb1, cb1, cc,
              per="layer-fold")

    if "fold" in which:
        kb1 = jax.random.normal(ks[8], (L, b, h, dk), bf)
        vb1 = jax.random.normal(ks[9], (L, b, h, dv), bf)
        cb1 = -jnp.abs(jax.random.normal(ks[10], (L, b, h, dk),
                                         jnp.float32)) * 0.1

        @jax.jit
        def many_fold(S, kb1, vb1, cb1, cc):
            def it(S, _):
                S = [gla_fold_fused(S[l], kb1, vb1, cb1, cc[l] - 0.05,
                                    donate=True)
                     for l in range(NL)]
                return S, None
            S, _ = jax.lax.scan(it, S, None, length=args.iters)
            return sum(s.astype(jnp.float32).sum() for s in S)

        timed("fused-fold", many_fold, S, kb1, vb1, cb1, cc,
              per="layer-fold")


def _bw_probe(args, S, NL):
    """Pure-read bandwidth: sum-reduce each layer's S (write ~nothing)."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(i_ref, s_ref, o_ref):
        o_ref[:] = jnp.sum(s_ref[:].astype(jnp.float32), axis=1) + i_ref[0, 0]

    b, h, dk, dv = S[0].shape
    bh = b * h
    blk = 8

    def rd(s, it):
        # the iteration-dependent operand defeats loop-invariant code
        # motion (without it XLA hoists the whole read out of the scan and
        # reports 4900 GB/s)
        s2 = s.reshape(bh, dk, dv)
        return pl.pallas_call(
            kern,
            grid=(bh // blk,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((blk, dk, dv), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((blk, dv), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, dv), jnp.float32),
        )(it.reshape(1, 1).astype(jnp.float32), s2).sum()

    @jax.jit
    def many(S):
        def it(acc, i):
            for l in range(NL):
                acc = acc + rd(S[l], i)
            return acc, None
        acc, _ = jax.lax.scan(it, jnp.float32(0), jnp.arange(args.iters))
        return acc

    import time
    float(many(S))
    t0 = time.perf_counter()
    float(many(S))
    dt = (time.perf_counter() - t0) / args.iters / NL
    gb = b * h * dk * dv * S[0].dtype.itemsize / 1e9
    print(f"bw-probe      : {dt*1e6:8.1f} us/layer-read of {gb*1e3:.1f} MB"
          f"  -> {gb/dt:.0f} GB/s pure-read", flush=True)


if __name__ == "__main__":
    main()
