"""Microbench: int4-packed recurrent state readout vs the shipped int8 /
bf16 lazy steps at flagship b64 shapes (b64 h4 dk256 dv512, 24 layers).

Motivation: b64 lazy decode is HBM-bound; the per-token state read is
~805 MB int8 across 24 layers (31% of the measured 3.95 ms step).
Nibble-packing halves the bytes IF XLA reads the packed array once.
The open question this script answers: does XLA fuse the two
unpack-producers (lo/hi nibble planes) into a single read of the packed
operand, or does each dot re-read it (traffic == int8, no win)?

Layout: pack along dv HALVES (lo plane = S[..., :dv//2], hi plane =
S[..., dv//2:]) so unpack is contiguous (no interleave). Per-(b,h,dk)-row
scale shared by both planes, folded into the readout query like int8
(ops/gla.py:quantize_state_rows).

Harness rules (BASELINE.md round-3 traps): per-layer DISTINCT states,
iteration-dependent operand on the carry, every chain feeds the fetched
scalar, iters >= 100, time by scalar fetch.
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
    ap.add_argument("--L", type=int, default=16)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--iters", type=int, default=128)
    ap.add_argument("--which", type=str, default="bf16,q8,q4")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (smoke/logic check; timings meaningless)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from lina_speech_tpu.ops.gla import (
        gla_decode_lazy_step, gla_decode_lazy_step_q, gla_decode_lazy_step_q4,
        quantize_state_rows, quantize_state_rows_int4,
    )

    b, h, dk, dv, L, NL = args.b, args.h, args.dk, args.dv, args.L, args.layers
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    bf = jnp.bfloat16
    x_q = jax.random.normal(ks[0], (b, h, dk), bf)
    x_k = jax.random.normal(ks[1], (b, h, dk), bf)
    x_v = jax.random.normal(ks[2], (b, h, dv), bf)
    g = -jnp.abs(jax.random.normal(ks[3], (b, h, dk), jnp.float32)) * 0.1
    S = [jax.random.normal(ks[4 + (i % 4)], (b, h, dk, dv), bf) * 0.05
         for i in range(NL)]
    kbuf = [jnp.zeros((L, b, h, dk), bf) for _ in range(NL)]
    vbuf = [jnp.zeros((L, b, h, dv), bf) for _ in range(NL)]
    cbuf = [jnp.zeros((L, b, h, dk), jnp.float32) for _ in range(NL)]
    cc = [jnp.zeros((b, h, dk), jnp.float32) for _ in range(NL)]

    def timed(name, many, *a):
        r = many(*a)
        float(r)
        t0 = time.perf_counter()
        float(many(*a))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:10s}: {dt*1e3:8.3f} ms/token ({NL} layers)"
              f"  = {dt/NL*1e6:6.1f} us/layer-token", flush=True)
        return dt

    def make_many(step_fn, states):
        """states: list of per-layer state operand tuples fed to step_fn."""

        @jax.jit
        def many(x_q, x_k, x_v, g, states, kbuf, vbuf, cbuf, cc):
            def it(carry, i):
                x_q, kbuf, vbuf, cbuf, cc = carry
                acc = jnp.float32(0)
                kb_n, vb_n, cb_n, cc_n = [], [], [], []
                for l in range(NL):
                    o, kb, vb, cb, ccn = step_fn(
                        x_q, x_k, x_v, g, *states[l],
                        kbuf[l], vbuf[l], cbuf[l], cc[l], i % L)
                    acc = acc + o.astype(jnp.float32).sum()
                    kb_n.append(kb); vb_n.append(vb); cb_n.append(cb)
                    cc_n.append(ccn)
                x_q = x_q + (1e-30 * acc).astype(x_q.dtype)
                return (x_q, kb_n, vb_n, cb_n, cc_n), None
            carry, _ = jax.lax.scan(
                it, (x_q, kbuf, vbuf, cbuf, cc), jnp.arange(args.iters))
            return carry[0].astype(jnp.float32).sum()

        return many

    which = args.which.split(",")
    if "bf16" in which:
        st = [(s,) for s in S]
        timed("bf16", make_many(gla_decode_lazy_step, st),
              x_q, x_k, x_v, g, st, kbuf, vbuf, cbuf, cc)
    if "q8" in which:
        st = [quantize_state_rows(s) for s in S]
        timed("int8", make_many(gla_decode_lazy_step_q, st),
              x_q, x_k, x_v, g, st, kbuf, vbuf, cbuf, cc)
    if "q4" in which:
        st = [quantize_state_rows_int4(s) for s in S]
        timed("int4", make_many(gla_decode_lazy_step_q4, st),
              x_q, x_k, x_v, g, st, kbuf, vbuf, cbuf, cc)

    # numerics sanity: q4 reconstruction vs exact on one layer
    from lina_speech_tpu.ops.gla import dequantize_state_int4
    pk, sc = quantize_state_rows_int4(S[0])
    s_rec = dequantize_state_int4(pk, sc)
    err = float(jnp.max(jnp.abs(s_rec - S[0].astype(jnp.float32))))
    rng = float(jnp.max(jnp.abs(S[0].astype(jnp.float32))))
    print(f"int4 recon max-abs-err {err:.5f} on range {rng:.5f} "
          f"(<= half-quantum {rng/14:.5f} expected)")


if __name__ == "__main__":
    main()
