"""Probe: lazy-decode readout cost vs the state-READ roofline (real TPU).

The b64 decode default path reads the (b, h, dk, dv) bf16 state every token
(read-only between folds). BASELINE r2 put the conv-fused classic kernel at
~2.7x its DMA roofline ("VPU-convert-bound"); this probe isolates the LAZY
step's readout and compares implementations:

  a) current gla_decode_lazy_step (S cast to f32 inside the einsum)
  b) bf16-MXU variant: scaled q cast to bf16, S consumed bf16 directly
     (no f32 state materialization), f32 accumulate
  c) S-read floor: a single pass that must read S once (sum reduce)

All timed as 25-layer vmapped ops inside an on-device fori_loop; every
chain feeds the fetched scalar so nothing DCEs (CLAUDE.md gotcha).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from lina_speech_tpu.ops.gla import gla_decode_lazy_step

B, H, DK, DV, LAYERS, L = 64, 4, 256, 512, 25, 8
ITERS = int(os.environ.get("ITERS", "128"))


def timeit(tag, fn, *args):
    f = jax.jit(fn)
    float(jnp.sum(f(*args)))  # compile+warm
    t0 = time.perf_counter()
    float(jnp.sum(f(*args)))
    dt = (time.perf_counter() - t0) / ITERS
    gbps = (LAYERS * B * H * DK * DV * 2) / dt / 1e9
    print(f"{tag}: {dt*1e3:.3f} ms/token-all-layers  ({gbps:.0f} GB/s S-read)")
    return dt


def main():
    print(f"device: {jax.devices()[0]}, iters={ITERS}")
    key = jax.random.PRNGKey(0)
    S = jax.random.normal(key, (LAYERS, B, H, DK, DV), jnp.bfloat16)
    q = jax.random.normal(key, (LAYERS, B, H, DK), jnp.bfloat16)
    k = jax.random.normal(key, (LAYERS, B, H, DK), jnp.bfloat16)
    v = jax.random.normal(key, (LAYERS, B, H, DV), jnp.bfloat16)
    g = jnp.full((LAYERS, B, H, DK), -0.05, jnp.float32)
    kbuf = jax.random.normal(key, (LAYERS, L, B, H, DK), jnp.bfloat16)
    vbuf = jax.random.normal(key, (LAYERS, L, B, H, DV), jnp.bfloat16)
    cbuf = jnp.cumsum(-jnp.abs(jax.random.normal(key, (LAYERS, L, B, H, DK))),
                      axis=1).astype(jnp.float32)
    cc = cbuf[:, -1] - 0.05

    # NOTE on loop hygiene: the small operand (q) is perturbed by the carry
    # each iteration so XLA cannot hoist the S-consuming work out of the
    # loop (CLAUDE.md: ablation chains must feed the fetched scalar).
    def perturb(x, acc):
        return x + (acc * 1e-30).astype(x.dtype)

    # a) current lazy step at window position p=L-1 (worst case: all slots live)
    def cur(S, kbuf, vbuf, cbuf, cc):
        def body(i, acc):
            qd = perturb(q, acc)
            def one(args):
                Sl, kb, vb, cb, ccl, ql, kl, vl, gl = args
                o, *_ = gla_decode_lazy_step(ql, kl, vl, gl, Sl, kb, vb, cb,
                                             ccl, jnp.int32(L - 1))
                return o
            o = jax.vmap(one)((S, kbuf, vbuf, cbuf, cc, qd, k, v, g))
            return acc + o.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

    # b) bf16-MXU readout: no f32 materialization of S
    def bf16mxu(S, kbuf, vbuf, cbuf, cc):
        scale = DK ** -0.5
        def body(i, acc):
            qd = perturb(q, acc)
            ccn = cc + g
            qs = (qd.astype(jnp.float32) * scale * jnp.exp(ccn)).astype(jnp.bfloat16)
            o = jnp.einsum("lbhk,lbhkv->lbhv", qs, S,
                           preferred_element_type=jnp.float32)
            w = jnp.exp(jnp.minimum(ccn[:, None] - cbuf, 0.0))
            a = jnp.einsum("lbhk,lwbhk->lwbh",
                           (qd.astype(jnp.float32) * scale).astype(jnp.bfloat16),
                           (kbuf.astype(jnp.float32) * w).astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            o = o + jnp.einsum("lwbh,lwbhv->lbhv", a.astype(jnp.bfloat16),
                               vbuf, preferred_element_type=jnp.float32)
            return acc + o.sum()
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

    # c) floor: one mandatory read of S (scaled by a carry-dependent factor
    # so the reduce cannot be hoisted; the multiply fuses into the reduce)
    def floor(S):
        def body(i, acc):
            f = (1.0 + acc * 1e-30)
            return acc + jnp.sum(S.astype(jnp.float32) * f)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

    timeit("a) current lazy step (f32 cast)", cur, S, kbuf, vbuf, cbuf, cc)
    timeit("b) bf16-MXU readout          ", bf16mxu, S, kbuf, vbuf, cbuf, cc)
    timeit("c) S single-read floor       ", floor, S)


if __name__ == "__main__":
    main()
