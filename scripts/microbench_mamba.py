"""Mamba selective-scan: Pallas kernel vs XLA associative scan on real TPU.

Hardware parity (value + grads vs the XLA path) + in-jit timing at the
flagship-variant shapes (B8 T512 d2048 n16). Timing via scalar fetch with
enough iterations to amortize the axon tunnel's ~40 ms fetch RTT.
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
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--d", type=int, default=2048)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from lina_speech_tpu.ops.mamba import selective_scan

    b, t, d, n = args.b, args.t, args.d, args.n
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (b, t, d), jnp.bfloat16)
    dt = jax.nn.softplus(jax.random.normal(ks[1], (b, t, d)) - 1.0)
    A = -jnp.exp(jax.random.normal(ks[2], (d, n)) * 0.3)
    B = jax.random.normal(ks[3], (b, t, n), jnp.bfloat16)
    C = jax.random.normal(ks[4], (b, t, n), jnp.bfloat16)
    D = jax.random.normal(ks[5], (d,))

    def loss(mode, x, dt, A, B, C, D):
        y, s = selective_scan(x, dt, A, B, C, D, mode=mode)
        return (y.astype(jnp.float32) ** 2).sum() + (s ** 2).sum()

    # ---- hardware parity (value + grads)
    lp = float(jax.jit(lambda *a: loss("pallas", *a))(x, dt, A, B, C, D))
    ls = float(jax.jit(lambda *a: loss("scan", *a))(x, dt, A, B, C, D))
    print(f"value rel diff vs XLA scan: {abs(lp - ls) / abs(ls):.2e}")
    gp = jax.jit(jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 5)))(
        x, dt, A, B, C, D)
    gs = jax.jit(jax.grad(lambda *a: loss("scan", *a), argnums=(0, 1, 2, 5)))(
        x, dt, A, B, C, D)
    for nm, a_, b_ in zip(["dx", "ddt", "dA", "dD"], gp, gs):
        num = float(jnp.abs(a_.astype(jnp.float32) - b_.astype(jnp.float32)).max())
        den = max(float(jnp.abs(b_.astype(jnp.float32)).max()), 1e-6)
        print(f"grad {nm}: max rel err {num / den:.2e}")
    print("hardware parity OK")

    # ---- timing (in-jit loop, data dependency blocks DCE)
    def timed(mode, with_grad):
        @jax.jit
        def many(x, dt, A, B, C, D):
            def step(carry, _):
                xc, acc = carry
                if with_grad:
                    g = jax.grad(lambda *a: loss(mode, *a), argnums=(0,))(
                        xc, dt, A, B, C, D)[0]
                    tot = g.astype(jnp.float32).sum()
                else:
                    tot = loss(mode, xc, dt, A, B, C, D)
                xc = xc + (1e-30 * tot).astype(xc.dtype)
                return (xc, acc + tot), None
            (xc, acc), _ = jax.lax.scan(step, (x, jnp.float32(0)), None,
                                        length=args.iters)
            return acc

        float(many(x, dt, A, B, C, D))  # compile + warm
        t0 = time.perf_counter()
        float(many(x, dt, A, B, C, D))
        dtime = (time.perf_counter() - t0) / args.iters
        tag = "fwd+bwd" if with_grad else "fwd"
        print(f"{mode:6s} {tag:7s}: {dtime * 1e3:7.3f} ms "
              f"({b}x{t}x{d}/{n})")

    for mode in ("pallas", "scan"):
        for wg in (False, True):
            timed(mode, wg)


if __name__ == "__main__":
    main()
