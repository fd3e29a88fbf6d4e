"""Decode-step cost decomposition on the real TPU.

Times (a) raw GLA state update+readout for all layers, fp32 vs bf16 state,
(b) the full model decode step, via on-device fori_loop + scalar fetch
(the axon tunnel makes block_until_ready unreliable and bulk fetches slow).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timeit(tag, fn, *args, iters=64):
    f = jax.jit(fn, static_argnums=())
    float(jnp.sum(f(*args)))  # compile+warm
    t0 = time.perf_counter()
    float(jnp.sum(f(*args)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt*1e3:.3f} ms/iter")
    return dt


def main():
    B, H, DK, DV, LAYERS, ITERS = 64, 4, 256, 512, 25, 64

    for dtype, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        S = jnp.zeros((LAYERS, B, H, DK, DV), dtype)
        q = jnp.ones((B, H, DK), dtype)
        k = jnp.ones((B, H, DK), dtype)
        v = jnp.ones((B, H, DV), dtype)
        g = jnp.full((B, H, DK), -0.05, dtype)

        def loop(S):
            def body(i, carry):
                S, acc = carry
                def upd(Sl):
                    Sl = jnp.exp(g)[..., None] * Sl + k[..., None] * v[..., None, :]
                    o = jnp.einsum("bhk,bhkv->bhv", q, Sl)
                    return Sl, o
                S, o = jax.vmap(upd)(S)  # over layers
                return S, acc + o.sum()
            S, acc = jax.lax.fori_loop(0, ITERS, body, (S, jnp.zeros((), dtype)))
            return acc

        timeit(f"state update+readout x{LAYERS} layers ({tag})", loop, S, iters=ITERS)

    # full model decode step
    from lina_speech_tpu.config import lina_gla_169m, build_model
    from lina_speech_tpu.models.lina import LinaModel

    cfg = lina_gla_169m(compute_dtype="bfloat16")
    model = build_model(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (B, 32), 3, 256)
    y = jax.random.randint(jax.random.PRNGKey(0), (2, 16, 1), 3, 4099)
    params = model.init(jax.random.PRNGKey(1), x[:2], y,
                        jnp.ones((2, 32, 32), bool), jnp.ones((2, 16, 32), bool),
                        jnp.ones((2, 16), bool))
    x_enc = model.apply(params, x, method=LinaModel.encode_text)
    state = model.empty_state(B)
    y_embd = jnp.zeros((B, 1024), jnp.bfloat16)

    def decode_loop(y_embd, state):
        def body(i, carry):
            y_embd, state, acc = carry
            logits, _, state = model.apply(params, y_embd, x_enc, state,
                                           method=LinaModel.decode_step)
            return y_embd, state, acc + logits.sum()
        _, _, acc = jax.lax.fori_loop(0, ITERS, body, (y_embd, state, 0.0))
        return acc

    timeit("full decode_step (169M, b=64)", decode_loop, y_embd, state, iters=ITERS)


if __name__ == "__main__":
    main()
