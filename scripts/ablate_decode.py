"""Decode-step cost decomposition at batch 64 on the real TPU.

Times each component of the per-token decode step in an on-device
fori_loop (scalar-fetch timing; the axon tunnel makes block_until_ready
unreliable): the fused conv+GLA kernel across all layers, the projection
GEMMs, the cross-attention, the logits head + sampling, and the full
model step. Identifies what bounds aggregate realtime at b64.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

B = int(os.environ.get("AB_B", "64"))
ITERS = int(os.environ.get("AB_ITERS", "64"))
H, DK, DV, D, LAYERS = 4, 256, 512, 1024, 25


def timeit(tag, make_loop, *args):
    f = jax.jit(make_loop)
    float(jnp.sum(f(*args)))  # compile+warm
    t0 = time.perf_counter()
    float(jnp.sum(f(*args)))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{tag}: {dt*1e3:.3f} ms/token-step", flush=True)
    return dt


def main():
    from lina_speech_tpu.ops.gla_pallas import gla_decode_conv_fused

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    # ---- (a) conv-fused kernel x LAYERS
    WQ = jnp.ones((4, H, DK), dt) * 0.1
    WV = jnp.ones((4, H, DV), dt) * 0.1
    xq = jnp.ones((B, H, DK), dt)
    xv = jnp.ones((B, H, DV), dt)
    g = jnp.full((B, H, DK), -0.05, dt)

    S = tuple(jnp.zeros((B, H, DK, DV), dt) for _ in range(LAYERS))
    CQ = tuple(jnp.zeros((4, B, H, DK), dt) for _ in range(LAYERS))
    CK = tuple(jnp.zeros((4, B, H, DK), dt) for _ in range(LAYERS))
    CV = tuple(jnp.zeros((4, B, H, DV), dt) for _ in range(LAYERS))

    def kern_loop(S, CQ, CK, CV):
        def body(i, carry):
            S, CQ, CK, CV, acc = carry
            outs = []
            for l in range(LAYERS):
                o, s, cq, ck, cv = gla_decode_conv_fused(
                    xq, xq, xv, g, WQ, WQ, WV, CQ[l], CK[l], CV[l], S[l],
                    donate=False)
                outs.append((s, cq, ck, cv, o))
            S = tuple(o[0] for o in outs)
            CQ = tuple(o[1] for o in outs)
            CK = tuple(o[2] for o in outs)
            CV = tuple(o[3] for o in outs)
            # EVERY layer's output must feed acc: the 25 chains are
            # independent here, and anything dead gets DCE'd by XLA
            # (first version summed only the last layer and measured 1/25th
            # of the work)
            osum = sum(o[-1].sum() for o in outs)
            return S, CQ, CK, CV, acc + osum
        out = jax.lax.fori_loop(0, ITERS, body, (S, CQ, CK, CV,
                                                 jnp.zeros((), jnp.float32)))
        # final states feed the result too, keeping the state chains live
        return out[-1] + sum(s[0, 0, 0, 0].astype(jnp.float32) for s in out[0])

    timeit(f"conv-fused kernel x{LAYERS} (b={B})", kern_loop, S, CQ, CK, CV)

    # ---- (b) projection GEMMs x LAYERS (q+k+v+g fused in, o out per layer)
    key_dim, value_dim = H * DK, H * DV
    Win = jnp.ones((LAYERS, D, 2 * key_dim + 2 * value_dim), dt)
    Wo = jnp.ones((LAYERS, value_dim, D), dt)

    def proj_loop(x):
        def body(i, carry):
            x, acc = carry
            def one(win, wo):
                qkvg = x @ win
                o = qkvg[:, :value_dim] @ wo
                return qkvg.sum() + o.sum()
            s = jax.vmap(one)(Win, Wo)
            return x, acc + s.sum()
        return jax.lax.fori_loop(0, ITERS, body, (x, jnp.zeros((), jnp.float32)))[1]

    timeit(f"projection GEMMs x{LAYERS} (b={B})", proj_loop,
           jnp.ones((B, D), dt))

    # ---- model init (for head/sampling/full-step probes)
    from lina_speech_tpu.config import lina_gla_169m, build_model
    from lina_speech_tpu.models.lina import LinaModel

    cfg = lina_gla_169m(compute_dtype="bfloat16")
    model = build_model(cfg)
    x = jax.random.randint(key, (B, 32), 3, 256)
    y = jax.random.randint(key, (2, 16, 1), 3, 4099)
    params = model.init(jax.random.PRNGKey(1), x[:2], y,
                        jnp.ones((2, 32, 32), bool), jnp.ones((2, 16, 32), bool),
                        jnp.ones((2, 16), bool))
    x_enc = model.apply(params, x, method=LinaModel.encode_text)
    state = model.empty_state(B)
    y_embd = jnp.zeros((B, 1024), jnp.bfloat16)


    # ---- logits head + embed only
    def head_loop(y_embd):
        def body(i, carry):
            y_embd, acc = carry
            logits = model.apply(params, y_embd[:, None, :],
                                 method=lambda m, z: m._head(z))
            return y_embd, acc + logits.sum()
        return jax.lax.fori_loop(0, ITERS, body,
                                 (y_embd, jnp.zeros((), jnp.float32)))[1]

    try:
        timeit(f"logits head (b={B})", head_loop, y_embd)
    except Exception as e:
        print("logits head: skipped:", e)

    # ---- sampling (top-k 100 over 4099) + embed, the generate-loop extras
    from lina_speech_tpu.generate import _sample_tokens
    from lina_speech_tpu.models.lina import LinaModel as _LM

    logits = jax.random.normal(key, (B, 1, 4099), jnp.float32)

    def sample_loop(logits):
        def body(i, carry):
            logits, acc = carry
            kk = jax.random.fold_in(jax.random.PRNGKey(7), i)
            toks = _sample_tokens(kk, logits, 100, 1.0, 1)
            emb = model.apply(params, toks.T[:, :, None],
                              method=_LM.embed_tokens)
            return logits, acc + emb.sum()
        return jax.lax.fori_loop(0, ITERS, body,
                                 (logits, jnp.zeros((), jnp.bfloat16)))[1]

    timeit(f"top-k sample + embed (b={B})", sample_loop, logits)

    # ---- full decode_step (AB_FULL=1 to enable: this fori_loop program
    # has repeatedly broken the axon remote-compile tunnel mid-compile;
    # bench.py's generate program measures the full step reliably)
    if os.environ.get("AB_FULL", "0") == "1":
        def full_loop(y_embd, state):
            def body(i, carry):
                y_embd, state, acc = carry
                logits, _, state = model.apply(params, y_embd, x_enc, state,
                                               method=LinaModel.decode_step)
                return y_embd, state, acc + logits.sum()
            _, _, acc = jax.lax.fori_loop(0, ITERS, body,
                                          (y_embd, state, jnp.zeros((), jnp.float32)))
            return acc

        timeit(f"full decode_step (b={B})", full_loop, y_embd, state)


if __name__ == "__main__":
    main()
