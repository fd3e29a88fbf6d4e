"""Long-horizon bf16-state decode drift: output stays close to fp32 over
hundreds of steps (evidence for the bf16 decode-state default in bench)."""
import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.ops.gla import gla_decode_step


def test_bf16_state_drift_bounded_over_300_steps():
    steps, dk, dv = 300, 16, 24
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (1, 1, steps, dk))
    k = jax.random.normal(ks[1], (1, 1, steps, dk))
    v = jax.random.normal(ks[2], (1, 1, steps, dv))
    gk = jax.nn.log_sigmoid(jax.random.normal(ks[3], (1, 1, steps, dk))) / 16

    def run(dtype):
        def body(state, i):
            o, state = gla_decode_step(q[:, :, i], k[:, :, i], v[:, :, i],
                                       gk[:, :, i], state)
            return state, o
        s0 = jnp.zeros((1, 1, dk, dv), dtype)
        _, o = jax.lax.scan(body, s0, jnp.arange(steps))
        return o.astype(jnp.float32)

    o32 = run(jnp.float32)
    o16 = run(jnp.bfloat16)
    # relative error of the LAST 50 outputs (worst case: accumulated drift)
    tail32, tail16 = o32[-50:], o16[-50:]
    rel = float(jnp.abs(tail32 - tail16).max() / jnp.abs(tail32).max())
    assert rel < 0.05, f"bf16 state drift too large: {rel:.4f}"
