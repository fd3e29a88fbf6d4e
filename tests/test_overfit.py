"""Convergence E2E: overfit one batch, then greedy decode reproduces it.

This closes the loop the reference only exercises implicitly (train ->
checkpoint -> notebook decode): training on a single fixed batch must drive
the loss near zero AND teacher-free greedy decoding must then emit the
memorized codec tokens for the same text.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.config import build_model, lina_gla_tiny
from lina_speech_tpu.generate import generate_batch
from lina_speech_tpu.train import TrainConfig, create_train_state, make_train_step


def test_overfit_one_batch_then_decode():
    cfg = lina_gla_tiny()
    model = build_model(cfg)
    b, m, n = 2, 7, 24
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (b, m), 3, 256)
    rng = np.random.default_rng(0)
    codes = rng.integers(3, 53, (b, n))  # delayed-token stream incl offset
    y = np.ones((b, n + 2, 1), np.int64)
    y[:, 1:-1, 0] = codes
    y[:, -1, 0] = 2  # stop token
    y = jnp.asarray(y)
    T = y.shape[1]
    batch = {
        "text_token": x,
        "audio_token": y,
        "encoder_mask": jnp.ones((b, m, m), bool),
        "crossatt_mask": jnp.ones((b, T, m), bool),
        "y_mask": jnp.ones((b, T), bool),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(1), x, y,
                                 batch["encoder_mask"], batch["crossatt_mask"],
                                 batch["y_mask"])
    state = create_train_state(
        model, params,
        TrainConfig(learning_rate=3e-3, weight_decay=0.0, n_warmup_steps=10,
                    n_training_steps=300),
    )
    step = make_train_step(model, donate=False)
    loss = None
    for i in range(300):
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        loss = float(metrics["loss"])
        if loss < 0.05:
            break
    assert loss < 0.5, f"failed to overfit: loss={loss}"

    # greedy decode from the trained params must reproduce the target stream
    res = generate_batch(model, state.params, x, jax.random.PRNGKey(3),
                         max_seqlen=T, first_greedy_quant=0,
                         force_max_seqlen=True)
    pred = np.asarray(res.tokens[0])  # (b, T)
    target = np.asarray(y[:, 1:, 0])  # next-token targets
    match = (pred[:, : target.shape[1]] == target).mean()
    assert match > 0.9, f"greedy decode only matched {match:.2%}"
