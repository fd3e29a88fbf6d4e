"""Speaker-encoder wiring: config-built model consumes the window and writes
the speaker vector into frame 0 (reference modeling_lina.py:79-81)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.config import SpeakerEncoderConfig, build_model, lina_gla_tiny


def test_spk_encoder_in_forward():
    cfg = lina_gla_tiny()
    cfg = dataclasses.replace(
        cfg, spk_encoder=SpeakerEncoderConfig(dim_inner=32, heads=2, n_layers=1,
                                              window_length=8),
    )
    model = build_model(cfg)
    b, m, n = 2, 7, 17
    x = jax.random.randint(jax.random.PRNGKey(0), (b, m), 3, 256)
    y = jax.random.randint(jax.random.PRNGKey(1), (b, n, 1), 3, 53)
    em = jnp.ones((b, m, m), bool)
    cm = jnp.ones((b, n, m), bool)
    lm = jnp.ones((b, n), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(2), x, y, em, cm, lm)
    assert "spk_encoder" in params["params"]
    logits, loss, _ = model.apply(params, x, y, em, cm, lm)
    assert np.isfinite(float(loss))

    # speaker vector must influence the loss (it overwrites y_embd[:, 0])
    import flax

    p2 = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else dict(params)
    leaf = jax.tree_util.tree_leaves(params["params"]["spk_encoder"])[0]
    mutated = jax.tree_util.tree_map(lambda v: v, params)
    mutated["params"]["spk_encoder"] = jax.tree_util.tree_map(
        lambda v: v + 1.0, params["params"]["spk_encoder"]
    )
    _, loss2, _ = model.apply(mutated, x, y, em, cm, lm)
    assert not np.isclose(float(loss), float(loss2))
