"""Generation engine tests: shapes, stopping, prompt prefill parity, cutting."""
import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.generate import generate_batch, cut_outputs
from lina_speech_tpu.models import LinaModel

from test_model import make_model, model_and_params


def test_generate_shapes_and_stop():
    model, params, (x, *_rest) = model_and_params()
    b, m, n_quant = 2, 7, 2
    res = generate_batch(
        model, params, x, jax.random.PRNGKey(3), max_seqlen=12, k=5,
    )
    assert res.tokens.shape == (n_quant, b, 12)
    assert res.stop_mask.shape == (b, 12)
    assert res.lengths.shape == (b,)
    assert int(res.n_steps) <= 12
    cuts = cut_outputs(res, n_quant=n_quant)
    assert len(cuts) == b


def test_generate_with_prompt_and_att():
    model, params, (x, *_rest) = model_and_params()
    b, m, n_quant, p = 2, 7, 2, 5
    prompt = jax.random.randint(jax.random.PRNGKey(4), (n_quant, b, p), 0, 50)
    res = generate_batch(
        model, params, x, jax.random.PRNGKey(3), prompt=prompt,
        max_seqlen=16, k=5, return_att=True, force_max_seqlen=True,
    )
    assert int(res.n_steps) == 16
    assert res.att is not None
    assert res.att.shape == (b, 16, 2, m)  # blind cross-att: 2 passes


def test_prompt_prefill_matches_stepwise():
    """Chunk-parallel prompt prefill must equal feeding the prompt step-by-step
    (greedy sampling so PRNG plays no role)."""
    model, params, _ = model_and_params()
    b, m, n_quant, p = 1, 7, 2, 6
    x = jax.random.randint(jax.random.PRNGKey(0), (b, m), 3, 256)
    prompt = jax.random.randint(jax.random.PRNGKey(4), (n_quant, b, p), 0, 50)

    # engine path: prefill + AR, fully greedy
    res = generate_batch(
        model, params, x, jax.random.PRNGKey(3), prompt=prompt,
        max_seqlen=10, first_greedy_quant=0, force_max_seqlen=True,
    )

    # manual step-by-step teacher forcing of the same prompt
    x_enc = model.apply(params, x, method=LinaModel.encode_text)
    embed = lambda t: model.apply(params, t, method=LinaModel.embed_tokens)
    state = model.empty_state(b)
    y_embd = embed(jnp.ones((n_quant, b, 1), jnp.int32))[:, 0]
    toks_seq = []
    for t in range(10):
        logits, _, state = model.apply(
            params, y_embd, x_enc, state, method=LinaModel.decode_step
        )
        toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (b, q)
        toks_seq.append(toks)
        if t < p:
            nxt = prompt[:, :, t] + model.n_special_token_in  # (q, b)
        else:
            nxt = toks.T
        y_embd = embed(nxt[:, :, None])[:, 0]
    manual = jnp.stack(toks_seq, axis=2).transpose(1, 0, 2)  # (q, b, t)

    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(manual))


def test_lazy_window_matches_classic_decode():
    """lazy_window decode (read-only base states + window buffers + one
    fold per window) must produce token-identical greedy output to the
    classic per-token path — it is the same recurrence, reassociated."""
    model, params, (x, *_rest) = model_and_params()
    res_c = generate_batch(
        model, params, x, jax.random.PRNGKey(5), max_seqlen=14, k=1,
        force_max_seqlen=True,
    )
    res_l = generate_batch(
        model, params, x, jax.random.PRNGKey(5), max_seqlen=14, k=1,
        force_max_seqlen=True, lazy_window=4,
    )
    np.testing.assert_array_equal(np.asarray(res_l.tokens),
                                  np.asarray(res_c.tokens))
    np.testing.assert_array_equal(np.asarray(res_l.stop_mask),
                                  np.asarray(res_c.stop_mask))


def test_lazy_window_simple_gla_matches_classic():
    """The scalar-gate (simple-GLA) backbone rides the same GLA lazy
    machinery (gates broadcast per head) — pin the parity."""
    import dataclasses

    from lina_speech_tpu.config import build_model, lina_gla_tiny

    cfg = lina_gla_tiny()
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, kind="simple_gla"))
    model = build_model(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 3, cfg.n_txt_vocab)
    y = jax.random.randint(jax.random.PRNGKey(1), (2, 8, cfg.n_quant), 3,
                           cfg.n_codebook + 3)
    params = model.init(jax.random.PRNGKey(2), x, y,
                        jnp.ones((2, 8, 8), bool), jnp.ones((2, 8, 8), bool),
                        jnp.ones((2, 8), bool))
    r0 = generate_batch(model, params, x, jax.random.PRNGKey(3),
                        max_seqlen=16, k=1, force_max_seqlen=True)
    r1 = generate_batch(model, params, x, jax.random.PRNGKey(3),
                        max_seqlen=16, k=1, force_max_seqlen=True,
                        lazy_window=8)
    np.testing.assert_array_equal(np.asarray(r0.tokens),
                                  np.asarray(r1.tokens))


def test_cfg_coef_one_is_exactly_unguided():
    """Classifier-free guidance: cfg_coef=1 reduces to l_cond, so the
    doubled-batch run must reproduce the plain run token-exactly — pins
    the whole CFG plumbing (tiled states/embeddings, guided sampling)."""
    import dataclasses

    from lina_speech_tpu.config import build_model, lina_gla_tiny

    cfg = dataclasses.replace(lina_gla_tiny(), mask_text_p=0.1)
    model = build_model(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 3, 256)
    y = jax.random.randint(jax.random.PRNGKey(1), (2, 8, cfg.n_quant), 3,
                           cfg.n_codebook + 3)
    params = model.init(
        {"params": jax.random.PRNGKey(2), "text_mask": jax.random.PRNGKey(4)},
        x, y, jnp.ones((2, 8, 8), bool), jnp.ones((2, 8, 8), bool),
        jnp.ones((2, 8), bool))
    prompt = jax.random.randint(jax.random.PRNGKey(5),
                                (cfg.n_quant, 2, 3), 0, cfg.n_codebook)
    common = dict(max_seqlen=12, k=1, force_max_seqlen=True, prompt=prompt)
    r0 = generate_batch(model, params, x, jax.random.PRNGKey(3), **common)
    r1 = generate_batch(model, params, x, jax.random.PRNGKey(3),
                        cfg_coef=1.0, **common)
    np.testing.assert_array_equal(np.asarray(r0.tokens),
                                  np.asarray(r1.tokens))

    # guided decoding with a real coefficient runs and differs somewhere
    r3 = generate_batch(model, params, x, jax.random.PRNGKey(3),
                        cfg_coef=3.0, **common)
    assert np.asarray(r3.tokens).shape == np.asarray(r0.tokens).shape


def test_cfg_requires_mask_token():
    from lina_speech_tpu.config import build_model, lina_gla_tiny

    model = build_model(lina_gla_tiny())  # mask_text_p == 0
    x = jax.random.randint(jax.random.PRNGKey(0), (1, 6), 3, 256)
    y = jax.random.randint(jax.random.PRNGKey(1), (1, 6, 1), 3, 20)
    params = model.init(jax.random.PRNGKey(2), x, y,
                        jnp.ones((1, 6, 6), bool), jnp.ones((1, 6, 6), bool),
                        jnp.ones((1, 6), bool))
    import pytest

    with pytest.raises(ValueError, match="mask_text_p"):
        generate_batch(model, params, x, jax.random.PRNGKey(3),
                       max_seqlen=4, cfg_coef=2.0)


def test_cfg_composes_with_lazy_window():
    """CFG tiles the state BEFORE lazy buffers attach — the combination
    must still equal the classic CFG run token-exactly."""
    import dataclasses

    from lina_speech_tpu.config import build_model, lina_gla_tiny

    cfg = dataclasses.replace(lina_gla_tiny(), mask_text_p=0.1)
    model = build_model(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 3, 256)
    y = jax.random.randint(jax.random.PRNGKey(1), (2, 8, cfg.n_quant), 3,
                           cfg.n_codebook + 3)
    params = model.init(
        {"params": jax.random.PRNGKey(2), "text_mask": jax.random.PRNGKey(4)},
        x, y, jnp.ones((2, 8, 8), bool), jnp.ones((2, 8, 8), bool),
        jnp.ones((2, 8), bool))
    common = dict(max_seqlen=12, k=1, force_max_seqlen=True, cfg_coef=2.5)
    r0 = generate_batch(model, params, x, jax.random.PRNGKey(3), **common)
    r1 = generate_batch(model, params, x, jax.random.PRNGKey(3),
                        lazy_window=4, **common)
    np.testing.assert_array_equal(np.asarray(r0.tokens),
                                  np.asarray(r1.tokens))
