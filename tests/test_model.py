"""Model-level tests: forward shapes/loss, training-path == decode-path parity.

The decode-vs-prefill parity test is the JAX equivalent of the reference's
chunk-vs-fused_recurrent mode switching (gla.py:327-333): the chunked
training kernel and the token-by-token step must realize the same function.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lina_speech_tpu.models import AttentiveGLA, LinaModel, TextEncoder


def make_model(blind=True, cross_att_pp=False, use_short_conv=True, n_quant=2):
    rnn = AttentiveGLA(
        d_model=64, n_layer=2, heads=2, blind=blind, cross_att_pp=cross_att_pp,
        use_short_conv=use_short_conv, pos_type="sinusoidal", chunk_size=16,
    )
    model = LinaModel(
        attentive_rnn=rnn,
        d_model=64,
        n_quant=n_quant,
        n_codebook=50,
        n_special_token_in=3,
        n_special_token_out=3,
        n_txt_vocab_base=256,
        txt_encoder=TextEncoder(dim=64, heads=2, n_layers=2, dropout=0.0),
    )
    return model


def make_batch(key, b=2, n=33, m=7, n_quant=2):
    k1, k2 = jax.random.split(key)
    x = jax.random.randint(k1, (b, m), 3, 256)
    y = jax.random.randint(k2, (b, n, n_quant), 3, 53)
    y = y.at[:, 0, :].set(1)
    encoder_mask = jnp.ones((b, m, m), bool)
    crossatt_mask = jnp.ones((b, n, m), bool)
    logits_mask = jnp.ones((b, n), bool)
    return x, y, encoder_mask, crossatt_mask, logits_mask


@functools.lru_cache(maxsize=None)
def model_and_params(blind=True, cross_att_pp=False, b=2, n=33, m=7):
    """Share a jitted init (one persistent-cacheable executable) across tests."""
    model = make_model(blind=blind, cross_att_pp=cross_att_pp)
    batch = make_batch(jax.random.PRNGKey(0), b=b, n=n, m=m)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), *batch)
    return model, params, batch


@pytest.mark.parametrize("blind,pp", [(True, False), (False, False), (False, True)])
def test_forward_shapes_and_loss(blind, pp):
    model, params, batch = model_and_params(blind=blind, cross_att_pp=pp)
    x, y, em, cm, lm = batch
    logits, loss, att = model.apply(params, x, y, em, cm, lm)
    assert logits.shape == (2, 32, 2, 53)
    assert jnp.isfinite(loss)
    assert att is None  # return_att=False by default


def test_forward_returns_attention():
    model, params, (x, y, em, cm, lm) = model_and_params()
    _, _, att = model.apply(params, x, y, em, cm, lm, return_att=True)
    assert att is not None
    assert att.shape[0] == 2 and att.shape[-1] == 7  # (b, 2, n-1, m) blind 2-pass


def test_loss_ignores_masked_positions():
    model, params, (x, y, em, cm, lm) = model_and_params()
    _, loss_full, _ = model.apply(params, x, y, em, cm, lm)
    # mask out half the positions -> loss changes (is being restricted)
    lm_half = lm.at[:, 16:].set(False)
    _, loss_half, _ = model.apply(params, x, y, em, cm, lm_half)
    assert not np.isclose(float(loss_full), float(loss_half))


@pytest.mark.parametrize("blind", [True, False])
def test_decode_step_matches_prefill(blind):
    """Token-by-token decode must equal the chunk-parallel prefill path."""
    model, params, _ = model_and_params(blind=blind)
    x, y, em, cm, lm = make_batch(jax.random.PRNGKey(0), b=2, n=21)

    y_q = jnp.transpose(y, (2, 0, 1))  # (q, b, n)
    y_embd = model.apply(params, y_q, method=LinaModel.embed_tokens)  # (b, n, d)
    x_enc = model.apply(params, x, method=LinaModel.encode_text)

    # prefill over the whole sequence
    logits_pre, _, state_pre = model.apply(
        params, y_embd, x_enc, method=LinaModel.prefill
    )

    # step-by-step (jitted once, called per token)
    step = jax.jit(
        lambda p, e, xe, st: model.apply(p, e, xe, st, method=LinaModel.decode_step)
    )
    state = model.empty_state(2)
    outs = []
    for t in range(21):
        logits_t, _, state = step(params, y_embd[:, t], x_enc, state)
        outs.append(logits_t)
    logits_seq = jnp.stack(outs, axis=1)

    np.testing.assert_allclose(
        np.asarray(logits_seq), np.asarray(logits_pre), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(state.layers[0].s), np.asarray(state_pre.layers[0].s),
        rtol=2e-4, atol=2e-4,
    )
    if blind:
        np.testing.assert_allclose(
            np.asarray(state.pos_net.s), np.asarray(state_pre.pos_net.s),
            rtol=2e-4, atol=2e-4,
        )


def test_init_state_tuning_param_grads():
    """Grads flow into LoRA S0 params through the full model (initial_state.py)."""
    model, params, (x, y, em, cm, lm) = model_and_params()
    rnn = model.attentive_rnn
    tune = rnn.init_state_tuning_params(jax.random.PRNGKey(2), rank=1)

    def loss_fn(tune):
        st = rnn.state_from_params(tune, batch_size=2)
        _, loss, _ = model.apply(params, x, y, em, cm, lm, init_state=st)
        return loss

    g = jax.grad(loss_fn)(tune)
    flat = jax.tree_util.tree_leaves(g)
    assert all(jnp.isfinite(l).all() for l in flat)
    assert sum(float(jnp.abs(l).sum()) for l in flat) > 0
