"""Cross-feature integration: tuned S0 -> generation; packed-batch training."""
import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.generate import generate_batch
from lina_speech_tpu.train import TrainConfig, create_train_state, make_train_step

from test_model import model_and_params


def test_tuned_initial_state_feeds_generation():
    """Speaker S0 from initial-state tuning drives generate_batch (the
    reference passes the tuned cache as init_state, modeling_lina.py:146-148)
    and must change the sampled tokens."""
    model, params, (x, *_ ) = model_and_params()
    rnn = model.attentive_rnn
    tune = rnn.init_state_tuning_params(jax.random.PRNGKey(0), rank=1, scale=5.0)
    s0 = rnn.state_from_params(tune, batch_size=2, scale=5.0)

    res_a = generate_batch(model, params, x, jax.random.PRNGKey(1),
                           max_seqlen=10, first_greedy_quant=0,
                           force_max_seqlen=True)
    res_b = generate_batch(model, params, x, jax.random.PRNGKey(1),
                           init_state=s0, max_seqlen=10, first_greedy_quant=0,
                           force_max_seqlen=True)
    assert not np.array_equal(np.asarray(res_a.tokens), np.asarray(res_b.tokens))


def test_packed_batch_trains_with_reset_mask():
    """Sequence-packed batch (block masks + reset_mask) through the full
    train step (reference tools.py:17-35 + gla.py:182-184)."""
    from lina_speech_tpu.data import packed_collate_tts
    from lina_speech_tpu.data.tokenizer import TextTokenizer

    model, params, _ = model_and_params()
    items = [
        {"audio_token": np.random.default_rng(0).integers(0, 50, (2, 12)),
         "text": "pack one"},
        {"audio_token": np.random.default_rng(1).integers(0, 50, (2, 9)),
         "text": "pack two"},
    ]
    batch = packed_collate_tts(items, TextTokenizer())
    state = create_train_state(model, params, TrainConfig(n_warmup_steps=1,
                                                          n_training_steps=10))
    step = make_train_step(model, donate=False)
    state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


def test_packed_reset_isolates_segments():
    """With reset_mask, segment 2's representations are independent of
    segment 1's content (state wiped at the boundary)."""
    model, params, _ = model_and_params()
    from lina_speech_tpu.data import packed_collate_tts
    from lina_speech_tpu.data.tokenizer import TextTokenizer

    rng = np.random.default_rng(0)
    seg2 = {"audio_token": rng.integers(3, 50, (2, 9)), "text": "same tail"}
    itemsA = [{"audio_token": rng.integers(3, 50, (2, 12)), "text": "head a"}, seg2]
    itemsB = [{"audio_token": rng.integers(3, 50, (2, 12)), "text": "head a"}, seg2]
    tok = TextTokenizer()
    bA = packed_collate_tts(itemsA, tok)
    bB = packed_collate_tts(itemsB, tok)

    def logits_for(batch):
        out, _, _ = model.apply(
            params, jnp.asarray(batch["text_token"]), jnp.asarray(batch["audio_token"]),
            jnp.asarray(batch["encoder_mask"]), jnp.asarray(batch["crossatt_mask"]),
            logits_mask=jnp.asarray(batch["y_mask"]),
            reset_mask=jnp.asarray(batch["reset_mask"]),
        )
        return np.asarray(out)

    lA, lB = logits_for(bA), logits_for(bB)
    # first segment differs between A and B...
    assert not np.allclose(lA[0, :10], lB[0, :10], atol=1e-4)
    # ...but the second segment's logits are identical bar the cross-att
    # text (same text + audio + wiped state). Positions after the reset:
    seg2_start = 12 + 2 + 1  # first delayed len = n + q + 1 = 15
    # NOTE: blind cross-attention uses absolute positions, so only the
    # recurrent path is isolated; compare the GLA-state-dependent drift by
    # checking values are much closer than the first segment's.
    d_seg1 = np.abs(lA[0, :10] - lB[0, :10]).mean()
    d_seg2 = np.abs(lA[0, seg2_start:] - lB[0, seg2_start:]).mean()
    assert d_seg2 < d_seg1 * 0.2
