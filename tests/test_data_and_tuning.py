"""Data collation, packed batching, initial-state tuning loop, train harness."""
import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.data import (
    ByteTokenizer,
    TextTokenizer,
    collate_tts,
    packed_collate_tts,
    synthetic_tts_batches,
)
from lina_speech_tpu.train import TrainConfig, create_train_state, make_train_step
from lina_speech_tpu.train.initial_state import (
    InitialStateTuningConfig,
    parse_speaker_state,
    speaker_state_dict,
    train_initial_state,
)

from test_model import model_and_params


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    ids = tok.encode("hello world")
    assert ids[0] == 1 and ids[-1] == 2
    assert tok.decode(ids) == "hello world"


def test_collate_schema_and_masks():
    tok = TextTokenizer()
    items = [
        {"audio_token": np.arange(10).reshape(1, 10), "text": "ab"},
        {"audio_token": np.arange(6).reshape(1, 6), "text": "abcd"},
    ]
    batch = collate_tts(items, tok)
    b, n, q = batch["audio_token"].shape
    assert (b, q) == (2, 1)
    assert n == 12  # 10 + q + 1
    assert batch["crossatt_mask"].shape == (2, n, batch["text_token"].shape[1])
    # delayed stream: head token then offset codes
    assert batch["audio_token"][0, 0, 0] == 1
    assert batch["audio_token"][0, 1, 0] == 0 + 3
    # forced first-column attention
    assert batch["crossatt_mask"][:, :, 0].all()
    # padding region masked out
    assert not batch["y_mask"][1, 8:].any()


def test_packed_collate():
    tok = TextTokenizer()
    items = [
        {"audio_token": np.zeros((1, 5), np.int64), "text": "ab"},
        {"audio_token": np.zeros((1, 3), np.int64), "text": "xyz"},
    ]
    batch = packed_collate_tts(items, tok)
    assert batch["audio_token"].shape[0] == 1
    total_y = 7 + 5  # (5+2) + (3+2)
    assert batch["audio_token"].shape[1] == total_y
    rm = batch["reset_mask"][0]
    assert rm[0] and rm[7] and rm.sum() == 2
    # block diagonality: second segment's rows see no first-segment text
    xlen0 = len(tok.encode("ab"))
    assert not batch["crossatt_mask"][0, 8:, :xlen0].any()


def test_synthetic_batches_trainable():
    """One real optimizer step on synthetic data through the harness."""
    model, params, _ = model_and_params()
    gen = synthetic_tts_batches(
        batch_size=2, n_quant=2, n_codebook=50, min_audio_len=8,
        max_audio_len=16, pad_to_multiple=8,
    )
    batch = next(gen)
    state = create_train_state(model, params, TrainConfig(n_warmup_steps=2, n_training_steps=10))
    step = make_train_step(model, donate=False)
    state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    assert int(state2.step) == 1


def test_grad_accum_matches_full_batch():
    """grad_accum_steps=2 over a uniform batch equals the full-batch step
    (same loss gradient up to numerical noise)."""
    model, params, _ = model_and_params()
    gen = synthetic_tts_batches(
        batch_size=4, n_quant=2, n_codebook=50, min_audio_len=8,
        max_audio_len=8, pad_to_multiple=8,
    )
    batch = next(gen)
    cfg = TrainConfig(n_warmup_steps=2, n_training_steps=10)
    s1 = create_train_state(model, params, cfg)
    s2 = create_train_state(model, params, cfg)
    full = make_train_step(model, donate=False)
    accum = make_train_step(model, donate=False, grad_accum_steps=2)
    _, m1 = full(s1, batch, jax.random.PRNGKey(0))
    _, m2 = accum(s2, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-3)


def test_grad_accum_hoisted_cast_matches():
    """hoist_param_cast=True (params cast to bf16 once before the accum
    scan, harness.py) matches the default accum path: the fwd/bwd compute
    was already bf16 via promote_dtype, so pre-rounding the >=2D params
    changes nothing but the HBM traffic."""
    model, params, _ = model_and_params()
    gen = synthetic_tts_batches(
        batch_size=4, n_quant=2, n_codebook=50, min_audio_len=8,
        max_audio_len=8, pad_to_multiple=8,
    )
    batch = next(gen)
    cfg = TrainConfig(n_warmup_steps=2, n_training_steps=10)
    s1 = create_train_state(model, params, cfg)
    s2 = create_train_state(model, params, cfg)
    base = make_train_step(model, donate=False, grad_accum_steps=2)
    hoist = make_train_step(model, donate=False, grad_accum_steps=2,
                            hoist_param_cast=True)
    _, m1 = base(s1, batch, jax.random.PRNGKey(0))
    _, m2 = hoist(s2, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-3)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                               rtol=1e-2)


def test_grad_accum_unrolled_matches_scan():
    """unroll_accum=True (Python-unrolled micro-batch loop, harness.py)
    is the same math as the lax.scan accumulation — it exists purely so
    XLA can keep the f32 grad accumulators in the dW GEMM output layout
    instead of normalizing them per micro-step (r4 train profile: ~12
    ms/micro of while-carry layout copies)."""
    model, params, _ = model_and_params()
    gen = synthetic_tts_batches(
        batch_size=4, n_quant=2, n_codebook=50, min_audio_len=8,
        max_audio_len=8, pad_to_multiple=8,
    )
    batch = next(gen)
    cfg = TrainConfig(n_warmup_steps=2, n_training_steps=10)
    s1 = create_train_state(model, params, cfg)
    s2 = create_train_state(model, params, cfg)
    scan = make_train_step(model, donate=False, grad_accum_steps=2)
    unrolled = make_train_step(model, donate=False, grad_accum_steps=2,
                               unroll_accum=True)
    _, m1 = scan(s1, batch, jax.random.PRNGKey(0))
    _, m2 = unrolled(s2, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                               rtol=1e-4)


def test_initial_state_tuning_loop_reduces_loss():
    model, params, _ = model_and_params()
    gen = synthetic_tts_batches(
        batch_size=2, n_quant=2, n_codebook=50, min_audio_len=8,
        max_audio_len=8, pad_to_multiple=8, seed=7,
    )
    fixed = next(gen)  # overfit S0 on one fixed batch
    cfg = InitialStateTuningConfig(lr=0.5, rank=1, grad_acc=1, batch_size=2)
    tuned, losses = train_initial_state(
        model, params, [fixed] * 10, cfg, key=jax.random.PRNGKey(0)
    )
    assert len(losses) == 10
    assert losses[-1] < losses[0]  # S0 optimization makes progress

    sd = speaker_state_dict(tuned)
    back = parse_speaker_state(sd)
    for (a_k, a_v), (b_k, b_v) in zip(tuned, back):
        np.testing.assert_allclose(np.asarray(a_k), np.asarray(b_k))
        np.testing.assert_allclose(np.asarray(a_v), np.asarray(b_v))
