"""Streaming TTS (pipeline.stream_synthesize): waveform chunks yielded
while tokens generate must equal the windowed vocode of the final code
sequence (same clamped-slice scheme), and the incremental undelay must
reconstruct exactly the codes a full run produces."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.codec.wavtokenizer import (
    WavTokenizer,
    WavTokenizerConfig,
    vocode_streaming,
)
from lina_speech_tpu.config import build_model, lina_gla_tiny
from lina_speech_tpu.data.tokenizer import TextTokenizer
from lina_speech_tpu.pipeline import TTSPipeline, undelay_stream
from lina_speech_tpu.serving import DecodeServer


def test_undelay_stream_roundtrip_multi_quant():
    from lina_speech_tpu.data.collate import _delay_np

    q, n = 3, 12
    codes = np.arange(100, 100 + q * n).reshape(q, n)
    d = _delay_np(codes, n_special=3)  # (n+q+1, q) delayed stream
    sampled = d[1:]  # perfect generation: the model emits d[1:]
    # final all-stop row is the last tail position
    assert (sampled[-1] == 2).all()
    out = undelay_stream(sampled, q, stopped=True)
    np.testing.assert_array_equal(out, codes)
    # partial prefix: every complete code so far, nothing else
    part = undelay_stream(sampled[:7], q, stopped=False)
    np.testing.assert_array_equal(part, codes[:, : 7 - q + 1])


def _setup():
    cfg = dataclasses.replace(lina_gla_tiny(), n_codebook=32)
    model = build_model(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (1, 9), 3, 256)
    y = jax.random.randint(jax.random.PRNGKey(1), (1, 9, 1), 3, 35)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(2), x, y, jnp.ones((1, 9, 9), bool),
        jnp.ones((1, 9, 9), bool), jnp.ones((1, 9), bool))
    wt_cfg = WavTokenizerConfig(
        ratios=(4, 2), n_filters=2, latent_dim=16, bins=32,
        backbone_dim=32, backbone_intermediate_dim=64, backbone_layers=1,
        n_fft=16, hop_length=8)
    wavtok = WavTokenizer(wt_cfg)
    wt_params = wavtok.init(jax.random.PRNGKey(3), jnp.zeros((1, 64)))
    return model, params, wavtok, wt_params


def test_stream_yields_interleave_with_decode(monkeypatch):
    """Audio must come out WHILE tokens generate — regression for the
    round-4 bug where srv.active==0 right after submit skipped the live
    loop and everything flushed at the end."""
    import lina_speech_tpu.serving as serving_mod

    model, params, wavtok, wt_params = _setup()
    pipe = TTSPipeline(model, params, wavtok, wt_params, TextTokenizer())
    orig_run = serving_mod.DecodeServer.run
    calls = {"n": 0}

    def run(self, max_chunks=None):
        out = orig_run(self, max_chunks=max_chunks)
        calls["n"] += 1
        return out

    monkeypatch.setattr(serving_mod.DecodeServer, "run", run)
    yields_at = [calls["n"] for _ in pipe.stream_synthesize(
        "stream me", max_seqlen=40, k=5, seed=5, window=8, context=6,
        chunk=4)]
    live = sum(1 for y in yields_at if y < max(yields_at))
    assert live >= 2, yields_at


def test_stream_synthesize_matches_windowed_vocode():
    model, params, wavtok, wt_params = _setup()
    pipe = TTSPipeline(model, params, wavtok, wt_params, TextTokenizer())
    # k=5/seed=5 runs to max_len (40 codes) on this tiny random model —
    # several live windows before the flush; still deterministic (the
    # reference server run below uses the same seed)
    kw = dict(max_seqlen=40, k=5, window=8, context=6, chunk=4, seed=5)

    chunks = list(pipe.stream_synthesize("stream me", **kw))
    assert len(chunks) >= 2
    stream = np.concatenate(chunks, axis=-1)

    # reference: an identical server run -> final codes -> windowed vocode
    srv = DecodeServer(model, params, n_slots=1, max_text_len=64, chunk=4,
                       k=5, seed=5)
    rid = srv.submit(np.asarray(pipe.tokenizer.encode("stream me")),
                     max_len=40)
    c = {cc.rid: cc for cc in srv.run()}[rid]
    codes = undelay_stream(np.asarray(c.tokens), 1, stopped=c.stopped)
    want = np.concatenate(
        [np.asarray(w) for w in vocode_streaming(
            wavtok, wt_params, jnp.asarray(codes)[:, None, :],
            window=8, context=6)], axis=-1)
    np.testing.assert_allclose(stream, want, rtol=1e-5, atol=1e-5)
    assert stream.shape[-1] == codes.shape[1] * 8
