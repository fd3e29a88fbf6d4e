"""End-to-end TTS pipeline: text -> codec tokens -> waveform (tiny, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.codec.wavtokenizer import WavTokenizer, WavTokenizerConfig
from lina_speech_tpu.config import build_model, lina_gla_tiny
from lina_speech_tpu.data.tokenizer import TextTokenizer
from lina_speech_tpu.pipeline import TTSPipeline, write_wav


def test_pipeline_synthesize_and_clone(tmp_path):
    import dataclasses

    # n_codebook must match the codec bins for the token handoff
    cfg = lina_gla_tiny()
    cfg = dataclasses.replace(cfg, n_codebook=32)
    model = build_model(cfg)
    b, m = 1, 9
    x = jax.random.randint(jax.random.PRNGKey(0), (b, m), 3, 256)
    y = jax.random.randint(jax.random.PRNGKey(1), (b, 9, 1), 3, 35)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(2), x, y, jnp.ones((b, m, m), bool),
        jnp.ones((b, 9, m), bool), jnp.ones((b, 9), bool),
    )

    wt_cfg = WavTokenizerConfig(
        ratios=(4, 2), n_filters=2, latent_dim=16, bins=32,
        backbone_dim=32, backbone_intermediate_dim=64, backbone_layers=1,
        n_fft=16, hop_length=8,
    )
    wavtok = WavTokenizer(wt_cfg)
    wt_params = wavtok.init(jax.random.PRNGKey(3), jnp.zeros((1, 64)))

    pipe = TTSPipeline(model, params, wavtok, wt_params, TextTokenizer())

    waves, res = pipe.synthesize("hello", jax.random.PRNGKey(4), max_seqlen=12, k=5)
    assert len(waves) == 1
    assert waves[0].ndim == 1
    # hop 8: waveform length = tokens * 8
    n_tok = res.lengths[0] - 1 - model.n_quant - (model.n_quant + 1)
    # (cut_outputs trims stop & delay frames; just check divisibility+finite)
    assert waves[0].size % 8 == 0
    assert np.isfinite(waves[0]).all()

    # voice cloning path: prompt audio is tokenized by the codec encoder
    prompt_audio = np.random.default_rng(0).normal(size=(1, 64)).astype(np.float32)
    waves2, _ = pipe.synthesize(
        "clone me", jax.random.PRNGKey(5), prompt_audio=prompt_audio,
        max_seqlen=14, k=5,
    )
    assert np.isfinite(waves2[0]).all()

    out = tmp_path / "out.wav"
    write_wav(str(out), waves[0] if waves[0].size else np.zeros(16))
    assert out.exists() and out.stat().st_size > 44
