"""lina_speech_tpu — a TPU-native neural-codec TTS framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
theodorblackbird/lina-speech (zero-shot TTS with linear-attention
"attentive RNN" backbones over neural-codec tokens), designed TPU-first:

- linear-attention (GLA family) token mixers as chunked Pallas scans
  (MXU-friendly, fp32 state carry, log-space gates);
- autoregressive decoding as a single jitted ``lax.scan``/``while_loop``
  carrying an explicit recurrent-state pytree (constant memory);
- data/tensor parallelism via one ``jax.sharding.Mesh`` + jit shardings;
- WavTokenizer-style codec (VQ + Vocos/ISTFT vocoder) as fused XLA.

Reference capability map: see SURVEY.md at the repository root.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level API (keeps `import lina_speech_tpu` cheap)
    if name in ("lina_gla_169m", "lina_gla_tiny", "build_model", "ModelConfig",
                "load_config"):
        from lina_speech_tpu import config

        return getattr(config, name)
    if name in ("generate_batch", "cut_outputs"):
        from lina_speech_tpu import generate

        return getattr(generate, name)
    if name == "TTSPipeline":
        from lina_speech_tpu.pipeline import TTSPipeline

        return TTSPipeline
    if name == "DecodeServer":
        from lina_speech_tpu.serving import DecodeServer

        return DecodeServer
    if name == "vocode_streaming":
        from lina_speech_tpu.codec.wavtokenizer import vocode_streaming

        return vocode_streaming
    if name == "undelay_stream":
        from lina_speech_tpu.pipeline import undelay_stream

        return undelay_stream
    raise AttributeError(name)
