"""End-to-end TTS pipeline: text -> codec tokens -> waveform.

The jitted equivalent of the reference's InferenceLina notebook flow
(README.md:40; reconstructed from modeling_lina.py:111-192 +
decoder/pretrained.py:209-239): tokenize text, generate codec tokens with
optional voice-clone prompt or tuned initial state, then WavTokenizer-decode
to audio. Also the reverse: tokenize prompt audio with the codec encoder.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.codec.wavtokenizer import WavTokenizer
from lina_speech_tpu.data.tokenizer import TextTokenizer
from lina_speech_tpu.generate import GenerateResult, cut_outputs, generate_batch
from lina_speech_tpu.models.lina import LinaModel


@dataclasses.dataclass
class TTSPipeline:
    model: LinaModel
    params: dict
    wavtok: WavTokenizer
    wavtok_params: dict
    tokenizer: TextTokenizer

    def tokenize_audio(self, audio: np.ndarray) -> jnp.ndarray:
        """(B, T) waveform -> (n_q, B, T') codec codes (prompt prep)."""
        _, codes = self.wavtok.apply(
            self.wavtok_params, jnp.asarray(audio), method=WavTokenizer.encode
        )
        return codes

    def synthesize(
        self,
        text: str,
        key: jax.Array,
        batch_size: int = 1,
        prompt_audio: Optional[np.ndarray] = None,
        prompt_codes: Optional[jnp.ndarray] = None,
        init_state=None,
        max_seqlen: int = 1000,
        k: int = 100,
        temp: float = 1.0,
    ) -> Tuple[List[np.ndarray], GenerateResult]:
        """Returns (list of per-row waveforms, raw GenerateResult)."""
        ids = self.tokenizer.encode(text)
        x = jnp.asarray(ids, jnp.int32)[None, :].repeat(batch_size, axis=0)
        if prompt_audio is not None and prompt_codes is None:
            prompt_codes = self.tokenize_audio(prompt_audio)
        if prompt_codes is not None and prompt_codes.shape[1] != batch_size:
            prompt_codes = jnp.repeat(prompt_codes, batch_size, axis=1)

        res = generate_batch(
            self.model, self.params, x, key, prompt=prompt_codes,
            init_state=init_state, max_seqlen=max_seqlen, k=k, temp=temp,
        )
        cuts = cut_outputs(res, n_quant=self.model.n_quant,
                           n_special_token_in=self.model.n_special_token_in)
        waves = []
        for codes_i, _ in cuts:
            if codes_i.shape[-1] == 0:
                waves.append(np.zeros((0,), np.float32))
                continue
            wav = self.wavtok.apply(
                self.wavtok_params, jnp.asarray(codes_i),
                method=WavTokenizer.codes_to_audio,
            )
            waves.append(np.asarray(wav[0]))
        return waves, res


def write_wav(path: str, audio: np.ndarray, sample_rate: int = 24000) -> None:
    """Minimal PCM16 WAV writer (no soundfile dependency)."""
    import struct

    x = np.clip(np.asarray(audio, np.float32), -1.0, 1.0)
    data = (x * 32767).astype("<i2").tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                      sample_rate * 2, 2, 16))
        f.write(b"data" + struct.pack("<I", len(data)) + data)
