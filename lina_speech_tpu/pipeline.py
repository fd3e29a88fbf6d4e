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
        cfg_coef: Optional[float] = None,
    ) -> Tuple[List[np.ndarray], GenerateResult]:
        """Returns (list of per-row waveforms, raw GenerateResult).
        ``cfg_coef`` enables classifier-free guidance (see generate_batch;
        needs a model trained with mask_text_p > 0)."""
        ids = self.tokenizer.encode(text)
        x = jnp.asarray(ids, jnp.int32)[None, :].repeat(batch_size, axis=0)
        if prompt_audio is not None and prompt_codes is None:
            prompt_codes = self.tokenize_audio(prompt_audio)
        if prompt_codes is not None and prompt_codes.shape[1] != batch_size:
            prompt_codes = jnp.repeat(prompt_codes, batch_size, axis=1)

        res = generate_batch(
            self.model, self.params, x, key, prompt=prompt_codes,
            init_state=init_state, max_seqlen=max_seqlen, k=k, temp=temp,
            cfg_coef=cfg_coef,
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

    def stream_synthesize(
        self,
        text: str,
        max_seqlen: int = 1000,
        k: int = 100,
        temp: float = 1.0,
        window: int = 60,
        context: int = 64,
        chunk: int = 16,
        max_text_len: int = 64,
        seed: int = 0,
        prompt_codes=None,
        cfg_coef=None,
    ):
        """Streaming TTS: yield waveform chunks WHILE tokens generate.

        Chunked decode (DecodeServer, one slot) interleaves with windowed
        vocoding (same clamped-slice scheme as
        :func:`codec.wavtokenizer.vocode_streaming`, so the concatenated
        chunks equal its output on the final code sequence): a window of
        ``window`` frames is vocoded as soon as ``context`` lookahead
        frames exist behind it. Time-to-first-audio is therefore
        ~``window + context + q`` decode steps instead of the whole
        utterance — a latency capability the one-shot reference flow
        (pretrained.py:192-207) does not have. The vocoder backbone is
        time-global, so ``context`` bounds fidelity to the one-shot
        decode (see vocode_streaming).

        Yields (B=1, window*hop) waveform arrays; the final chunks flush
        whatever remains after generation stops.
        """
        from lina_speech_tpu.serving import DecodeServer

        srv = DecodeServer(self.model, self.params, n_slots=1,
                           max_text_len=max_text_len, chunk=chunk, k=k,
                           temp=temp, seed=seed, cfg_coef=cfg_coef)
        ids = np.asarray(self.tokenizer.encode(text))
        rid = srv.submit(ids, prompt=prompt_codes, max_len=max_seqlen)

        q = self.model.n_quant
        hop = self.wavtok.config.hop_length
        full = window + 2 * context
        dec = jax.jit(lambda p, seg: self.wavtok.apply(
            p, seg, method=WavTokenizer.codes_to_audio))

        emitted = 0  # frames vocoded so far

        def vocode(codes_np: np.ndarray, e: int, take: int, T: int):
            s0 = min(max(0, e - context), max(0, T - full))
            seg = codes_np[:, None, s0:s0 + min(full, T)]
            wav = dec(self.wavtok_params, jnp.asarray(seg))
            off = (e - s0) * hop
            return np.asarray(wav[:, off:off + take * hop])

        # NB requests sit in the queue until run() refills, so srv.active
        # is 0 right after submit — loop on completion, not on active
        done = srv.run(max_chunks=1)
        while not done:
            part = srv.partials().get(rid)
            if part is not None:
                codes = undelay_stream(part, q, stopped=False)
                # emit every window whose lookahead exists; keep the live
                # edge un-emitted (its slice would need future frames)
                while (emitted + window + context <= codes.shape[1]
                       and codes.shape[1] >= full):
                    yield vocode(codes, emitted, window, codes.shape[1])
                    emitted += window
            done = srv.run(max_chunks=1)
        c = next(cc for cc in done if cc.rid == rid)
        codes = undelay_stream(np.asarray(c.tokens), q, stopped=c.stopped)
        T = codes.shape[1]
        while emitted < T:
            take = min(window, T - emitted)
            yield vocode(codes, emitted, take, T)
            emitted += take


def undelay_stream(tokens: np.ndarray, n_quant: int, stopped: bool,
                   n_special: int = 3) -> np.ndarray:
    """Assemble raw codec codes from a SAMPLED token stream incrementally.

    The sampled stream starts at delayed position 1 (the forced head token
    is position 0), so ``code_i[j] = tokens[i + j, j] - n_special`` — code
    ``i`` is complete once step ``i + q - 1`` has been sampled. Unlike the
    reference cut convention (tools.py:61-67 applied to the sampled
    stream, which drops code_0), this keeps every complete code.

    tokens: (steps, q); returns (q, N) with N = usable steps - q + 1
    (``stopped=True`` excludes the final all-stop row first).
    """
    steps = tokens.shape[0] - (1 if stopped else 0)
    q = n_quant
    n = steps - q + 1
    if n <= 0:
        return np.zeros((q, 0), tokens.dtype)
    idx = np.arange(n)[None, :] + np.arange(q)[:, None]  # (q, n)
    return np.take_along_axis(tokens.T, idx, axis=1) - n_special


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
