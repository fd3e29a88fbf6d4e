"""Native C++ audio loader: build, WAV parsing, crop/gain, threading."""
import struct
import wave

import numpy as np
import pytest

from lina_speech_tpu.data.audio_loader import (
    NativeAudioLoader,
    NumpyAudioLoader,
    build_native,
)


def write_wav_pcm16(path, x, sr=24000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())


def write_wav_float32(path, x, sr=24000):
    data = x.astype("<f4").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, sr, sr * 4, 4, 32)
    body = b"data" + struct.pack("<I", len(data)) + data
    path.write_bytes(hdr + fmt + body)


@pytest.fixture
def wav_dir(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        x = rng.normal(size=4000).astype(np.float32) * 0.2
        p = tmp_path / f"a{i}.wav"
        write_wav_pcm16(p, x)
        paths.append(str(p))
    pf = tmp_path / "f32.wav"
    write_wav_float32(pf, rng.normal(size=3000).astype(np.float32) * 0.1)
    paths.append(str(pf))
    return paths


def test_native_builds():
    assert build_native() is not None


def test_native_loader_batches(wav_dir):
    loader = NativeAudioLoader(wav_dir, crop_len=1024, batch=4, n_threads=2, seed=1)
    try:
        for _ in range(3):
            batch = next(loader)
            assert batch.shape == (4, 1024)
            assert np.isfinite(batch).all()
            peaks = np.abs(batch).max(axis=1)
            assert (peaks > 0).all()
            # gain-normalized toward -1..-6 dBFS => peaks roughly <= 1
            assert (peaks <= 1.01).all()
    finally:
        loader.close()


def test_numpy_fallback_parses_both_formats(wav_dir):
    loader = NumpyAudioLoader(wav_dir, crop_len=512, batch=2, seed=0)
    batch = next(loader)
    assert batch.shape == (2, 512)
    assert np.isfinite(batch).all()
