"""One-pipeline real-audio round trip (VERDICT r3 missing #4):

WAV files on disk -> native C++ loader -> codec GAN training -> encode ->
delay-RVQ collate -> TTS training -> generate -> vocoder decode -> scored
waveforms, all as one artifact-producing run (scripts/e2e_roundtrip.py).

The assertions pin the HANDOFFS, not the tiny models' absolute quality:
the generated token streams must reproduce the encoded ground truth, and
the synthesized audio must match the codec reconstruction (its quality
ceiling) almost exactly.
"""
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_e2e_roundtrip_wavs_to_tts_audio(tmp_path):
    from e2e_roundtrip import main

    report = main([
        "--out", str(tmp_path), "--n-utts", "2", "--length", "600",
        "--codec-steps", "50", "--tts-steps", "800",
    ])

    # every stage produced finite measurements
    for k, v in report.items():
        if isinstance(v, float):
            assert np.isfinite(v), (k, v)

    # TTS memorized the codec streams: teacher-forced AND free-running
    assert report["tts_forced_accuracy"] == 1.0
    assert report["tts_token_accuracy"] >= 0.95, report

    # synthesized audio ~= codec reconstruction (the quality ceiling given
    # perfect tokens; vocoder conv edges differ at the 1-frame offset)
    assert report["tts_vs_recon_si_snr_db"] > 20.0, report

    # TTS-vs-source can't beat the codec ceiling by more than noise, and
    # must be close to it (the pipeline loses ~nothing beyond the codec)
    assert abs(report["tts_si_snr_db"] - report["codec_si_snr_db"]) < 1.5

    # codec GAN actually trained (mel loss moved down)
    assert report["codec_mel_last"] < report["codec_mel_first"]

    # the WAV artifacts exist on disk
    for i in range(2):
        assert (tmp_path / f"src_{i}.wav").exists()
        assert (tmp_path / f"tts_{i}.wav").stat().st_size > 44
