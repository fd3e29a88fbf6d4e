"""Arithmetic coder: exact roundtrip + compression near entropy."""
import numpy as np
import pytest

from lina_speech_tpu.codec.ac import (
    ArithmeticCoder, ArithmeticDecoder, build_stable_quantized_cdf,
)


def test_cdf_is_stable_and_complete():
    pdf = np.asarray([0.5, 0.3, 0.19999, 1e-12])
    cdf = build_stable_quantized_cdf(pdf)
    assert cdf[0] == 0 and cdf[-1] == 1 << 24
    assert (np.diff(cdf) >= 1).all()  # every symbol decodable
    # roundoff: pdfs differing below the quantum give identical tables
    cdf2 = build_stable_quantized_cdf(pdf + 1e-10)
    np.testing.assert_array_equal(cdf, cdf2)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roundtrip_random_adaptive_pdfs(seed):
    """Per-symbol (adaptive, LM-style) pdfs: decode must be exact."""
    rng = np.random.default_rng(seed)
    n_sym, card = 500, 64
    pdfs = rng.dirichlet(np.full(card, 0.3), size=n_sym)
    symbols = np.asarray([rng.choice(card, p=p) for p in pdfs])

    enc = ArithmeticCoder()
    for s, p in zip(symbols, pdfs):
        enc.push(int(s), build_stable_quantized_cdf(p))
    data = enc.flush()

    dec = ArithmeticDecoder(data)
    out = [dec.pull(build_stable_quantized_cdf(p)) for p in pdfs]
    np.testing.assert_array_equal(np.asarray(out), symbols)


def test_compression_approaches_entropy():
    """Skewed static distribution: bits/symbol ~ entropy, well under
    log2(cardinality)."""
    rng = np.random.default_rng(3)
    card = 16
    pdf = np.asarray([2.0 ** -min(i + 1, 14) for i in range(card)])
    pdf = pdf / pdf.sum()
    symbols = rng.choice(card, size=4000, p=pdf)
    cdf = build_stable_quantized_cdf(pdf)

    enc = ArithmeticCoder()
    for s in symbols:
        enc.push(int(s), cdf)
    data = enc.flush()
    bits_per_sym = len(data) * 8 / len(symbols)
    entropy = -(pdf * np.log2(pdf)).sum()
    assert bits_per_sym < entropy + 0.1  # near-optimal
    assert bits_per_sym < np.log2(card)  # beats fixed-width coding

    dec = ArithmeticDecoder(data)
    out = [dec.pull(cdf) for _ in symbols]
    np.testing.assert_array_equal(np.asarray(out), symbols)
