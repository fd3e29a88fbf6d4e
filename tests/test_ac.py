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


# ------------------------------------------------------- native C++ coder
def _native_or_skip():
    from lina_speech_tpu.codec.ac import _native_lib

    lib = _native_lib()
    if lib is None:
        pytest.skip("native AC unavailable (no g++)")
    return lib


def test_native_encoder_bitstream_identical_to_python():
    from lina_speech_tpu.codec.ac import NativeArithmeticCoder

    lib = _native_or_skip()
    rng = np.random.default_rng(7)
    n_sym, card = 800, 100
    pdfs = rng.dirichlet(np.full(card, 0.2), size=n_sym)
    symbols = np.asarray([rng.choice(card, p=p) for p in pdfs])
    cdfs = np.stack([build_stable_quantized_cdf(p) for p in pdfs])

    py = ArithmeticCoder()
    for s, c in zip(symbols, cdfs):
        py.push(int(s), c)
    nat = NativeArithmeticCoder(lib)
    nat.push_many(symbols, cdfs)
    assert nat_flush_eq(py.flush(), nat.flush())


def nat_flush_eq(a: bytes, b: bytes) -> bool:
    assert a == b, (len(a), len(b))
    return True


def test_native_decoder_matches_python_and_roundtrips():
    from lina_speech_tpu.codec.ac import (
        NativeArithmeticDecoder, make_coder, make_decoder,
    )

    lib = _native_or_skip()
    rng = np.random.default_rng(11)
    n_sym, card = 600, 47
    pdfs = rng.dirichlet(np.full(card, 0.4), size=n_sym)
    symbols = np.asarray([rng.choice(card, p=p) for p in pdfs])
    cdfs = np.stack([build_stable_quantized_cdf(p) for p in pdfs])

    enc = make_coder()  # native
    enc.push_many(symbols, cdfs)
    data = enc.flush()

    nat = NativeArithmeticDecoder(lib, data)
    out_n = nat.pull_many(cdfs)
    np.testing.assert_array_equal(out_n, symbols)

    # Python decoder reads the native stream identically (cross-impl)
    dec = ArithmeticDecoder(data)
    out_p = [dec.pull(c) for c in cdfs]
    np.testing.assert_array_equal(np.asarray(out_p), symbols)


def test_native_coder_throughput_sanity():
    """The point of the C++ coder: it must beat the Python loop clearly
    (typically 30-100x; assert a conservative 5x so CI noise can't flake)."""
    import time

    from lina_speech_tpu.codec.ac import NativeArithmeticCoder

    lib = _native_or_skip()
    rng = np.random.default_rng(3)
    n_sym, card = 3000, 256
    pdfs = rng.dirichlet(np.full(card, 0.3), size=n_sym)
    symbols = np.asarray([rng.choice(card, p=p) for p in pdfs])
    cdfs = np.stack([build_stable_quantized_cdf(p) for p in pdfs])

    t0 = time.perf_counter()
    py = ArithmeticCoder()
    for s, c in zip(symbols, cdfs):
        py.push(int(s), c)
    py.flush()
    t_py = time.perf_counter() - t0

    t0 = time.perf_counter()
    nat = NativeArithmeticCoder(lib)
    nat.push_many(symbols, cdfs)
    nat.flush()
    t_nat = time.perf_counter() - t0
    assert t_py / max(t_nat, 1e-9) > 5.0, (t_py, t_nat)
