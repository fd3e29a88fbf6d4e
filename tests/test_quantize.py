"""Weight-only int8 quantization: roundtrip bounds + quantized decode."""
import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.utils.quantize import (
    QKEY, dequantize_params, quantize_params, quantized_bytes,
)


def test_roundtrip_error_bounded():
    w = jax.random.normal(jax.random.PRNGKey(0), (300, 400)) * 0.07
    q = quantize_params({"k": {"kernel": w}}, min_size=1)
    wd = dequantize_params(q, jnp.float32)["k"]["kernel"]
    # symmetric rounding: |err| <= scale / 2 per output channel
    s = np.asarray(q["k"]["kernel"]["int8_s"])
    err = np.abs(np.asarray(wd) - np.asarray(w))
    assert (err <= s / 2 + 1e-7).all()


def test_small_and_1d_leaves_pass_through():
    tree = {
        "scale": jnp.ones((64,)),
        "taps": jnp.ones((64, 4)),
        "big": jnp.ones((512, 512)),
        "ints": jnp.ones((512, 512), jnp.int32),
    }
    q = quantize_params(tree)
    assert isinstance(q["big"], dict) and QKEY in q["big"]
    assert not isinstance(q["scale"], dict)
    assert not isinstance(q["taps"], dict)
    assert not isinstance(q["ints"], dict)
    assert quantized_bytes(q) < quantized_bytes(tree)


def test_quantized_decode_runs_and_tracks_fp():
    """generate_batch(weight_quant='int8') on the tiny model: runs, valid
    outputs, and greedy tokens mostly agree with the fp path."""
    from lina_speech_tpu.config import build_model, lina_gla_tiny
    from lina_speech_tpu.generate import generate_batch

    cfg = lina_gla_tiny()
    model = build_model(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (2, 10), 3, cfg.n_txt_vocab)
    y = jax.random.randint(jax.random.PRNGKey(1), (2, 8, cfg.n_quant), 3,
                           cfg.n_codebook + 3)
    params = model.init(
        jax.random.PRNGKey(2), x, y, jnp.ones((2, 10, 10), bool),
        jnp.ones((2, 8, 10), bool), jnp.ones((2, 8), bool),
    )
    kw = dict(max_seqlen=24, k=1, force_max_seqlen=True)
    ref = generate_batch(model, params, x, jax.random.PRNGKey(3), **kw)
    # quantize at a low threshold so the tiny model's matrices qualify
    out = generate_batch(model, params, x, jax.random.PRNGKey(3),
                         weight_quant="int8", quant_min_size=1 << 8, **kw)
    toks_ref = np.asarray(ref.tokens)
    toks_q = np.asarray(out.tokens)
    assert toks_q.shape == toks_ref.shape
    assert (toks_q >= 0).all()
    agreement = (toks_q == toks_ref).mean()
    assert agreement > 0.7, f"greedy agreement {agreement:.2f}"


def test_quantized_decode_composes_with_lazy_window():
    """weight_quant='int8' + lazy micro-chunk decode run together (both
    in-loop paths read the dequantized tree)."""
    from lina_speech_tpu.config import build_model, lina_gla_tiny
    from lina_speech_tpu.generate import generate_batch

    cfg = lina_gla_tiny()
    model = build_model(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 3, cfg.n_txt_vocab)
    y = jax.random.randint(jax.random.PRNGKey(1), (2, 8, cfg.n_quant), 3,
                           cfg.n_codebook + 3)
    params = model.init(
        jax.random.PRNGKey(2), x, y, jnp.ones((2, 8, 8), bool),
        jnp.ones((2, 8, 8), bool), jnp.ones((2, 8), bool),
    )
    out = generate_batch(model, params, x, jax.random.PRNGKey(3),
                         max_seqlen=16, k=1, force_max_seqlen=True,
                         lazy_window=4, weight_quant="int8",
                         quant_min_size=1 << 8)
    toks = np.asarray(out.tokens)
    assert toks.shape == (cfg.n_quant, 2, 16)
    assert (toks >= 0).all()


def test_mixed_quant_merged_projection_parity():
    """Flagship-shaped int8 tree: q/k/v/g kernels quantize but the narrow
    (d, 16) gk_proj_1 stays float (quantize_dense_params skips width < 32).
    _proj_qkvg must still merge the int8 group into ONE stream and match
    the per-module outputs exactly (same int8_linear_ref math)."""
    from lina_speech_tpu.models.gla_layer import GatedLinearAttention
    from lina_speech_tpu.ops.qlinear import QKEY, is_quantized_leaf
    from lina_speech_tpu.utils.quantize import quantize_dense_params

    layer = GatedLinearAttention(hidden_size=64, num_heads=2,
                                 use_short_conv=False, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64))
    params = layer.init(jax.random.PRNGKey(1), x[:, None, :])
    qparams = quantize_dense_params(params, min_size=1 << 8)
    pq = qparams["params"]
    # the premise: mixed tree (q/k/v/g int8, gk_proj_1 float)
    for name in ("q_proj", "k_proj", "v_proj", "g_proj"):
        assert is_quantized_leaf(pq[name]["kernel"]), name
    assert not is_quantized_leaf(pq["gk_proj_1"]["kernel"])

    bound = layer.bind(qparams)
    q, k, v, g, gk1 = bound._proj_qkvg(x)
    # oracle: per-module QDense applications on the same tree
    want = [bound.q_proj(x), bound.k_proj(x), bound.v_proj(x),
            bound.g_proj(x), bound.gk_proj_1(x)]
    for got, exp, name in zip((q, k, v, g, gk1), want,
                              ("q", "k", "v", "g", "gk1")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   rtol=1e-5, atol=1e-5, err_msg=name)
