"""Native int8 linear (ops/qlinear.py): kernel parity + QDense dispatch.

The weight-only mode must match the round-2 dequant semantics (bf16
activations, f32 accumulate, exact per-channel scales); w8a8 additionally
quantizes activations and must stay within its analytic error bound.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lina_speech_tpu.ops.qlinear import (
    QDense, int8_linear, int8_linear_ref,
)
from lina_speech_tpu.utils.quantize import (
    QKEY, SKEY, _quantize_leaf, quantize_dense_params,
)


@pytest.mark.parametrize("mode", ["wonly", "w8a8"])
@pytest.mark.parametrize("m,k,n", [(1, 256, 512), (3, 384, 300), (8, 1024, 1024)])
def test_kernel_matches_ref(mode, m, k, n):
    w = jax.random.normal(jax.random.PRNGKey(0), (k, n))
    ql = _quantize_leaf(w)
    x = jax.random.normal(jax.random.PRNGKey(1), (m, k)).astype(jnp.bfloat16)
    a = int8_linear(x, ql[QKEY], ql[SKEY], mode=mode, interpret=True)
    b = int8_linear_ref(x, ql[QKEY], ql[SKEY], mode=mode)
    # w8a8 interpret accumulates the int8 dot in f32 and loses integer
    # exactness past 2^24 at large K (hardware int32 MXU is exact) —
    # allow the few off-by-one-int rescaled elements
    atol = 2e-2 if mode == "wonly" else 1e-1
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32),
                               rtol=2e-2, atol=atol)


def test_quant_error_bounded():
    # wonly: only weight rounding error (~1/254 of the channel max);
    # w8a8 adds activation rounding — both stay small vs the float result.
    k, n = 512, 768
    w = jax.random.normal(jax.random.PRNGKey(0), (k, n)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(1), (4, k))
    y_f32 = x @ w
    ql = _quantize_leaf(w)
    scale = float(np.abs(np.asarray(y_f32)).mean())
    for mode, tol in [("wonly", 0.02), ("w8a8", 0.03)]:
        y = int8_linear_ref(x, ql[QKEY], ql[SKEY], mode=mode)
        rel = float(np.abs(np.asarray(y, np.float32) - np.asarray(y_f32)).mean())
        assert rel / scale < tol, (mode, rel / scale)


def test_qdense_float_path_is_exactly_dense():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 64))
    qd = QDense(48, dtype=jnp.bfloat16)
    p = qd.init(jax.random.PRNGKey(1), x)
    y = qd.apply(p, x)
    y_ref = nn.Dense(48, dtype=jnp.bfloat16).apply(p, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))


def test_qdense_dispatches_on_quantized_tree():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64))
    qd = QDense(128, dtype=jnp.bfloat16, use_bias=False)
    p = qd.init(jax.random.PRNGKey(1), x)
    pq = jax.jit(lambda t: quantize_dense_params(t, min_size=1))(p)
    assert QKEY in pq["params"]["kernel"]
    y = jax.jit(qd.apply)(pq, x)
    y_ref = int8_linear_ref(x, pq["params"]["kernel"][QKEY],
                            pq["params"]["kernel"][SKEY])
    np.testing.assert_array_equal(np.asarray(y, np.float32),
                                  np.asarray(y_ref, np.float32))


def test_quantize_dense_params_targets_kernels_and_head():
    tree = {
        "a": {"kernel": jnp.ones((64, 64)), "bias": jnp.ones((64,))},
        "head": {"logits_weight": jnp.ones((1, 300, 64))},
        "embed": {"embedding": jnp.ones((2, 300, 64))},
        "small": {"kernel": jnp.ones((4, 4))},
    }
    out = quantize_dense_params(tree, min_size=1024)
    assert QKEY in out["a"]["kernel"]
    assert QKEY in out["head"]["logits_weight"]  # (q, l, d) head streams int8
    assert out["head"]["logits_weight"][SKEY].shape == (1, 300, 1)
    assert out["embed"]["embedding"].dtype == jnp.float32  # gathers stay fp
    assert out["small"]["kernel"].dtype == jnp.float32  # below min_size
    assert out["a"]["bias"].dtype == jnp.float32


def test_generate_int8_matches_dequant_semantics():
    """Full tiny-model decode with the quantized tree stays close to the
    full-precision decode (same check as round 2's in-loop dequant)."""
    import dataclasses

    from lina_speech_tpu.config import build_model, lina_gla_tiny
    from lina_speech_tpu.generate import generate_batch

    cfg = lina_gla_tiny()
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (2, 12), 3, cfg.n_txt_vocab)
    y = jax.random.randint(key, (2, 8, cfg.n_quant), 3, cfg.n_codebook + 3)
    params = model.init(jax.random.PRNGKey(1), x, y,
                        jnp.ones((2, 12, 12), bool),
                        jnp.ones((2, 8, 12), bool), jnp.ones((2, 8), bool))
    common = dict(max_seqlen=10, k=1, force_max_seqlen=True)
    r_fp = generate_batch(model, params, x, jax.random.PRNGKey(3), **common)
    r_q = generate_batch(model, params, x, jax.random.PRNGKey(3),
                         weight_quant="int8", quant_min_size=1 << 8,
                         **common)
    # greedy decode: tiny random model logits gaps can flip rarely; demand
    # overwhelming agreement
    agree = (np.asarray(r_fp.tokens) == np.asarray(r_q.tokens)).mean()
    assert agree > 0.8, agree


# ---------------------------------------------------------- fused SwiGLU FFN
def _ref_ffn(x, qin, sin, bin_, qout, sout, bout, dtype=jnp.bfloat16):
    gx = int8_linear_ref(x, qin, sin, out_dtype=dtype)
    if bin_ is not None:
        gx = gx + jnp.asarray(bin_, dtype)
    gate, h = jnp.split(gx, 2, axis=-1)
    y = int8_linear_ref(nn.silu(gate) * h, qout, sout, out_dtype=dtype)
    if bout is not None:
        y = y + jnp.asarray(bout, dtype)
    return y


@pytest.mark.parametrize("m,d,hidden", [
    (1, 64, 85),       # tiny: single full-width block (< 128 lanes)
    (4, 256, 341),     # masked edge chunk (341 not a lane multiple)
    (1, 128, 512),     # exact block split
])
def test_fused_ffn_matches_unfused(m, d, hidden):
    from lina_speech_tpu.ops.qlinear import fused_ffn_int8

    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    win = jax.random.normal(ks[0], (d, 2 * hidden)) * 0.05
    wout = jax.random.normal(ks[1], (hidden, d)) * 0.05
    bin_ = jax.random.normal(ks[2], (2 * hidden,)) * 0.01
    bout = jax.random.normal(ks[3], (d,)) * 0.01
    qi, qo = _quantize_leaf(win), _quantize_leaf(wout)
    x = jax.random.normal(ks[4], (m, d)).astype(jnp.bfloat16)
    y = fused_ffn_int8(x, qi[QKEY], qi[SKEY], bin_, qo[QKEY], qo[SKEY],
                       bout, interpret=True)
    y_ref = _ref_ffn(x, qi[QKEY], qi[SKEY], bin_, qo[QKEY], qo[SKEY], bout)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_swiglu_fused_dispatch_matches_unfused():
    from lina_speech_tpu.models.base_blocks import SwiGLU

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 256)).astype(jnp.bfloat16)
    mod_f = SwiGLU(256, dtype=jnp.bfloat16, fused_quant=True)
    mod_u = SwiGLU(256, dtype=jnp.bfloat16, fused_quant=False)
    p = mod_u.init(jax.random.PRNGKey(1), x)
    pq = jax.jit(lambda t: quantize_dense_params(t, min_size=1))(p)
    assert QKEY in pq["params"]["p_in"]["kernel"]
    y_f = mod_f.apply(pq, x)
    y_u = mod_u.apply(pq, x)
    np.testing.assert_allclose(np.asarray(y_f, np.float32),
                               np.asarray(y_u, np.float32),
                               rtol=3e-2, atol=3e-2)
    # float tree: fused instance must fall through to the exact dense path
    np.testing.assert_array_equal(
        np.asarray(mod_f.apply(p, x), np.float32),
        np.asarray(mod_u.apply(p, x), np.float32))


def test_swiglu_fused_skipped_under_w8a8(monkeypatch):
    """ADVICE r3 #1: the fused FFN kernel is weight-only numerics; when
    QLINEAR_MODE requests w8a8 the SwiGLU must fall through to the two
    QDense calls so the whole quantized forward keeps one numerics class."""
    from lina_speech_tpu.models.base_blocks import SwiGLU

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 256)).astype(jnp.bfloat16)
    mod_f = SwiGLU(256, dtype=jnp.bfloat16, fused_quant=True)
    mod_u = SwiGLU(256, dtype=jnp.bfloat16, fused_quant=False)
    p = mod_u.init(jax.random.PRNGKey(1), x)
    pq = jax.jit(lambda t: quantize_dense_params(t, min_size=1))(p)
    monkeypatch.setenv("QLINEAR_MODE", "w8a8")
    y_f = mod_f.apply(pq, x)
    y_u = mod_u.apply(pq, x)  # QDense honors w8a8 in both
    np.testing.assert_array_equal(np.asarray(y_f, np.float32),
                                  np.asarray(y_u, np.float32))


def test_qdense_dtype_none_keeps_dense_output_dtype():
    """ADVICE r3 #4: with dtype=None the quantized branch must return the
    same output dtype nn.Dense semantics would (result_type of activation
    and param dtypes), not silently bfloat16."""
    x32 = jax.random.normal(jax.random.PRNGKey(0), (2, 64))
    qd = QDense(128, dtype=None, use_bias=False)
    p = qd.init(jax.random.PRNGKey(1), x32)
    pq = jax.jit(lambda t: quantize_dense_params(t, min_size=1))(p)
    assert qd.apply(p, x32).dtype == qd.apply(pq, x32).dtype == jnp.float32
    x16 = x32.astype(jnp.bfloat16)
    # f32 params + bf16 activation promote to f32 in nn.Dense semantics
    assert qd.apply(p, x16).dtype == qd.apply(pq, x16).dtype
