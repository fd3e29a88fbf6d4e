"""GLA_FOLD_LAYOUT=1 (folded-layout projections, VERDICT r3 next #3):
the einsum formulation that folds the head-split transposes into the
projection GEMMs must be numerically identical to the legacy
project-reshape-transpose path — outputs AND gradients, on both the
fused-conv Pallas path (the flagship training config) and the no-conv
path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lina_speech_tpu.models.gla_layer import GatedLinearAttention


def _layer_and_inputs(use_short_conv, kernel_mode, dtype=jnp.float32):
    layer = GatedLinearAttention(
        hidden_size=64, num_heads=2, expand_k=1.0, expand_v=2.0,
        use_short_conv=use_short_conv, chunk_size=16,
        kernel_mode=kernel_mode, dtype=dtype)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 64), dtype)
    params = layer.init(jax.random.PRNGKey(1), x)
    return layer, params, x


@pytest.mark.parametrize("use_short_conv,kernel_mode", [
    (True, "chunk_pallas"),   # flagship: conv fused into the Pallas kernel
    (False, "chunk"),         # no-conv XLA chunk
])
def test_fold_layout_matches_legacy(monkeypatch, use_short_conv,
                                    kernel_mode):
    layer, params, x = _layer_and_inputs(use_short_conv, kernel_mode)
    reset = jnp.zeros((2, 32), bool).at[:, 7].set(True)

    def loss(p, x):
        return (layer.apply(p, x, reset_mask=reset) ** 2).sum()

    monkeypatch.setenv("GLA_FOLD_LAYOUT", "0")
    y0 = layer.apply(params, x, reset_mask=reset)
    l0, g0 = jax.value_and_grad(loss)(params, x)

    monkeypatch.setenv("GLA_FOLD_LAYOUT", "1")
    y1 = layer.apply(params, x, reset_mask=reset)
    l1, g1 = jax.value_and_grad(loss)(params, x)

    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fold_layout_init_works_with_env_set(monkeypatch):
    """Review finding (round 4): with GLA_FOLD_LAYOUT=1 exported BEFORE
    model construction (exactly how the queued hardware A/B runs), init
    must still create every param (the folded einsums read submodule
    kernels that only exist if init takes the legacy path)."""
    monkeypatch.setenv("GLA_FOLD_LAYOUT", "1")
    layer, params, x = _layer_and_inputs(True, "chunk_pallas")
    y = layer.apply(params, x)
    assert np.isfinite(np.asarray(y, np.float32)).all()


def test_fold_layout_falls_back_on_quantized_tree(monkeypatch):
    """A {int8_q, int8_s}-swapped tree must take the QDense-mediated legacy
    path (the folded einsums read raw kernel leaves)."""
    from lina_speech_tpu.utils.quantize import quantize_dense_params

    layer, params, x = _layer_and_inputs(False, "chunk",
                                         dtype=jnp.bfloat16)
    x = x.astype(jnp.bfloat16)
    pq = jax.jit(lambda t: quantize_dense_params(t, min_size=1))(params)
    monkeypatch.setenv("GLA_FOLD_LAYOUT", "0")
    y0 = layer.apply(pq, x)
    monkeypatch.setenv("GLA_FOLD_LAYOUT", "1")
    y1 = layer.apply(pq, x)
    np.testing.assert_array_equal(np.asarray(y0, np.float32),
                                  np.asarray(y1, np.float32))


def test_fold_layout_final_state_matches(monkeypatch):
    """Prefill path (output_final_state=True): the folded layout must
    produce the same final recurrent state and conv rings."""
    layer, params, x = _layer_and_inputs(True, "chunk_pallas")

    monkeypatch.setenv("GLA_FOLD_LAYOUT", "0")
    y0, st0 = layer.apply(params, x, output_final_state=True)
    monkeypatch.setenv("GLA_FOLD_LAYOUT", "1")
    y1, st1 = layer.apply(params, x, output_final_state=True)

    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st0),
                    jax.tree_util.tree_leaves(st1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
