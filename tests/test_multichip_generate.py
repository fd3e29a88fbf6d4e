"""Multi-chip serving: generation with the batch sharded over the dp axis.

The reference's batch inference is single-GPU (modeling_lina.py:111-192);
here the same jitted engine runs with the batch (and with it every state
leaf) sharded across the mesh — the TPU-native scale-out for serving.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from lina_speech_tpu.generate import generate_batch
from lina_speech_tpu.parallel import MeshConfig, make_mesh, shard_params

from test_model import model_and_params


def test_generation_with_dp_sharded_batch():
    mesh = make_mesh(MeshConfig(dp=8, tp=1))
    model, params, _ = model_and_params()
    params = shard_params(params, mesh)

    b, m = 8, 7
    x = jax.random.randint(jax.random.PRNGKey(0), (b, m), 3, 256)
    x = jax.device_put(x, NamedSharding(mesh, P("dp")))

    res = generate_batch(model, params, x, jax.random.PRNGKey(1),
                         max_seqlen=10, first_greedy_quant=0,
                         force_max_seqlen=True)
    toks = np.asarray(res.tokens)
    assert toks.shape == (2, 8, 10)
    assert np.isfinite(toks).all()

    # the sharded run must agree with a single-device run (greedy)
    res_single = generate_batch(model, jax.device_get(params),
                                jax.device_get(x), jax.random.PRNGKey(1),
                                max_seqlen=10, first_greedy_quant=0,
                                force_max_seqlen=True)
    np.testing.assert_array_equal(toks, np.asarray(res_single.tokens))


def test_generation_with_fused_pallas_decode_sharded():
    """kernel_mode="chunk_pallas" forces the fused Pallas decode step (and
    Pallas prefill) off-TPU; on a dp x tp mesh the kernels' partitioning
    rules keep the state sharded through the whole jitted generate loop."""
    from lina_speech_tpu.models.attentive_rnn import AttentiveGLA
    from lina_speech_tpu.models.encoder import TextEncoder
    from lina_speech_tpu.models.lina import LinaModel

    rnn = AttentiveGLA(
        d_model=64, n_layer=2, heads=2, blind=True,
        use_short_conv=True, pos_type="sinusoidal", chunk_size=16,
        kernel_mode="chunk_pallas",
    )
    model = LinaModel(
        attentive_rnn=rnn, d_model=64, n_quant=2, n_codebook=50,
        n_special_token_in=3, n_special_token_out=3, n_txt_vocab_base=256,
        txt_encoder=TextEncoder(dim=64, heads=2, n_layers=2, dropout=0.0),
    )
    b, m = 8, 7
    x = jax.random.randint(jax.random.PRNGKey(0), (b, m), 3, 256)
    y = jax.random.randint(jax.random.PRNGKey(2), (b, 12, 2), 3, 50)
    em = jnp.ones((b, m, m), bool)
    cm = jnp.ones((b, 12, m), bool)
    lm = jnp.ones((b, 12), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), x, y, em, cm, lm)

    res_single = generate_batch(model, params, x, jax.random.PRNGKey(1),
                                max_seqlen=8, first_greedy_quant=0,
                                force_max_seqlen=True)

    mesh = make_mesh(MeshConfig(dp=4, tp=2))
    params_s = shard_params(params, mesh)
    x_s = jax.device_put(x, NamedSharding(mesh, P("dp")))
    res = generate_batch(model, params_s, x_s, jax.random.PRNGKey(1),
                         max_seqlen=8, first_greedy_quant=0,
                         force_max_seqlen=True)
    np.testing.assert_array_equal(np.asarray(res.tokens),
                                  np.asarray(res_single.tokens))
