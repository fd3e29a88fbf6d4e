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
