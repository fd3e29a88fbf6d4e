"""Replication guards on the virtual 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from lina_speech_tpu.parallel import MeshConfig, make_mesh
from lina_speech_tpu.parallel.checks import assert_replicated, param_count_fingerprint


def test_fingerprint_stable_and_counts():
    tree = {"a": jnp.zeros((3, 4)), "b": {"c": jnp.zeros((5,))}}
    n, h1 = param_count_fingerprint(tree)
    assert n == 17
    _, h2 = param_count_fingerprint(tree)
    assert h1 == h2
    _, h3 = param_count_fingerprint({"a": jnp.zeros((4, 3)), "b": {"c": jnp.zeros((5,))}})
    assert h3 != h1


def test_assert_replicated_passes_and_fails():
    mesh = make_mesh(MeshConfig(dp=8, tp=1))
    x = jnp.arange(16.0).reshape(4, 4)
    rep = jax.device_put(x, NamedSharding(mesh, P()))
    assert_replicated({"w": rep})  # identical -> ok

    # fabricate divergent per-device buffers via make_array_from_single_device_arrays
    devices = mesh.devices.reshape(-1)
    shards = [
        jax.device_put(x + (1.0 if i == 3 else 0.0), d)
        for i, d in enumerate(devices)
    ]
    bad = jax.make_array_from_single_device_arrays(
        x.shape, NamedSharding(mesh, P()), shards
    )
    with pytest.raises(AssertionError, match="diverges"):
        assert_replicated({"w": bad})
