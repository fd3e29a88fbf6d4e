"""Multi-host (DCN) mesh layout helpers — process-count mocked.

Real multi-host can't run here (single process); the layout logic is pure
over (process_index, slice_index, id) and tested with fake devices, and the
single-process paths must degrade to the plain mesh/shard_batch behavior.
Capability parity: Lightning multi-node DDP implied by reference
train_lina.py:91 (sync_dist=True).
"""
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from lina_speech_tpu.parallel.mesh import MeshConfig
from lina_speech_tpu.parallel.multihost import (
    device_order,
    distributed_init,
    globalize_batch,
    make_multihost_mesh,
    process_batch_slice,
    validate_tp_intra_host,
)
from lina_speech_tpu.parallel.sharding import shard_batch


def fake_devices(n_proc, per_proc, interleave_ids=False):
    devs = []
    for p in range(n_proc):
        for i in range(per_proc):
            did = (i * n_proc + p) if interleave_ids else (p * per_proc + i)
            devs.append(SimpleNamespace(process_index=p, slice_index=p, id=did))
    return devs


def test_device_order_is_process_major():
    devs = fake_devices(4, 4, interleave_ids=True)
    ordered = device_order(devs)
    procs = [d.process_index for d in ordered]
    assert procs == sorted(procs)  # process-major
    # within a process, ids ascend
    for p in range(4):
        ids = [d.id for d in ordered if d.process_index == p]
        assert ids == sorted(ids)


def test_tp_intra_host_validation():
    devs = device_order(fake_devices(2, 4))
    validate_tp_intra_host(devs, 4)  # tp == devices per process: fine
    validate_tp_intra_host(devs, 2)
    with pytest.raises(ValueError, match="straddle"):
        validate_tp_intra_host(devs, 8)  # spans both processes


def test_multihost_layout_puts_dp_across_processes():
    """On a mocked 2-process x 4-device pod, the (dp=4, tp=2) mesh must put
    each tp pair inside one process and split dp across the DCN boundary."""
    devs = fake_devices(2, 4, interleave_ids=True)
    ordered = device_order(devs)
    validate_tp_intra_host(ordered, 2)
    arr = np.asarray(ordered, dtype=object).reshape(4, 2)
    for row in arr:  # tp groups intra-process
        assert len({d.process_index for d in row}) == 1
    assert {d.process_index for d in arr[:2].ravel()} == {0}
    assert {d.process_index for d in arr[2:].ravel()} == {1}


def test_make_multihost_mesh_single_process_equals_make_mesh():
    mesh = make_multihost_mesh(MeshConfig(dp=4, tp=2))
    assert mesh.shape == {"dp": 4, "tp": 2}


def test_process_batch_slice():
    assert process_batch_slice(16, process_index=0, process_count=4) == slice(0, 4)
    assert process_batch_slice(16, process_index=3, process_count=4) == slice(12, 16)
    with pytest.raises(ValueError, match="divisible"):
        process_batch_slice(10, process_index=0, process_count=4)


def test_globalize_batch_single_process_matches_shard_batch():
    mesh = make_multihost_mesh(MeshConfig(dp=4, tp=2))
    batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4),
             "y": np.ones((8,), np.int32)}
    a = globalize_batch(batch, mesh, P("dp"))
    b = shard_batch(batch, mesh)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert a[k].sharding.is_equivalent_to(b[k].sharding, a[k].ndim)


def test_distributed_init_noop_single_process(monkeypatch):
    for k in ("JAX_COORDINATOR_ADDRESS", "SLURM_JOB_ID",
              "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    assert distributed_init() is False  # no env hints -> no-op, single proc
