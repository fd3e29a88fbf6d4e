"""Multi-host (DCN) initialization, mesh layout, and per-process data feed.

The reference scales across nodes with PyTorch-Lightning DDP over NCCL
(train_lina.py:91 ``sync_dist=True``; hand-rolled collectives in
encoder/distrib.py). The TPU-native equivalent for a multi-host pod or
multi-slice (DCN-connected) deployment:

- one ``jax.distributed.initialize`` call per process (:func:`distributed_init`);
- ONE global mesh laid out so that **dp spans hosts over DCN** (cheap:
  one gradient all-reduce per step) while **tp stays inside a host/slice
  over ICI** (latency-sensitive: activations cross it every layer). That is
  the standard layout recipe (jax-ml.github.io/scaling-book): order devices
  process-major, put the model-parallel axis innermost, and validate that
  tp never straddles a process boundary (:func:`make_multihost_mesh`);
- each process feeds only its own batch rows
  (:func:`process_batch_slice` + :func:`globalize_batch` — the moral
  equivalent of Lightning's DistributedSampler + DDP input split).

Real multi-host cannot run in this environment (one chip behind a tunnel);
the layout logic is pure over (process_index, slice_index, id) tuples and
unit-tested with fake devices, and the single-process path degrades to the
plain :func:`lina_speech_tpu.parallel.mesh.make_mesh` behavior.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lina_speech_tpu.parallel.mesh import MeshConfig

_initialized = False


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    With no arguments, initializes only when a multi-process environment is
    detectable (TPU pod metadata, SLURM, or JAX_COORDINATOR_ADDRESS —
    jax's own auto-detection); plain single-process runs are a no-op.
    Returns True when running multi-process after the call.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    # NB: do NOT touch jax.process_count()/devices() before deciding —
    # that initializes the local XLA backend and makes the subsequent
    # jax.distributed.initialize() raise on every real multi-host launch.
    explicit = coordinator_address is not None
    import os

    # TPU_WORKER_HOSTNAMES marks a pod only when it lists SEVERAL hosts
    # (single-host runtimes — e.g. the axon remote-TPU shim — set it to
    # one hostname)
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    autodetectable = "," in workers or any(
        os.environ.get(k)
        for k in ("JAX_COORDINATOR_ADDRESS", "SLURM_JOB_ID",
                  "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not (explicit or autodetectable):
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:
        # externally initialized (e.g. launcher already called it) is fine
        if "already" not in str(e).lower():
            raise
    except ValueError as e:
        # auto-detection came up empty (partial env markers): degrade to
        # single-process rather than crashing a plain run
        import warnings

        warnings.warn(f"distributed_init: auto-detect failed ({e}); "
                      "running single-process")
        return False
    _initialized = True
    return jax.process_count() > 1


def device_order(devices: Sequence[Any]) -> list:
    """Process-major (then slice-major, then id) device ordering, so a
    reshape to (dp, tp) puts tp on devices of one process (ICI) and dp's
    strides across processes (DCN)."""
    return sorted(
        devices,
        key=lambda d: (d.process_index, getattr(d, "slice_index", 0) or 0, d.id),
    )


def validate_tp_intra_host(ordered: Sequence[Any], tp: int) -> None:
    """Every contiguous tp-group (after process-major ordering) must sit in
    one process, so tensor-parallel collectives ride ICI, never DCN."""
    for i in range(0, len(ordered), tp):
        group = ordered[i : i + tp]
        procs = {d.process_index for d in group}
        if len(procs) > 1:
            raise ValueError(
                f"tp={tp} would straddle processes {sorted(procs)} "
                f"(devices {i}..{i + tp - 1}); pick tp dividing the "
                f"per-process device count "
                f"({len(ordered) // max(1, len({d.process_index for d in ordered}))})"
            )


def make_multihost_mesh(
    config: Optional[MeshConfig] = None,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """dp(outer, DCN-capable) x tp(inner, ICI-only) mesh over all processes.

    Single-process: identical to ``mesh.make_mesh``. Multi-process: devices
    are ordered process-major and tp is validated to stay intra-process.
    """
    config = config or MeshConfig()
    devices = device_order(devices if devices is not None else jax.devices())
    n = len(devices)
    tp = config.tp
    dp = config.dp if config.dp != -1 else n // tp
    if dp * tp != n:
        raise ValueError(f"mesh {dp}x{tp} != {n} devices")
    validate_tp_intra_host(devices, tp)
    arr = np.asarray(devices, dtype=object).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def process_batch_slice(global_batch_size: int,
                        process_index: Optional[int] = None,
                        process_count: Optional[int] = None) -> slice:
    """Rows of the global batch this process must load (contiguous block;
    matches the row order ``globalize_batch`` assembles)."""
    pc = process_count if process_count is not None else jax.process_count()
    pi = process_index if process_index is not None else jax.process_index()
    if global_batch_size % pc:
        raise ValueError(f"global batch {global_batch_size} not divisible by "
                         f"{pc} processes")
    per = global_batch_size // pc
    return slice(pi * per, (pi + 1) * per)


def globalize_batch(batch: Any, mesh: Mesh, spec: P = P("dp")) -> Any:
    """Assemble per-process local batch shards into global jax.Arrays.

    Each process passes only ITS rows (``process_batch_slice`` of the
    global batch); the result is a global array sharded by ``spec``
    without any cross-host data movement. Single-process this is just a
    sharded device_put.
    """
    sharding = NamedSharding(mesh, spec)

    def put(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, batch)


@dataclasses.dataclass(frozen=True)
class MultihostInfo:
    process_index: int
    process_count: int
    is_multihost: bool


def info() -> MultihostInfo:
    return MultihostInfo(jax.process_index(), jax.process_count(),
                         jax.process_count() > 1)
