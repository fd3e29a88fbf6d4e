"""Device mesh construction for data/tensor parallel training and serving.

The reference's only multi-device strategy is DDP over NCCL (Lightning
``sync_dist=True``, train_lina.py:91; hand-rolled async all-reduce in
encoder/distrib.py). The TPU-native equivalent is one
``jax.sharding.Mesh`` with axes:

- ``dp``: data parallel — batch sharded, gradients psum'd by XLA;
- ``tp``: tensor parallel — FFN hidden, attention heads and the logits
  vocabulary sharded; collectives ride ICI;
- ``cp`` (optional): context parallel — audio TIME sharded for long-
  sequence GLA training (ops/gla_cp.py: per-shard chunk kernels + one
  state all_gather; everything else rides XLA SPMD halo exchange).

Gradient averaging, metric reduction (the reference's ``average_metrics``)
and codebook stats sync (encoder/distrib.py:55-109) all become XLA
collectives inserted automatically by jit sharding propagation.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = -1  # -1: all remaining devices
    tp: int = 1
    # context parallel: audio TIME sharded over this many devices (GLA
    # training via ops/gla_cp.py). A "cp" axis is added to the mesh only
    # when cp > 1 so existing dp x tp specs are unaffected.
    cp: int = 1


def ensure_virtual_cpu_devices(n: int) -> None:
    """Arrange for >= ``n`` virtual CPU devices BEFORE the CPU client is
    created (the device-count flag is read exactly once, at client
    creation). Used by the CLIs' ``--platform cpu`` path so callers don't
    need the XLA_FLAGS incantation. Raises if the environment already pins
    a smaller count — silently proceeding would surface later as a
    confusing mesh-size error."""
    import os
    import re

    flags = os.environ.get("XLA_FLAGS", "")
    m = re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
    if m:
        if int(m.group(1)) < n:
            raise RuntimeError(
                f"XLA_FLAGS already pins {m.group(1)} virtual CPU devices "
                f"but {n} are needed; unset it or raise the count")
        return
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n}").strip()


def make_mesh(config: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    tp, cp = config.tp, config.cp
    dp = config.dp if config.dp != -1 else n // (tp * cp)
    if dp * tp * cp != n:
        raise ValueError(
            f"mesh {dp}x{tp}x{cp} != {n} devices (for a virtual CPU mesh set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={dp * tp * cp} "
            f"and the cpu platform)")
    if cp > 1:
        # cp innermost: the per-layer state all_gather rides ICI neighbors
        arr = np.asarray(devices).reshape(dp, tp, cp)
        return Mesh(arr, axis_names=("dp", "tp", "cp"))
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
