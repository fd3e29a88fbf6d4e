"""Distributed-consistency guards.

The reference's only such guard is ``_check_number_of_params``
(encoder/distrib.py:41-52), which catches rank divergence in VQ buffers
before a broadcast. The TPU equivalents here:

- :func:`assert_replicated`: verify params that should be replicated across
  the mesh really are bitwise identical on every device (catches bad
  shardings / non-deterministic updates).
- :func:`param_count_fingerprint`: cheap structural fingerprint to compare
  across hosts / restarts (the reference's parameter-count handshake).
"""
from __future__ import annotations

import hashlib
from typing import Any, Tuple

import jax
import numpy as np


def param_count_fingerprint(params: Any) -> Tuple[int, str]:
    """(total parameter count, stable structure hash)."""
    leaves = jax.tree_util.tree_leaves(params)
    total = int(sum(np.prod(l.shape) for l in leaves))
    desc = "|".join(
        f"{'/'.join(map(str, path))}:{tuple(leaf.shape)}:{leaf.dtype}"
        for path, leaf in jax.tree_util.tree_leaves_with_path(params)
    )
    return total, hashlib.sha256(desc.encode()).hexdigest()[:16]


def assert_replicated(tree: Any, atol: float = 0.0) -> None:
    """Check that every fully-replicated array holds identical values on all
    its devices. Raises AssertionError naming the first divergent leaf."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if not hasattr(leaf, "sharding"):
            continue
        if not leaf.sharding.is_fully_replicated:
            continue
        shards = getattr(leaf, "addressable_shards", None)
        if not shards or len(shards) < 2:
            continue
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            got = np.asarray(s.data)
            if not np.allclose(ref, got, atol=atol, rtol=0.0):
                name = "/".join(map(str, path))
                raise AssertionError(
                    f"replicated leaf {name} diverges between device "
                    f"{shards[0].device} and {s.device} "
                    f"(max diff {np.abs(ref - got).max()})"
                )
