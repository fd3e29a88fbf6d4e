"""Parameter / batch sharding rules (GSPMD-style).

Params are matched by their flattened path against regex rules mapping to
PartitionSpecs over the ("dp", "tp") mesh. Defaults implement megatron-style
tensor parallelism for the matmul-heavy parts (FFN in/out, q/k/v/g + o
projections — which shards GLA heads and recurrent state over tp — and the
per-quantizer logits vocabulary), with everything else replicated. Batch
arrays shard their leading axis over dp.

The reference has no TP (SURVEY.md §2.4); this is a designed-in TPU
capability, validated multi-chip by ``__graft_entry__.dryrun_multichip``.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Sequence, Tuple

import jax
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec). First match wins. Paths look like
# "params/attentive_rnn/encoder_0/tmix/q_proj/kernel".
DEFAULT_PARAM_RULES: List[Tuple[str, P]] = [
    (r".*logits_weight$", P(None, "tp", None)),       # (q, vocab, d) -> shard vocab
    (r".*p_in/kernel$", P(None, "tp")),               # SwiGLU up: (d, 2*hidden)
    (r".*p_out/kernel$", P("tp", None)),              # SwiGLU down: (hidden, d)
    # GLA / RWKV6 projections: shard heads via the feature dim
    (r".*(q_proj|k_proj|v_proj|g_proj|r_proj)/kernel$", P(None, "tp")),
    (r".*gk_proj_2/kernel$", P(None, "tp")),          # (low_rank, key_dim)
    (r".*gk_proj_2/bias$", P("tp")),
    (r".*(q_proj|k_proj|v_proj|g_proj|r_proj)/bias$", P("tp")),
    (r".*o_proj/kernel$", P("tp", None)),             # (value_dim, d)
    (r".*(q_conv1d|k_conv1d|v_conv1d)/kernel$", P("tp", None)),  # (dim, w)
    # Mamba: d_inner sharded
    (r".*in_proj/kernel$", P(None, "tp")),            # (d, 2*d_inner)
    (r".*out_proj/kernel$", P("tp", None)),           # (d_inner, d)
    (r".*tmix/conv_kernel$", P("tp", None)),          # (d_inner, w)
    (r".*tmix/(conv_bias|D)$", P("tp")),
    (r".*tmix/A_log$", P("tp", None)),                # (d_inner, n)
    (r".*qkv/kernel$", P(None, "tp")),                # text-encoder fused qkv
    (r".*qkv/bias$", P("tp")),
    (r".*g_norm_swish_gate/weight$", P()),            # per-head-channel, replicated
]


def _match(path: str, rules: Sequence[Tuple[str, P]]) -> P:
    for pat, spec in rules:
        if re.match(pat, path):
            return spec
    return P()


def _validate_spec(spec: P, shape: Tuple[int, ...], mesh: Mesh) -> P:
    """Drop sharding on axes the array can't evenly split (e.g. the odd
    SwiGLU hidden dim d*4//3); those fall back to replication."""
    out = []
    for i, axis in enumerate(spec):
        if axis is None:
            out.append(None)
            continue
        size = mesh.shape[axis] if isinstance(axis, str) else 1
        if i < len(shape) and shape[i] % size == 0:
            out.append(axis)
        else:
            out.append(None)
    return P(*out)


def param_shardings(params: Any, mesh: Mesh,
                    rules: Sequence[Tuple[str, P]] = DEFAULT_PARAM_RULES) -> Any:
    """Pytree of NamedShardings matching ``params``' structure."""
    flat = traverse_util.flatten_dict(params, sep="/")
    specs = {
        k: NamedSharding(mesh, _validate_spec(_match(k, rules), v.shape, mesh))
        for k, v in flat.items()
    }
    return traverse_util.unflatten_dict(specs, sep="/")


def shard_params(params: Any, mesh: Mesh,
                 rules: Sequence[Tuple[str, P]] = DEFAULT_PARAM_RULES) -> Any:
    """Device-put params according to the rules."""
    shardings = param_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


# Audio-TIME axis position per TTS batch key (data/collate.py layout),
# used when the mesh carries a context-parallel "cp" axis: those axes are
# additionally sharded over cp so the GLA CP op (ops/gla_cp.py) sees its
# time shards. Text-side arrays (text_token, encoder_mask) stay cp-replicated.
_TTS_TIME_AXIS = {
    "audio_token": 1,
    "y_mask": 1,
    "reset_mask": 1,
    "crossatt_mask": 1,
    "crossatt_pos": 1,
}


def _batch_spec(key: str, mesh: Mesh) -> P:
    if "cp" in mesh.axis_names and key in _TTS_TIME_AXIS:
        axes = [None] * (_TTS_TIME_AXIS[key] + 1)
        axes[0] = "dp"
        axes[_TTS_TIME_AXIS[key]] = "cp"
        return P(*axes)
    return P("dp")


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every array's leading (batch) axis over dp; on a cp mesh the
    known audio-time axes are additionally sharded over cp."""
    if isinstance(batch, dict):
        return {
            k: jax.device_put(x, NamedSharding(mesh, _batch_spec(k, mesh)))
            for k, x in batch.items()
        }
    spec = NamedSharding(mesh, P("dp"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, spec), batch)


def batch_shardings(batch: Any, mesh: Mesh) -> Any:
    if isinstance(batch, dict):
        return {k: NamedSharding(mesh, _batch_spec(k, mesh)) for k in batch}
    spec = NamedSharding(mesh, P("dp"))
    return jax.tree_util.tree_map(lambda _: spec, batch)
