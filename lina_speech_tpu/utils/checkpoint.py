"""Checkpointing: orbax save/restore + PyTorch-reference weight conversion.

The reference checkpoints are Lightning state_dicts (train_lina.py:62-64,
names rooted at ``model.``). :func:`convert_torch_lina` maps them onto our
flax param tree so the released 169M Lina-GLA weights load for golden-token
parity (SURVEY §4). Linear kernels transpose (torch (out, in) -> flax
(in, out)); depthwise conv weights (d, 1, w) squeeze to (d, w); LayerNorm
weight/bias -> scale/bias; torch LSTM / weight-norm folding helpers for the
codec are included for the WavTokenizer converter.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import traverse_util


# ---------------------------------------------------------------- orbax
def save_checkpoint(path: str, state: Any, step: Optional[int] = None) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        path if step is None else f"{path}/step_{step}", state, force=True
    )
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target: Any = None) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target)


# ------------------------------------------------- torch name mapping
def torch_key_for(flax_path: str) -> Optional[str]:
    """Map a flax param path (slash-joined, no leading 'params') to the
    reference state_dict key (without the 'model.' root).

    Returns None for params with no torch counterpart."""
    p = flax_path

    # indexed module lists: encoder_3 -> encoder.3
    p = re.sub(r"(encoder|decoder|sa|blocks|convnext)_(\d+)", r"\1.\2", p)

    rules = [
        (r"^txt_embed/embedding$", "txt_embed.weight"),
        (r"^rvq_embed/weight$", "rvq_embed.weight"),
        (r"^logits_weight$", "logits_head.weight"),
        (r"^txt_encoder/", "txt_encoder."),
        (r"^attentive_rnn/", "attentive_rnn."),
        (r"^spk_encoder/", "spk_encoder."),
    ]
    for pat, rep in rules:
        p = re.sub(pat, rep, p)
    if p == flax_path and "/" in p:
        return None

    # leaf-level renames
    p = p.replace("/", ".")
    p = re.sub(r"\.gk_proj_1\.", ".gk_proj.0.", p)
    p = re.sub(r"\.gk_proj_2\.", ".gk_proj.1.", p)
    p = re.sub(r"\.(q_conv1d|k_conv1d|v_conv1d|h_conv1d)\.kernel$", r".\1.weight", p)
    p = re.sub(r"\.pos_embed\.embed\.embedding$", ".pos_embed.embed.weight", p)
    p = re.sub(r"\.pos_embed\.conv_kernel$", ".pos_embed.dw_conv.weight", p)
    p = re.sub(r"\.pos_embed\.conv_bias$", ".pos_embed.dw_conv.bias", p)
    p = re.sub(r"\.g_norm_swish_gate\.weight$", ".g_norm_swish_gate.weight", p)
    # LayerNorm: flax scale/bias -> torch weight/bias
    p = re.sub(r"\.(norm1|norm2|ln_q|ln_k|ln_v)\.scale$", r".\1.weight", p)
    p = re.sub(r"\.(norm1|norm2|ln_q|ln_k|ln_v)\.bias$", r".\1.bias", p)
    # Dense: kernel -> weight
    p = re.sub(r"\.kernel$", ".weight", p)
    # Embed: embedding -> weight
    p = re.sub(r"\.embedding$", ".weight", p)
    return p


def _to_flax(torch_val: np.ndarray, flax_path: str, flax_shape) -> np.ndarray:
    v = np.asarray(torch_val)
    if flax_path.endswith("/kernel") and v.ndim == 2:
        v = v.T  # torch Linear (out, in) -> flax (in, out)
    elif re.search(r"(q_conv1d|k_conv1d|v_conv1d|h_conv1d)/kernel$", flax_path):
        v = v.reshape(v.shape[0], v.shape[-1])  # (d, 1, w) -> (d, w)
    elif flax_path.endswith("pos_embed/conv_kernel"):
        # torch depthwise (d, 1, k) -> lax HIO (k, 1, d)
        v = v.transpose(2, 1, 0)
    assert tuple(v.shape) == tuple(flax_shape), (
        f"{flax_path}: torch {v.shape} vs flax {flax_shape}"
    )
    return v


# torch keys with no flax counterpart by design: rotary frequencies are
# nn.Parameters in rotary_embedding_torch but we compute them analytically.
_IGNORABLE_TORCH_KEYS = (r"\.rotary\.freqs$",)


def convert_torch_lina(state_dict: Dict[str, np.ndarray], params: Any,
                       strict: bool = True) -> Any:
    """Fill our flax ``params`` pytree from a reference state_dict.

    ``state_dict`` keys may carry the Lightning "model." root (stripped).
    ``strict`` raises both on flax params with no matching torch entry AND
    on torch entries no flax param consumed (excluding
    ``_IGNORABLE_TORCH_KEYS``) — a name-mapping bug must surface loudly,
    not as a silently random-initialized layer.
    """
    sd = {re.sub(r"^model\.", "", k): v for k, v in state_dict.items()}
    flat = traverse_util.flatten_dict(params, sep="/")
    out = {}
    missing = []
    consumed = set()
    for path, val in flat.items():
        rel = re.sub(r"^params/", "", path)
        tkey = torch_key_for(rel)
        if tkey is not None and tkey in sd:
            out[path] = _to_flax(sd[tkey], rel, val.shape).astype(np.asarray(val).dtype)
            consumed.add(tkey)
        else:
            missing.append((path, tkey))
            out[path] = val
    if strict:
        unused = [
            k for k in sd
            if k not in consumed
            and not any(re.search(p, k) for p in _IGNORABLE_TORCH_KEYS)
        ]
        errs = []
        if missing:
            errs.append(f"unmatched flax params: {missing[:10]} "
                        f"(+{max(0, len(missing) - 10)} more)")
        if unused:
            errs.append(f"unconsumed torch keys: {sorted(unused)[:10]} "
                        f"(+{max(0, len(unused) - 10)} more)")
        if errs:
            raise KeyError("; ".join(errs))
    return traverse_util.unflatten_dict(out, sep="/")


def average_checkpoints(param_trees) -> Any:
    """Average several param pytrees (the reference averages the best-3
    vocoder checkpoints by val loss, decoder/pretrained.py:117-156)."""
    import jax

    n = len(param_trees)
    assert n > 0
    return jax.tree_util.tree_map(
        lambda *leaves: (
            sum(np.asarray(l, np.float64) for l in leaves) / n
        ).astype(np.asarray(leaves[0]).dtype),
        *param_trees,
    )


def fold_weight_norm(weight_g: np.ndarray, weight_v: np.ndarray) -> np.ndarray:
    """Fold torch weight_norm (g, v) into a plain conv kernel:
    w = g * v / ||v||, norm over all dims except dim 0 (torch default)."""
    v = np.asarray(weight_v)
    g = np.asarray(weight_g)
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / norm
