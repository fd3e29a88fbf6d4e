"""Which weight groups cause the W8 decode quality loss? (CPU study)

BASELINE.md records a 6.9% teacher-forced argmax flip rate for
``weight_quant="int8"`` at the flagship config — far above what
per-output-channel W8 usually costs. This script attributes the error to
parameter groups on a shrunk flagship-structured model (same module
tree, smaller dims) by quantizing ONE group at a time ("only-X" arms)
along a fixed teacher-forced token trajectory, plus finer-granularity
arms (group-wise scales along the contraction axis, fake-quantized
host-side) to measure the headroom a sub-channel kernel would buy.

Usage: python scripts/quality_w8_sensitivity.py [--steps 192 --batch 8]
Prints one JSON line per arm.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/qcache")

import jax.numpy as jnp
import numpy as np

from scripts.quality_lossy_decode import forced_decode_logits  # noqa: E402


def fake_quant_groupwise(params, group: int, min_size: int):
    """Quantize-dequantize the same leaves quantize_dense_params targets,
    but with a scale per ``group`` input rows (contraction-axis groups)
    per output channel. Numerically identical to a kernel that applies
    (d/group, n) scales in its epilogue."""

    def qd1(wf, axis):
        """Quantize-dequantize along contraction ``axis`` in row groups of
        ``group`` (remainder group allowed — dims need not divide)."""
        out = np.empty_like(wf)
        d = wf.shape[axis]
        for lo in range(0, d, group):
            sl = [slice(None)] * wf.ndim
            sl[axis] = slice(lo, min(lo + group, d))
            blk = wf[tuple(sl)]
            s = np.maximum(np.abs(blk).max(axis=axis, keepdims=True) / 127.0,
                           1e-12)
            out[tuple(sl)] = np.clip(np.round(blk / s), -127, 127) * s
        return out

    def qd(w):
        wf = np.asarray(w, np.float32)
        # 2-D kernels contract over axis 0; logits_weight (q, l, d) over d
        return jnp.asarray(qd1(wf, 0 if w.ndim == 2 else w.ndim - 1))

    def walk(node):
        if isinstance(node, dict):
            return {
                k: (qd(v)
                    if ((k == "kernel" and hasattr(v, "ndim") and v.ndim == 2
                         and v.shape[1] >= 32 and v.size >= min_size)
                        or (k == "logits_weight" and hasattr(v, "ndim")
                            and v.ndim == 3 and v.size >= min_size))
                    else walk(v))
                for k, v in node.items()
            }
        return node

    return walk(params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=192)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--min-size", type=int, default=8192)
    args = ap.parse_args()

    from lina_speech_tpu.config import (TextEncoderConfig, build_model,
                                        lina_gla_169m)

    cfg = lina_gla_169m(compute_dtype="bfloat16", d_model=args.d,
                        n_codebook=1024,
                        text_encoder=TextEncoderConfig(dim=args.d,
                                                       n_layers=2))
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(
            cfg.backbone, d_model=args.d, n_layer=args.layers,
            state_dtype="bfloat16"))
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    b, T, L = args.batch, args.steps, 8
    x = jax.random.randint(key, (b, 24), 3, cfg.n_txt_vocab)
    tokens = jax.random.randint(jax.random.PRNGKey(5),
                                (cfg.n_quant, b, T), 3, cfg.n_codebook + 3)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(1), x[:2], tokens.transpose(1, 2, 0)[:2, :16],
        jnp.ones((2, 24, 24), bool),
        jnp.ones((2, 16, 24), bool), jnp.ones((2, 16), bool))

    # discover quantized paths (full arm) for the group matchers
    from lina_speech_tpu.utils.quantize import QKEY, quantize_dense_params
    hits = []

    def walk(n, p=""):
        if isinstance(n, dict):
            if QKEY in n:
                hits.append(p)
                return
            for k, v in n.items():
                walk(v, f"{p}/{k}")

    walk(quantize_dense_params(params, min_size=args.min_size))

    def leaf_group(path):
        seg = path.split("/")
        return seg[-1] if seg[-1] == "logits_weight" else seg[-2]

    groups = sorted({leaf_group(h) for h in hits if "txt_encoder" not in h})
    print(json.dumps({"quantized_leaves": len(hits), "groups": groups}))

    lg_fp = forced_decode_logits(model, params, x, tokens, L, None)
    ref = np.asarray(lg_fp, np.float32)
    ref_arg = ref.argmax(-1)
    scale = float(np.abs(ref).mean())

    def arm(name, **kw):
        lg = np.asarray(forced_decode_logits(model, params, x, tokens, L,
                                             None, **kw), np.float32)
        flips = float((lg.argmax(-1) != ref_arg).mean())
        print(json.dumps({
            "arm": name,
            "argmax_flip_rate": round(flips, 5),
            "logit_delta_mean": round(float(np.abs(lg - ref).mean()), 5),
            "logit_delta_max": round(float(np.abs(lg - ref).max()), 4),
            "ref_logit_scale": round(scale, 3),
        }), flush=True)

    arm("w8_full", weight_quant="int8", quant_min_size=args.min_size)
    for g in groups:
        # "only-X": quantize just this module group (exact path-segment
        # match — the leaf's parent module name, or logits_weight itself)
        arm(f"w8_only_{g}", weight_quant="int8",
            quant_min_size=args.min_size,
            quant_exclude=lambda p, g=g: leaf_group(p) != g)
    arm("w8_no_head", weight_quant="int8", quant_min_size=args.min_size,
        quant_exclude=lambda p: leaf_group(p) == "logits_weight")
    arm("w8_no_ffn_head", weight_quant="int8", quant_min_size=args.min_size,
        quant_exclude=lambda p: leaf_group(p) in
        ("logits_weight", "p_in", "p_out"))
    for gs in (128, 64):
        lgq = np.asarray(forced_decode_logits(
            model, fake_quant_groupwise(params, gs, args.min_size), x,
            tokens, L, None), np.float32)
        flips = float((lgq.argmax(-1) != ref_arg).mean())
        print(json.dumps({
            "arm": f"w8_groupscale_{gs}",
            "argmax_flip_rate": round(flips, 5),
            "logit_delta_mean": round(float(np.abs(lgq - ref).mean()), 5),
            "logit_delta_max": round(float(np.abs(lgq - ref).max()), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
