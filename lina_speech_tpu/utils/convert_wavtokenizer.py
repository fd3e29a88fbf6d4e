"""WavTokenizer torch checkpoint -> lina_speech_tpu params conversion.

Maps the reference vocoder checkpoint layout (decoder/pretrained.py:96-114:
keys rooted at ``backbone. / head. / feature_extractor.``) onto our
:class:`lina_speech_tpu.codec.wavtokenizer.WavTokenizer` param tree:

- torch Conv1d (out, in, k) -> lax HIO (k, in, out); depthwise (d, 1, k) ->
  (k, 1, d); Linear (out, in) -> (in, out); LayerNorm/GroupNorm weight ->
  scale.
- SEANet convs are weight-normed in torch (weight_g/weight_v) — folded here
  (utils.checkpoint.fold_weight_norm).
- the encoder Sequential indices follow seanet.py:107-141:
  [conv_in, (res, ELU, down) x len(ratios), SLSTM, ELU, conv_out].
- VQ codebooks: quantizer.vq.layers.{i}._codebook.embed -> codebook[i].
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional

import numpy as np
from flax import traverse_util

from lina_speech_tpu.utils.checkpoint import fold_weight_norm


def _conv_w(v: np.ndarray) -> np.ndarray:
    """torch Conv1d (out, in, k) -> (k, in, out)."""
    return np.ascontiguousarray(np.transpose(v, (2, 1, 0)))


def _get_conv(sd: Dict[str, np.ndarray], prefix: str) -> Optional[np.ndarray]:
    """Fetch a conv weight, folding weight-norm if present."""
    if f"{prefix}.weight" in sd:
        return np.asarray(sd[f"{prefix}.weight"])
    if f"{prefix}.weight_v" in sd:
        return fold_weight_norm(np.asarray(sd[f"{prefix}.weight_g"]),
                                np.asarray(sd[f"{prefix}.weight_v"]))
    return None


def convert_torch_wavtokenizer(state_dict: Dict[str, np.ndarray], params: Any,
                               n_ratios: int = 4, strict: bool = True) -> Any:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    flat = traverse_util.flatten_dict(params, sep="/")
    out: Dict[str, np.ndarray] = {}
    missing = []

    def put(path: str, val: Optional[np.ndarray]):
        if val is None:
            missing.append(path)
            out[path] = flat[path]
            return
        assert tuple(val.shape) == tuple(flat[path].shape), (
            f"{path}: {val.shape} vs {flat[path].shape}"
        )
        out[path] = val.astype(np.asarray(flat[path]).dtype)

    enc_prefix = "feature_extractor.encodec.encoder.model"
    # Sequential layout: 0 conv_in; per ratio i: (1+3i) res, (2+3i) ELU,
    # (3+3i) down; then lstm, ELU, conv_out.
    lstm_idx = 1 + 3 * n_ratios
    convout_idx = lstm_idx + 2

    for path, v in flat.items():
        rel = re.sub(r"^params/", "", path)
        tv: Optional[np.ndarray] = None

        # ---------------- vocoder backbone ----------------
        if m := re.match(r"^backbone/(embed)/(kernel|bias)$", rel):
            w = _get_conv(sd, "backbone.embed")
            tv = _conv_w(w) if m.group(2) == "kernel" else sd.get("backbone.embed.bias")
        elif m := re.match(r"^backbone/pos_net_(\d)/(norm\d?|q|k|v|proj_out|conv\d)/(kernel|bias|scale)$", rel):
            i, sub, leaf = m.groups()
            t = f"backbone.pos_net.{i}.{sub}"
            if leaf == "kernel":
                tv = _conv_w(_get_conv(sd, t))
            elif leaf == "scale":
                tv = sd.get(f"{t}.weight")
            else:
                tv = sd.get(f"{t}.bias")
        elif m := re.match(r"^backbone/pos_net_5/(scale|bias)$", rel):
            tv = sd.get("backbone.pos_net.5." + ("weight" if m.group(1) == "scale" else "bias"))
        elif m := re.match(r"^backbone/norm/(scale|bias)$", rel):
            tv = sd.get("backbone.norm." + ("weight" if m.group(1) == "scale" else "bias"))
        elif m := re.match(r"^backbone/final_layer_norm/(scale|bias)$", rel):
            tv = sd.get("backbone.final_layer_norm." + ("weight" if m.group(1) == "scale" else "bias"))
        elif m := re.match(r"^backbone/convnext_(\d+)/(.*)$", rel):
            i, sub = m.groups()
            t = f"backbone.convnext.{i}"
            if sub == "dwconv/kernel":
                tv = _conv_w(_get_conv(sd, f"{t}.dwconv"))
            elif sub == "dwconv/bias":
                tv = sd.get(f"{t}.dwconv.bias")
            elif sub == "norm/scale":
                tv = sd.get(f"{t}.norm.weight")
            elif sub == "norm/bias":
                tv = sd.get(f"{t}.norm.bias")
            elif sub == "pwconv1/kernel":
                tv = sd.get(f"{t}.pwconv1.weight")
                tv = tv.T if tv is not None else None
            elif sub == "pwconv1/bias":
                tv = sd.get(f"{t}.pwconv1.bias")
            elif sub == "pwconv2/kernel":
                tv = sd.get(f"{t}.pwconv2.weight")
                tv = tv.T if tv is not None else None
            elif sub == "pwconv2/bias":
                tv = sd.get(f"{t}.pwconv2.bias")
            elif sub == "gamma":
                tv = sd.get(f"{t}.gamma")
        # ---------------- head ----------------
        elif m := re.match(r"^head/out/(kernel|bias)$", rel):
            if m.group(1) == "kernel":
                w = sd.get("head.out.weight")
                tv = w.T if w is not None else None
            else:
                tv = sd.get("head.out.bias")
        # ---------------- VQ codebook ----------------
        elif rel == "codebook":
            layers = []
            for i in range(flat[path].shape[0]):
                key = f"feature_extractor.encodec.quantizer.vq.layers.{i}._codebook.embed"
                if key not in sd:
                    layers = None
                    break
                layers.append(sd[key])
            tv = np.stack(layers) if layers else None
        # ---------------- SEANet encoder ----------------
        elif m := re.match(r"^encoder/conv_in/(kernel|bias)$", rel):
            t = f"{enc_prefix}.0.conv.conv"
            tv = _conv_w(_get_conv(sd, t)) if m.group(1) == "kernel" else sd.get(f"{t}.bias")
        elif m := re.match(r"^encoder/conv_out/(kernel|bias)$", rel):
            t = f"{enc_prefix}.{convout_idx}.conv.conv"
            tv = _conv_w(_get_conv(sd, t)) if m.group(1) == "kernel" else sd.get(f"{t}.bias")
        elif m := re.match(r"^encoder/down_(\d)/(kernel|bias)$", rel):
            i = int(m.group(1))
            t = f"{enc_prefix}.{3 + 3 * i}.conv.conv"
            tv = _conv_w(_get_conv(sd, t)) if m.group(2) == "kernel" else sd.get(f"{t}.bias")
        elif m := re.match(r"^encoder/res_(\d)_(\d)/(conv1|conv2|shortcut)/(kernel|bias)$", rel):
            i, j, sub, leaf = m.groups()
            seq = f"{enc_prefix}.{1 + 3 * int(i)}"
            # block Sequential: [ELU, conv(k3), ELU, conv(k1)]; shortcut separate
            tmap = {"conv1": f"{seq}.block.1.conv.conv",
                    "conv2": f"{seq}.block.3.conv.conv",
                    "shortcut": f"{seq}.shortcut.conv.conv"}
            t = tmap[sub]
            tv = _conv_w(_get_conv(sd, t)) if leaf == "kernel" else sd.get(f"{t}.bias")
        elif m := re.match(r"^encoder/lstm/(w_ih|w_hh|b_ih|b_hh)_(\d)$", rel):
            kind, layer = m.groups()
            t = f"{enc_prefix}.{lstm_idx}.lstm.{kind.replace('w_', 'weight_').replace('b_', 'bias_')}_l{layer}"
            tv = sd.get(t)
            if tv is not None and kind.startswith("w"):
                tv = tv.T  # torch (4H, in) -> (in, 4H)
        put(path, tv)

    if strict and missing:
        raise KeyError(f"unmatched params: {missing[:8]} (+{max(0, len(missing)-8)})")
    return traverse_util.unflatten_dict(out, sep="/")
