"""WavTokenizer torch-layout conversion roundtrip on a tiny config."""
import re

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from lina_speech_tpu.codec.wavtokenizer import WavTokenizer, WavTokenizerConfig
from lina_speech_tpu.utils.convert_wavtokenizer import convert_torch_wavtokenizer


def fabricate_sd(flat, n_ratios):
    """Build a torch-layout state_dict carrying fresh values for every param."""
    rng = np.random.default_rng(0)
    sd = {}
    expected = {}
    enc = "feature_extractor.encodec.encoder.model"
    lstm_idx = 1 + 3 * n_ratios
    convout_idx = lstm_idx + 2

    def fresh(path):
        v = rng.normal(size=np.asarray(flat[path]).shape).astype(np.float32)
        expected[path] = v
        return v

    for path in flat:
        rel = re.sub(r"^params/", "", path)
        v = fresh(path)
        if m := re.match(r"^backbone/embed/(kernel|bias)$", rel):
            key = "backbone.embed." + ("weight" if m.group(1) == "kernel" else "bias")
            sd[key] = v.transpose(2, 1, 0) if m.group(1) == "kernel" else v
        elif m := re.match(r"^backbone/pos_net_(\d)/(\w+)/(kernel|bias|scale)$", rel):
            i, sub, leaf = m.groups()
            key = f"backbone.pos_net.{i}.{sub}." + (
                "weight" if leaf in ("kernel", "scale") else "bias")
            sd[key] = v.transpose(2, 1, 0) if leaf == "kernel" else v
        elif m := re.match(r"^backbone/pos_net_5/(scale|bias)$", rel):
            sd["backbone.pos_net.5." + ("weight" if m.group(1) == "scale" else "bias")] = v
        elif m := re.match(r"^backbone/(norm|final_layer_norm)/(scale|bias)$", rel):
            sd[f"backbone.{m.group(1)}." + ("weight" if m.group(2) == "scale" else "bias")] = v
        elif m := re.match(r"^backbone/convnext_(\d+)/(.*)$", rel):
            i, sub = m.groups()
            t = f"backbone.convnext.{i}"
            if sub == "dwconv/kernel":
                sd[f"{t}.dwconv.weight"] = v.transpose(2, 1, 0)
            elif sub == "dwconv/bias":
                sd[f"{t}.dwconv.bias"] = v
            elif sub.endswith("/kernel"):
                sd[f"{t}.{sub.split('/')[0]}.weight"] = v.T
            elif sub.endswith("/bias"):
                sd[f"{t}.{sub.split('/')[0]}.bias"] = v
            elif sub == "norm/scale":
                sd[f"{t}.norm.weight"] = v
            elif sub == "gamma":
                sd[f"{t}.gamma"] = v
        elif m := re.match(r"^head/out/(kernel|bias)$", rel):
            sd["head.out." + ("weight" if m.group(1) == "kernel" else "bias")] = (
                v.T if m.group(1) == "kernel" else v
            )
        elif rel == "codebook":
            for q in range(v.shape[0]):
                sd[f"feature_extractor.encodec.quantizer.vq.layers.{q}._codebook.embed"] = v[q]
        elif m := re.match(r"^encoder/conv_in/(kernel|bias)$", rel):
            t = f"{enc}.0.conv.conv"
            sd[f"{t}.weight" if m.group(1) == "kernel" else f"{t}.bias"] = (
                v.transpose(2, 1, 0) if m.group(1) == "kernel" else v
            )
        elif m := re.match(r"^encoder/conv_out/(kernel|bias)$", rel):
            t = f"{enc}.{convout_idx}.conv.conv"
            sd[f"{t}.weight" if m.group(1) == "kernel" else f"{t}.bias"] = (
                v.transpose(2, 1, 0) if m.group(1) == "kernel" else v
            )
        elif m := re.match(r"^encoder/down_(\d)/(kernel|bias)$", rel):
            t = f"{enc}.{3 + 3 * int(m.group(1))}.conv.conv"
            sd[f"{t}.weight" if m.group(2) == "kernel" else f"{t}.bias"] = (
                v.transpose(2, 1, 0) if m.group(2) == "kernel" else v
            )
        elif m := re.match(r"^encoder/res_(\d)_(\d)/(conv1|conv2|shortcut)/(kernel|bias)$", rel):
            i, j, sub, leaf = m.groups()
            seq = f"{enc}.{1 + 3 * int(i)}"
            tmap = {"conv1": f"{seq}.block.1.conv.conv",
                    "conv2": f"{seq}.block.3.conv.conv",
                    "shortcut": f"{seq}.shortcut.conv.conv"}
            sd[f"{tmap[sub]}.weight" if leaf == "kernel" else f"{tmap[sub]}.bias"] = (
                v.transpose(2, 1, 0) if leaf == "kernel" else v
            )
        elif m := re.match(r"^encoder/lstm/(w_ih|w_hh|b_ih|b_hh)_(\d)$", rel):
            kind, layer = m.groups()
            t = (f"{enc}.{lstm_idx}.lstm."
                 + kind.replace("w_", "weight_").replace("b_", "bias_") + f"_l{layer}")
            sd[t] = v.T if kind.startswith("w") else v
        else:
            raise AssertionError(f"fabricate_sd missing rule for {rel}")
    return sd, expected


def test_wavtokenizer_conversion_roundtrip():
    cfg = WavTokenizerConfig(
        ratios=(4, 2), n_filters=2, latent_dim=16, bins=32,
        backbone_dim=32, backbone_intermediate_dim=64, backbone_layers=2,
        n_fft=16, hop_length=8,
    )
    wt = WavTokenizer(cfg)
    params = wt.init(jax.random.PRNGKey(0), jnp.zeros((1, 64)))
    flat = traverse_util.flatten_dict(params, sep="/")
    sd, expected = fabricate_sd(flat, n_ratios=2)

    out = convert_torch_wavtokenizer(sd, params, n_ratios=2, strict=True)
    out_flat = traverse_util.flatten_dict(out, sep="/")
    for path in flat:
        np.testing.assert_allclose(out_flat[path], expected[path], rtol=1e-6,
                                   err_msg=path)


def test_weight_norm_convs_fold():
    """weight_g/weight_v pairs in the SEANet convs are folded."""
    cfg = WavTokenizerConfig(
        ratios=(2,), n_filters=2, latent_dim=8, bins=8,
        backbone_dim=32, backbone_intermediate_dim=32, backbone_layers=1,
        n_fft=16, hop_length=8,
    )
    wt = WavTokenizer(cfg)
    params = wt.init(jax.random.PRNGKey(0), jnp.zeros((1, 32)))
    flat = traverse_util.flatten_dict(params, sep="/")
    sd, expected = fabricate_sd(flat, n_ratios=1)
    # convert conv_in to weight-normed form: w = g * v/||v||
    key = "feature_extractor.encodec.encoder.model.0.conv.conv"
    w = sd.pop(f"{key}.weight")
    rng = np.random.default_rng(1)
    g = np.sqrt((w ** 2).sum(axis=(1, 2), keepdims=True))
    v = w * rng.uniform(0.5, 2.0)  # scaled direction; g set to true norms of w
    g = np.sqrt((w ** 2).sum(axis=(1, 2), keepdims=True))
    sd[f"{key}.weight_g"] = g
    sd[f"{key}.weight_v"] = w  # v == w, g == ||w|| -> folded == w
    out = convert_torch_wavtokenizer(sd, params, n_ratios=1, strict=True)
    out_flat = traverse_util.flatten_dict(out, sep="/")
    got = out_flat["params/encoder/conv_in/kernel"]
    np.testing.assert_allclose(got, w.transpose(2, 1, 0), rtol=1e-5)