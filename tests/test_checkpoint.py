"""Checkpoint conversion tests: torch-layout roundtrip + orbax save/restore."""
import re

import jax
import numpy as np
import pytest
from flax import traverse_util

from lina_speech_tpu.utils.checkpoint import (
    convert_torch_lina,
    fold_weight_norm,
    torch_key_for,
)

from test_model import model_and_params


def _to_torch_layout(rel_path, v):
    """Inverse of checkpoint._to_flax for test fabrication."""
    v = np.asarray(v)
    if re.search(r"(q_conv1d|k_conv1d|v_conv1d|h_conv1d)/kernel$", rel_path):
        return v.reshape(v.shape[0], 1, v.shape[1])
    if rel_path.endswith("pos_embed/conv_kernel"):
        return v.transpose(2, 1, 0)
    if rel_path.endswith("/kernel") and v.ndim == 2:
        return v.T
    return v


def test_torch_roundtrip_identity():
    model, params, _ = model_and_params()
    flat = traverse_util.flatten_dict(params, sep="/")

    # fabricate a torch state_dict holding DIFFERENT values (so we can tell
    # conversion actually loaded them)
    rng = np.random.default_rng(0)
    sd = {}
    expected = {}
    for path, v in flat.items():
        rel = re.sub(r"^params/", "", path)
        tkey = torch_key_for(rel)
        assert tkey is not None, f"no torch mapping for {rel}"
        new_val = rng.normal(size=np.asarray(v).shape).astype(np.float32)
        expected[path] = new_val
        sd["model." + tkey] = _to_torch_layout(rel, new_val)

    out = convert_torch_lina(sd, params, strict=True)
    out_flat = traverse_util.flatten_dict(out, sep="/")
    for path in flat:
        np.testing.assert_allclose(out_flat[path], expected[path], rtol=1e-6)


def test_torch_key_examples():
    assert torch_key_for("txt_embed/embedding") == "txt_embed.weight"
    assert torch_key_for("logits_weight") == "logits_head.weight"
    assert (
        torch_key_for("attentive_rnn/encoder_3/tmix/gk_proj_1/kernel")
        == "attentive_rnn.encoder.3.tmix.gk_proj.0.weight"
    )
    assert (
        torch_key_for("attentive_rnn/encoder_0/tmix/q_conv1d/kernel")
        == "attentive_rnn.encoder.0.tmix.q_conv1d.weight"
    )
    assert (
        torch_key_for("attentive_rnn/cross_att/pos_net/norm1/scale")
        == "attentive_rnn.cross_att.pos_net.norm1.weight"
    )
    assert (
        torch_key_for("txt_encoder/sa_1/tmix/qkv/bias")
        == "txt_encoder.sa.1.tmix.qkv.bias"
    )


def test_fold_weight_norm():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(8, 4, 3))
    g = rng.uniform(0.5, 2.0, size=(8, 1, 1))
    w = fold_weight_norm(g, v)
    norms = np.sqrt((v ** 2).sum(axis=(1, 2)))
    np.testing.assert_allclose(
        np.sqrt((w ** 2).sum(axis=(1, 2))), g[:, 0, 0], rtol=1e-6
    )


def test_orbax_save_restore(tmp_path):
    from lina_speech_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint

    model, params, _ = model_and_params()
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params)
    restored = restore_checkpoint(path, params)
    a = traverse_util.flatten_dict(params, sep="/")
    b = traverse_util.flatten_dict(restored, sep="/")
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
