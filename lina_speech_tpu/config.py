"""Config system: typed dataclasses + YAML with linked fields.

Replaces the reference's LightningCLI/jsonargparse/omegaconf YAML configs
(train_lina.py:122-129). The one linked field the reference wires —
``data.quant_layer -> model.quant_layer`` — is resolved in
:func:`load_config`. Model presets mirror the released checkpoints
(README.md:34-37: Lina-GLA 169M, d1024 l12 conv-blind short-conv).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    kind: str = "gla"  # gla | simple_gla | rwkv6 | mamba | transformer
    d_model: int = 1024
    n_layer: int = 12
    heads: int = 4
    dropout_att: float = 0.0
    dropout: float = 0.0
    blind: bool = True
    cross_att_pp: bool = False
    d_blind: Optional[int] = None
    rotary: bool = False
    use_short_conv: bool = True
    expand_k: float = 1.0
    expand_v: float = 2.0
    pos_type: str = "convolutional"
    chunk_size: int = 64
    remat: bool = False
    cross_att_layers: Tuple[int, ...] = ()  # for the interleaved CrossAttGLA variant
    state_dtype: str = "float32"  # "bfloat16" halves decode HBM traffic
    # Kernel dispatch (training chunk scan AND the decode step):
    #   auto         — Pallas kernels on TPU, XLA elsewhere (backend probed
    #                  at trace time; override explicitly when tracing a
    #                  program for a different platform than the default
    #                  backend, e.g. under the ambient remote-TPU backend).
    #   chunk_pallas — force the Pallas kernels everywhere (interpret mode
    #                  off-TPU; exercises their sharding rules in CPU tests).
    #   chunk        — force the XLA chunk scan + XLA decode step.
    #   scan         — naive lax.scan oracle (tests only).
    # All Pallas kernels carry custom-partitioning rules and shard under
    # dp x tp meshes; no fallback is needed for multi-chip training.
    kernel_mode: str = "auto"
    # Context parallelism (kind="gla" only): name of the mesh axis the
    # audio TIME axis is sharded over during training (ops/gla_cp.py).
    # Requires an ambient mesh (jax.set_mesh) carrying the axis, audio
    # sequence length divisible by its size, and cp-aware batch sharding
    # (parallel/sharding.py::shard_batch with the cp mesh). The reference
    # has no equivalent (DDP only, train_lina.py:91).
    cp_axis: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    dim: int = 1024
    heads: int = 4
    n_layers: int = 4
    dropout: float = 0.1
    rotary: bool = True


@dataclasses.dataclass(frozen=True)
class SpeakerEncoderConfig:
    dim_inner: int = 256
    heads: int = 4
    n_layers: int = 6
    window_length: int = 256


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    backbone: BackboneConfig = BackboneConfig()
    text_encoder: TextEncoderConfig = TextEncoderConfig()
    spk_encoder: Optional[SpeakerEncoderConfig] = None
    d_model: int = 1024
    quant_layer: Tuple[int, ...] = (0,)  # which codec quantizer levels (len == n_quant)
    n_codebook: int = 4096
    n_special_token_in: int = 3
    n_special_token_out: int = 3
    n_txt_vocab: int = 256
    tie_embed: bool = False
    mask_text_p: float = 0.0
    compute_dtype: str = "float32"  # float32 | bfloat16

    @property
    def n_quant(self) -> int:
        return len(self.quant_layer)


def lina_gla_169m(**overrides) -> ModelConfig:
    """The released flagship: Lina-GLA "169M", WavTokenizer nq1 (README.md:31-37).

    NB the reference README's "169M" label does not match its own code: at
    the reference defaults this architecture (d1024, 12+12 GLA blocks +
    pos_net, expand_v=2, SwiGLU FFNs, text encoder, embeddings/head) counts
    ~359M parameters (reference gla.py:250-285 + modeling_lina.py:43-59 —
    verified by instantiating this rebuild and auditing the reference
    modules' shapes; the fla dependency is absent so the torch model can't
    be constructed here). This config reproduces the reference
    ARCHITECTURE exactly (shape-compatible with the released state_dict);
    perf figures quoted per "169M" in this repo are measured on the real
    ~359M model and are therefore conservative."""
    return dataclasses.replace(ModelConfig(), **overrides)


def lina_gla_tiny(**overrides) -> ModelConfig:
    """Small config for tests / smoke runs."""
    cfg = ModelConfig(
        backbone=BackboneConfig(d_model=64, n_layer=2, heads=2, chunk_size=16,
                                pos_type="sinusoidal"),
        text_encoder=TextEncoderConfig(dim=64, heads=2, n_layers=2, dropout=0.0),
        d_model=64,
        n_codebook=50,
    )
    return dataclasses.replace(cfg, **overrides)


def build_model(cfg: ModelConfig):
    """Construct the LinaModel (and backbone) from a config."""
    from lina_speech_tpu.models.attentive_rnn import AttentiveGLA, CrossAttGLA
    from lina_speech_tpu.models.encoder import TextEncoder
    from lina_speech_tpu.models.lina import LinaModel

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    b = cfg.backbone
    state_dtype = jnp.bfloat16 if b.state_dtype == "bfloat16" else jnp.float32
    if b.kind == "gla" and not b.cross_att_layers:
        rnn = AttentiveGLA(
            d_model=b.d_model, n_layer=b.n_layer, heads=b.heads,
            dropout_att=b.dropout_att, dropout=b.dropout, d_blind=b.d_blind,
            blind=b.blind, cross_att_pp=b.cross_att_pp, rotary=b.rotary,
            use_short_conv=b.use_short_conv, expand_k=b.expand_k,
            expand_v=b.expand_v, pos_type=b.pos_type, chunk_size=b.chunk_size,
            remat=b.remat, dtype=dtype, state_dtype=state_dtype,
            kernel_mode=b.kernel_mode, cp_axis=b.cp_axis,
        )
    elif b.kind == "gla":
        rnn = CrossAttGLA(
            d_model=b.d_model, n_layer=b.n_layer,
            cross_att_layers=tuple(b.cross_att_layers), heads=b.heads,
            dropout_att=b.dropout_att, dropout=b.dropout, rotary=b.rotary,
            use_short_conv=b.use_short_conv, expand_k=b.expand_k,
            expand_v=b.expand_v, chunk_size=b.chunk_size,
            kernel_mode=b.kernel_mode, cp_axis=b.cp_axis, dtype=dtype,
        )
    elif b.kind == "simple_gla":
        from lina_speech_tpu.models.simple_gla import AttentiveSimpleGLA

        rnn = AttentiveSimpleGLA(
            d_model=b.d_model, n_layer=b.n_layer, heads=b.heads,
            dropout_att=b.dropout_att, dropout=b.dropout, d_blind=b.d_blind,
            blind=b.blind, cross_att_pp=b.cross_att_pp, rotary=b.rotary,
            use_short_conv=b.use_short_conv, pos_type=b.pos_type,
            chunk_size=b.chunk_size, remat=b.remat,
            kernel_mode=b.kernel_mode, cp_axis=b.cp_axis, dtype=dtype,
        )
    elif b.kind == "rwkv6":
        from lina_speech_tpu.models.rwkv6 import AttentiveRWKV6

        rnn = AttentiveRWKV6(
            d_model=b.d_model, n_layer=b.n_layer, heads=b.heads,
            dropout_att=b.dropout_att, dropout=b.dropout, d_blind=b.d_blind,
            blind=b.blind, cross_att_pp=b.cross_att_pp, rotary=b.rotary,
            pos_type=b.pos_type, kernel_mode=b.kernel_mode,
            cp_axis=b.cp_axis, dtype=dtype,
        )
    elif b.kind == "mamba" and b.cross_att_layers:
        from lina_speech_tpu.models.mamba import CrossAttMamba

        rnn = CrossAttMamba(
            d_model=b.d_model, n_layer=b.n_layer,
            cross_att_layers=tuple(b.cross_att_layers), heads=b.heads,
            dropout_att=b.dropout_att, dropout=b.dropout, rotary=b.rotary,
            cp_axis=b.cp_axis, dtype=dtype,
        )
    elif b.kind == "mamba2":
        from lina_speech_tpu.models.mamba import AttentiveMamba2

        rnn = AttentiveMamba2(
            d_model=b.d_model, n_layer=b.n_layer, heads=b.heads,
            dropout_att=b.dropout_att, dropout=b.dropout, d_blind=b.d_blind,
            blind=b.blind, cross_att_pp=b.cross_att_pp, rotary=b.rotary,
            pos_type=b.pos_type,
            headdim=64 if (2 * b.d_model) % 64 == 0 else 16,
            cp_axis=b.cp_axis, dtype=dtype,
        )
    elif b.kind == "mamba":
        from lina_speech_tpu.models.mamba import AttentiveMamba

        rnn = AttentiveMamba(
            d_model=b.d_model, n_layer=b.n_layer, heads=b.heads,
            dropout_att=b.dropout_att, dropout=b.dropout, d_blind=b.d_blind,
            blind=b.blind, cross_att_pp=b.cross_att_pp, rotary=b.rotary,
            pos_type=b.pos_type, cp_axis=b.cp_axis, dtype=dtype,
        )
    elif b.kind == "transformer":
        from lina_speech_tpu.models.transformer import TransformerCrossAtt

        rnn = TransformerCrossAtt(
            d_model=b.d_model, n_layer=b.n_layer, heads=b.heads,
            cross_att_layers=tuple(b.cross_att_layers) or (b.n_layer // 2,),
            dropout_att=b.dropout_att, dtype=dtype,
        )
    else:
        raise ValueError(f"unknown backbone kind {b.kind}")

    te = cfg.text_encoder
    txt_encoder = TextEncoder(
        dim=te.dim, heads=te.heads, n_layers=te.n_layers, dropout=te.dropout,
        rotary=te.rotary, dtype=dtype,
    )
    spk_encoder = None
    if cfg.spk_encoder is not None:
        from lina_speech_tpu.models.encoder import SimpleSpeakerEncoder

        se = cfg.spk_encoder
        spk_encoder = SimpleSpeakerEncoder(
            dim=cfg.d_model, dim_inner=se.dim_inner, heads=se.heads,
            n_layers=se.n_layers, window_length=se.window_length, dtype=dtype,
        )
    return LinaModel(
        attentive_rnn=rnn,
        d_model=cfg.d_model,
        n_quant=cfg.n_quant,
        n_codebook=cfg.n_codebook,
        n_special_token_in=cfg.n_special_token_in,
        n_special_token_out=cfg.n_special_token_out,
        n_txt_vocab_base=cfg.n_txt_vocab,
        tie_embed=cfg.tie_embed,
        txt_encoder=txt_encoder,
        spk_encoder=spk_encoder,
        mask_text_p=cfg.mask_text_p,
        dtype=dtype,
    )


_NESTED_CONFIGS = {
    "backbone": BackboneConfig,
    "text_encoder": TextEncoderConfig,
    "spk_encoder": SpeakerEncoderConfig,
}


def _dataclass_from_dict(cls, d: Dict[str, Any]):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in fields:
            raise KeyError(f"unknown config key {k!r} for {cls.__name__}")
        if isinstance(v, dict) and k in _NESTED_CONFIGS:
            kwargs[k] = _dataclass_from_dict(_NESTED_CONFIGS[k], v)
        elif isinstance(v, dict) and dataclasses.is_dataclass(fields[k].default.__class__):
            kwargs[k] = _dataclass_from_dict(fields[k].default.__class__, v)
        elif isinstance(v, list):
            kwargs[k] = tuple(v)
        else:
            kwargs[k] = v
    return cls(**kwargs)


def load_config(path: str) -> Dict[str, Any]:
    """Load a YAML config with model/train/data sections and linked fields.

    Mirrors train_lina.py:125-127: data.quant_layer (if present) overrides
    model.quant_layer.
    """
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    model_d = raw.get("model", {})
    data_d = raw.get("data", {})
    if "quant_layer" in data_d:
        model_d["quant_layer"] = data_d["quant_layer"]
    model_cfg = _dataclass_from_dict(ModelConfig, model_d)
    from lina_speech_tpu.train.harness import TrainConfig

    train_cfg = _dataclass_from_dict(TrainConfig, raw.get("train", {}))
    return {"model": model_cfg, "train": train_cfg, "data": data_d}
