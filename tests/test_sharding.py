"""Sharded training across the virtual mesh for each backbone family."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lina_speech_tpu.config import build_model, lina_gla_tiny
from lina_speech_tpu.parallel import (
    MeshConfig,
    make_mesh,
    shard_batch,
    shard_params,
)
from lina_speech_tpu.train import TrainConfig, create_train_state, make_train_step


@pytest.mark.parametrize("kind", ["gla", "rwkv6", "mamba", "gla-pallas"])
def test_sharded_train_step(kind):
    """gla-pallas exercises the Pallas kernel's custom-partitioning rule in
    the full dp x tp train step (interpret mode on the CPU mesh)."""
    kernel_mode = "chunk_pallas" if kind == "gla-pallas" else "auto"
    kind = "gla" if kind == "gla-pallas" else kind
    mesh = make_mesh(MeshConfig(dp=4, tp=2))
    cfg = lina_gla_tiny()
    cfg = dataclasses.replace(
        cfg, n_codebook=61,  # head vocab 64 divisible by tp
        backbone=dataclasses.replace(cfg.backbone, kind=kind, blind=True,
                                     kernel_mode=kernel_mode),
    )
    model = build_model(cfg)
    b, m, n = 4, 8, 17
    x = jax.random.randint(jax.random.PRNGKey(0), (b, m), 3, 256)
    y = jax.random.randint(jax.random.PRNGKey(1), (b, n, 1), 3, 64)
    batch = {
        "text_token": x,
        "audio_token": y,
        "encoder_mask": jnp.ones((b, m, m), bool),
        "crossatt_mask": jnp.ones((b, n, m), bool),
        "y_mask": jnp.ones((b, n), bool),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(2), x, y,
                                 batch["encoder_mask"], batch["crossatt_mask"],
                                 batch["y_mask"])
    params = shard_params(params, mesh)
    state = create_train_state(model, params, TrainConfig(n_warmup_steps=2,
                                                          n_training_steps=10))
    step = make_train_step(model, donate=False)
    state2, metrics = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
