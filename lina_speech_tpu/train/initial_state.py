"""Initial-state tuning: speaker adaptation by optimizing the recurrent S0.

Rebuild of reference initial_state.py:85-160. Instead of a prompt, the
speaker identity is distilled into per-layer LoRA-factorized initial states
(k: (1, r, h, d_k, 1), v: (1, r, h, 1, d_v)); only these are trained (Adam,
lr 0.1, gradient accumulation), with the loss backpropagating through the
chunked GLA kernel into S0 (our gla_chunk is differentiable w.r.t.
initial_state — the TPU equivalent of switching the model to
``fused_recurrent`` mode, initial_state.py:101).

TPU-native: the whole (forward + grad + Adam update) is ONE jitted step;
gradient accumulation is a lax-free running mean across micro-steps.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lina_speech_tpu.models.lina import LinaModel


@dataclasses.dataclass(frozen=True)
class InitialStateTuningConfig:
    lr: float = 0.1
    rank: int = 1
    scale: float = 0.02
    grad_acc: int = 4
    batch_size: int = 2
    n_samples: int = 256
    seed: int = 123


def make_tuning_step(model: LinaModel, config: InitialStateTuningConfig,
                     optimizer: optax.GradientTransformation) -> Callable:
    """One jitted micro-step: loss + grads w.r.t. the S0 params + optimizer
    update every ``grad_acc`` micro-steps (reference initial_state.py:139-150
    steps the optimizer on that cadence)."""

    def step(params, tune_params, opt_state, grad_accum, micro_idx, batch):
        def loss_fn(tp):
            init_state = model.attentive_rnn.state_from_params(
                tp, batch["text_token"].shape[0], scale=config.scale
            )
            _, loss, _ = model.apply(
                params,
                batch["text_token"],
                batch["audio_token"],
                batch.get("encoder_mask"),
                batch.get("crossatt_mask"),
                logits_mask=batch.get("y_mask"),
                init_state=init_state,
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(tune_params)
        grad_accum = jax.tree_util.tree_map(lambda a, g: a + g, grad_accum, grads)

        def apply_update(args):
            tp, gacc, opt_state = args
            mean_grads = jax.tree_util.tree_map(lambda g: g / config.grad_acc, gacc)
            updates, opt_state = optimizer.update(mean_grads, opt_state, tp)
            tp = optax.apply_updates(tp, updates)
            gacc = jax.tree_util.tree_map(jnp.zeros_like, gacc)
            return tp, gacc, opt_state

        do_update = (micro_idx % config.grad_acc) == (config.grad_acc - 1)
        tune_params, grad_accum, opt_state = jax.lax.cond(
            do_update, apply_update, lambda a: a, (tune_params, grad_accum, opt_state)
        )
        return tune_params, opt_state, grad_accum, loss

    return jax.jit(step, donate_argnums=(1, 2, 3))


def train_initial_state(
    model: LinaModel,
    params,
    batches: Iterable[Dict[str, Any]],
    config: InitialStateTuningConfig = InitialStateTuningConfig(),
    key: Optional[jax.Array] = None,
    save_every_k_steps: int = 0,
) -> Tuple[List, List[float]]:
    """Run the tuning loop over an iterable of collated batches.

    Returns (tuned S0 params [or list of snapshots], losses). Mirrors
    reference train_initial_state's outputs (initial_state.py:156-160).
    """
    key = key if key is not None else jax.random.PRNGKey(config.seed)
    tune_params = model.attentive_rnn.init_state_tuning_params(
        key, rank=config.rank, scale=config.scale
    )
    optimizer = optax.adam(config.lr)
    opt_state = optimizer.init(tune_params)
    grad_accum = jax.tree_util.tree_map(jnp.zeros_like, tune_params)
    step = make_tuning_step(model, config, optimizer)

    losses: List[float] = []
    snapshots: List = []
    k_steps = 0
    for i, batch in enumerate(batches):
        tune_params, opt_state, grad_accum, loss = step(
            params, tune_params, opt_state, grad_accum, jnp.asarray(i), batch
        )
        losses.append(float(loss))
        if (i + 1) % config.grad_acc == 0:
            k_steps += 1
            if save_every_k_steps > 0 and k_steps % save_every_k_steps == 0:
                snapshots.append(jax.tree_util.tree_map(np.asarray, tune_params))

    if save_every_k_steps > 0:
        snapshots.append(jax.tree_util.tree_map(np.asarray, tune_params))
        return snapshots, losses
    return tune_params, losses


def speaker_state_dict(tune_params: List) -> Dict[str, np.ndarray]:
    """Flatten S0 params for saving (reference initial_state.py:20-30)."""
    out = {}
    for i, layer in enumerate(tune_params):
        if isinstance(layer, tuple):
            out[f"layer{i}_k"] = np.asarray(layer[0])
            out[f"layer{i}_v"] = np.asarray(layer[1])
        else:
            out[f"layer{i}"] = np.asarray(layer)
    return out


def parse_speaker_state(state: Dict[str, np.ndarray]) -> List:
    """Inverse of :func:`speaker_state_dict` (initial_state.py:39-48)."""
    ks = sorted(
        (k for k in state if k.endswith("_k")),
        key=lambda s: int("".join(c for c in s if c.isdigit())),
    )
    if ks:
        return [(jnp.asarray(state[k]), jnp.asarray(state[k[:-2] + "_v"])) for k in ks]
    layers = sorted(state, key=lambda s: int("".join(c for c in s if c.isdigit())))
    return [jnp.asarray(state[k]) for k in layers]
