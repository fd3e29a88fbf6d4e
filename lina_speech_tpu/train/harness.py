"""Training harness: optimizer, schedule, sharded train/eval steps.

Replaces the reference's Lightning harness (train_lina.py): AdamW
(lr 5e-4, wd 0.1, betas (0.9, 0.999)) + HF-style cosine schedule with warmup
stepped per optimizer step (train_lina.py:105-120), masked CE loss, top-10
accuracy per quantizer ignoring pad/head tokens (train_lina.py:57-61).

TPU-native: the step is one jitted function over a ("dp", "tp") mesh; DDP's
NCCL all-reduce becomes XLA's automatic gradient psum from sharding
propagation; ``sync_dist`` metric averaging is likewise free (metrics are
computed on globally-sharded arrays).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from lina_speech_tpu.models.accuracy import topk_accuracy
from lina_speech_tpu.models.lina import LinaModel


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 5e-4
    weight_decay: float = 0.1
    betas: Tuple[float, float] = (0.9, 0.999)
    n_warmup_steps: int = 500
    n_training_steps: int = 300_000
    grad_clip: Optional[float] = None
    accuracy_top_k: int = 10
    # micro-batching: batch axis is split into this many sequential chunks
    # (activation memory / grad_accum_steps; Lightning's
    # accumulate_grad_batches equivalent)
    grad_accum_steps: int = 1


def cosine_schedule_with_warmup(
    peak_lr: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    """HF get_cosine_schedule_with_warmup semantics (train_lina.py:117-118)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        progress = (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * jnp.clip(progress, 0.0, 1.0)))
        return peak_lr * jnp.where(step < warmup_steps, warm, cos)

    return schedule


class TrainState(train_state.TrainState):
    pass


def create_train_state(model: LinaModel, params, config: TrainConfig) -> TrainState:
    sched = cosine_schedule_with_warmup(
        config.learning_rate, config.n_warmup_steps, config.n_training_steps
    )
    chain = []
    if config.grad_clip is not None:
        chain.append(optax.clip_by_global_norm(config.grad_clip))
    chain.append(
        optax.adamw(
            sched,
            b1=config.betas[0],
            b2=config.betas[1],
            weight_decay=config.weight_decay,
        )
    )
    tx = optax.chain(*chain)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def _loss_and_metrics(model: LinaModel, params, batch: Dict[str, Any],
                      rngs=None, deterministic: bool = True):
    logits, loss, _ = model.apply(
        params,
        batch["text_token"],
        batch["audio_token"],
        batch.get("encoder_mask"),
        batch.get("crossatt_mask"),
        logits_mask=batch.get("y_mask"),
        reset_mask=batch.get("reset_mask"),
        crossatt_pos=batch.get("crossatt_pos"),
        deterministic=deterministic,
        rngs=rngs,
    )
    target = batch["audio_token"][:, 1:]
    y_mask = batch.get("y_mask")
    mask = y_mask[:, 1:, None] if y_mask is not None else None
    metrics = {"loss": loss}
    n_quant = logits.shape[2]
    for i in range(n_quant):
        metrics[f"acc_{i}"] = topk_accuracy(
            logits[:, :, i], target[:, :, i],
            mask=mask[:, :, 0] if mask is not None else None,
        )
    return loss, metrics


def make_train_step(model: LinaModel, donate: bool = True,
                    grad_accum_steps: int = 1,
                    auto_layout: bool = False,
                    hoist_param_cast: bool = False,
                    unroll_accum: bool = False) -> Callable:
    """Build the jitted train step. Shard state/batch before calling; XLA
    propagates shardings and inserts dp-psum for grads and tp collectives.

    With ``grad_accum_steps > 1`` the batch's leading axis is split into
    micro-batches processed by a ``lax.scan`` (activation memory divides by
    the accumulation factor).

    ``auto_layout=True`` lets XLA pick the ENTRY layouts of the train state
    (params/opt buffers): the r3 xplane profile showed ~5 ms/step of f32
    layout copies normalizing dW GEMM outputs ({0,1}) to the row-major
    param buffers ({1,0}); AUTO lets the buffers live in the layout the
    step prefers. Measured (v5e, flagship B8 T512): only +0.5% — the copy
    self-time was already DMA-overlapped — AND the compiled executable
    fails with a TPU ``InvalidArgument`` when reloaded from the persistent
    compilation cache (fresh compiles run fine; minimal AUTO-layout
    programs reload fine, the full train step does not). Kept as an
    opt-in experiment only; nothing in the repo enables it.

    ``hoist_param_cast=True`` (accum path only): casts the >=2D f32 params
    to bf16 ONCE before the micro-batch scan and differentiates w.r.t. the
    bf16 tree. XLA does not hoist the per-consumer f32->bf16 converts out
    of the while body (verified in compiled HLO), so each micro-step
    otherwise re-reads the f32 params (2x weight bytes) into its GEMMs.
    Numerics: micro-grads are bf16-rounded before the f32 accumulation
    (the fwd/bwd compute was already bf16 via promote_dtype).

    ``unroll_accum=True`` replaces the micro-batch ``lax.scan`` with a
    Python loop (same math, token-exact). Rationale: the scan carries the
    full f32 grad tree as while-loop state, and XLA normalizes every dW
    GEMM output (layout {0,1}) to the carry's row-major {1,0} layout ONCE
    PER MICRO-STEP — the r4 xplane profile shows ~12 ms/micro of such
    copies. Unrolled, the accumulator is an internal value with no fixed
    while-signature layout, so XLA keeps it in the GEMM-output layout and
    normalizes once per train step. Costs a ~grad_accum_steps× larger HLO
    (slower compile), no extra device memory (adds are sequential)."""

    def _split_cast(params):
        """(bf16 tree for compute, f32 leaves to keep) — cast only >=2D
        f32 leaves; norms/biases stay f32 exactly as promote_dtype leaves
        them when modules run in bf16."""
        def cast(p):
            if p.dtype == jnp.float32 and p.ndim >= 2:
                return p.astype(jnp.bfloat16)
            return p
        return jax.tree_util.tree_map(cast, params)

    def grads_of(params, batch, rngs):
        def loss_fn(params):
            return _loss_and_metrics(model, params, batch, rngs=rngs,
                                     deterministic=False)

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def train_step(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        rngs = {"dropout": step_rng, "text_mask": jax.random.fold_in(step_rng, 1)}

        if grad_accum_steps == 1:
            (_, metrics), grads = grads_of(state.params, batch, rngs)
        else:
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape(grad_accum_steps, x.shape[0] // grad_accum_steps,
                                    *x.shape[1:]),
                batch,
            )

            loop_params = (_split_cast(state.params) if hoist_param_cast
                           else state.params)

            def body(carry, mb):
                grads_acc, metrics_acc = carry
                (_, metrics), grads = grads_of(loop_params, mb, rngs)
                # jnp.add(f32, bf16) promotes: accumulation stays f32
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                metrics_acc = jax.tree_util.tree_map(jnp.add, metrics_acc, metrics)
                return (grads_acc, metrics_acc), None

            zero_g = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            mb0 = jax.tree_util.tree_map(lambda x: x[0], micro)
            (_, m0), _ = jax.eval_shape(lambda p: grads_of(p, mb0, rngs), loop_params)
            zero_m = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), m0)
            if unroll_accum:
                carry = (zero_g, zero_m)
                for i in range(grad_accum_steps):
                    mb = jax.tree_util.tree_map(lambda x: x[i], micro)
                    # tie this micro's inputs to the carry: without the
                    # barrier XLA is free to schedule all micro fwd/bwd
                    # passes before the accumulator adds (they don't
                    # consume the carry), keeping grad_accum_steps grad
                    # trees + activations live at once — measured HBM OOM
                    # at the flagship 4xB8 config. Barriered, liveness
                    # matches the scan (one micro + one f32 accumulator).
                    if i:
                        mb, carry = jax.lax.optimization_barrier((mb, carry))
                    carry, _ = body(carry, mb)
                grads, metrics = carry
            else:
                (grads, metrics), _ = jax.lax.scan(body, (zero_g, zero_m), micro)
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum_steps, grads)
            metrics = jax.tree_util.tree_map(lambda m: m / grad_accum_steps, metrics)

        new_state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if auto_layout:
        from jax.experimental.layout import Format, Layout

        fmt = Format(Layout.AUTO)
        return jax.jit(train_step,
                       donate_argnums=(0,) if donate else (),
                       in_shardings=(fmt, None, None),
                       out_shardings=(fmt, None))
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: LinaModel) -> Callable:
    def eval_step(state: TrainState, batch: Dict[str, Any]):
        _, metrics = _loss_and_metrics(model, state.params, batch, deterministic=True)
        return metrics

    return jax.jit(eval_step)
