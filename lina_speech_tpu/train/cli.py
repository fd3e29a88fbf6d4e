"""Training CLI: ``python -m lina_speech_tpu.train.cli fit --config cfg.yaml``.

Replaces the reference's LightningCLI entry (train_lina.py:122-132) with a
dependency-light argparse + YAML config front-end over the jitted sharded
train step. Supports warm starts (reference ``load_weights``), periodic
orbax checkpoints, eval passes, profiling traces, and the synthetic
datamodule when no data source is configured.
"""
from __future__ import annotations

import argparse
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np


def build_data(data_cfg: Dict[str, Any], model_cfg,
               dp: int = 1) -> Iterator[Dict[str, np.ndarray]]:
    kind = data_cfg.get("kind", "synthetic")
    batch_size = int(data_cfg.get("batch_size", 8))
    # per-batch leading axis must divide over the dp mesh axis
    batch_size = -(-batch_size // dp) * dp
    if kind == "synthetic":
        from lina_speech_tpu.data.synthetic import synthetic_tts_batches

        return synthetic_tts_batches(
            batch_size=batch_size,
            n_quant=model_cfg.n_quant,
            n_codebook=model_cfg.n_codebook,
            min_audio_len=int(data_cfg.get("min_audio_len", 64)),
            max_audio_len=int(data_cfg.get("max_audio_len", 256)),
            seed=int(data_cfg.get("seed", 0)),
            structured=bool(data_cfg.get("structured", False)),
        )
    if kind == "npz":
        from lina_speech_tpu.data.dataset import (
            LengthBucketSampler, TokenizedTTSDataset, tts_data_loader,
        )
        from lina_speech_tpu.data.tokenizer import TextTokenizer

        ds = TokenizedTTSDataset(npz_paths=data_cfg["npz_paths"])
        sampler = LengthBucketSampler(
            ds.lengths(),
            max_tokens=int(data_cfg.get("max_tokens", 8192)),
            max_batch_size=batch_size,
            seed=int(data_cfg.get("seed", 0)),
        )
        tok = TextTokenizer(data_cfg.get("tokenizer_file"))
        return tts_data_loader(ds, tok, sampler,
                               n_special=model_cfg.n_special_token_in)
    raise ValueError(f"unknown data kind {kind!r}")


def fit(args) -> None:
    from lina_speech_tpu.config import ModelConfig, build_model, load_config
    from lina_speech_tpu.parallel import (
        MeshConfig, make_mesh, shard_batch, shard_params,
    )
    from lina_speech_tpu.train.harness import (
        TrainConfig, create_train_state, make_eval_step, make_train_step,
    )
    from lina_speech_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
    from lina_speech_tpu.utils.profiling import MetricsLogger, StepTimer

    if args.config:
        cfg = load_config(args.config)
        model_cfg, train_cfg, data_cfg = cfg["model"], cfg["train"], cfg["data"]
    else:
        model_cfg, train_cfg, data_cfg = ModelConfig(), TrainConfig(), {}
    if args.steps:
        import dataclasses

        train_cfg = dataclasses.replace(train_cfg, n_training_steps=args.steps)
    if getattr(args, "cp", 1) > 1:
        import dataclasses

        # every backbone family has a CP path (ops/gla_cp.py /
        # ops/mamba_cp.py); the transformer baseline does not
        if model_cfg.backbone.kind == "transformer":
            raise SystemExit("--cp is not supported for the transformer "
                             "baseline (no sequence-sharded kernel)")
        model_cfg = dataclasses.replace(
            model_cfg,
            backbone=dataclasses.replace(model_cfg.backbone, cp_axis="cp"))

    model = build_model(model_cfg)
    from lina_speech_tpu.parallel.multihost import (
        distributed_init, globalize_batch, make_multihost_mesh,
        process_batch_slice,
    )

    multihost = distributed_init(args.coordinator)
    if multihost:
        # dp over DCN (outer), tp over ICI (inner); each process loads only
        # its rows of the global batch and feeds them as one global array.
        mesh = make_multihost_mesh(MeshConfig(dp=args.dp, tp=args.tp))
        feed = lambda b: globalize_batch(
            jax.tree_util.tree_map(
                lambda x: x[process_batch_slice(x.shape[0])], b), mesh)
    else:
        mesh = make_mesh(MeshConfig(dp=args.dp, tp=args.tp,
                                    cp=getattr(args, "cp", 1)))
        feed = lambda b: shard_batch(b, mesh)
    if "cp" in mesh.axis_names:
        # the CP op's shard_map picks the mesh up from ambient context
        jax.set_mesh(mesh)
    data = build_data(data_cfg, model_cfg, dp=mesh.shape["dp"])
    if "cp" in mesh.axis_names:
        # audio time must divide over cp; pad with masked positions
        # (y_mask False => excluded from the loss, same as batch padding)
        def _pad_cp(it, cp):
            time_keys = ("audio_token", "y_mask", "crossatt_mask",
                         "reset_mask", "crossatt_pos")

            def pad(b):
                n = b["audio_token"].shape[1]
                extra = (-n) % cp
                if not extra:
                    return b
                out = dict(b)
                for k in time_keys:
                    if b.get(k) is not None:
                        w = [(0, 0)] * b[k].ndim
                        w[1] = (0, extra)
                        out[k] = np.pad(b[k], w)
                return out

            return (pad(b) for b in it)

        data = _pad_cp(data, mesh.shape["cp"])
    batch0 = next(data)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed),
        batch0["text_token"], batch0["audio_token"], batch0["encoder_mask"],
        batch0["crossatt_mask"], batch0["y_mask"],
    )
    if args.load_weights:
        params = restore_checkpoint(args.load_weights, params)
    start_step = 0
    resume_tree = None
    if args.resume and args.ckpt_dir and os.path.isdir(args.ckpt_dir):
        steps = sorted(
            int(d.split("_")[1]) for d in os.listdir(args.ckpt_dir)
            if d.startswith("step_")
        )
        if steps:
            start_step = steps[-1]
            resume_tree = os.path.abspath(f"{args.ckpt_dir}/step_{start_step}")
            print(f"resuming from step {start_step}")
    params = shard_params(params, mesh)
    state = create_train_state(model, params, train_cfg)
    if resume_tree is not None:
        # restore the FULL train state (params + optimizer moments + step),
        # re-placing every leaf on its mesh sharding
        target = {"params": state.params, "opt_state": state.opt_state,
                  "step": state.step}
        full = restore_checkpoint(resume_tree, target)
        from jax.sharding import NamedSharding, PartitionSpec

        replicated = NamedSharding(mesh, PartitionSpec())

        def _replace(restored, ref):
            sh = getattr(ref, "sharding", None)
            if isinstance(sh, NamedSharding):
                return jax.device_put(restored, sh)
            return jax.device_put(restored, replicated)

        full = jax.tree_util.tree_map(_replace, full, target)
        state = state.replace(params=full["params"], opt_state=full["opt_state"],
                              step=full["step"])
    if args.ckpt_dir:
        os.makedirs(args.ckpt_dir, exist_ok=True)
        if args.config:
            import shutil

            shutil.copy(args.config, os.path.join(args.ckpt_dir, "config.yaml"))
    train_step = make_train_step(model, grad_accum_steps=train_cfg.grad_accum_steps)
    eval_step = make_eval_step(model)

    logger = MetricsLogger(args.log_file, print_every=args.log_every)
    # records are per-log-interval averages; interval 0 holds the compile
    timer = StepTimer(warmup=1)
    rng = jax.random.PRNGKey(args.seed + 1)

    import time as _time

    t_mark = _time.perf_counter()
    n_done = 0
    for step_idx in range(start_step, train_cfg.n_training_steps):
        batch = feed(next(data) if step_idx else batch0)
        state, metrics = train_step(state, batch, rng)
        n_done += 1
        if step_idx % args.log_every == 0:
            # fetching the metric scalars syncs the device queue — do it
            # ONLY on log steps (a per-step fetch costs a full host<->device
            # round trip and serializes dispatch against compute; measured
            # ~2x step time over the remote-TPU tunnel)
            metrics = {k: float(v) for k, v in metrics.items()}
            now = _time.perf_counter()
            metrics["step_time_s"] = (now - t_mark) / n_done
            timer.record((now - t_mark) / n_done)
            t_mark, n_done = now, 0
            logger.log(step_idx, metrics)
        if args.ckpt_dir and step_idx > 0 and step_idx % args.ckpt_every == 0:
            save_checkpoint(os.path.abspath(args.ckpt_dir),
                            {"params": state.params,
                             "opt_state": state.opt_state,
                             "step": state.step}, step=step_idx)
        if args.eval_every and step_idx > 0 and step_idx % args.eval_every == 0:
            em = eval_step(state, feed(next(data)))
            logger.log(step_idx, {f"val_{k}": float(v) for k, v in em.items()})

    if n_done:  # sync + account the tail interval
        for v in metrics.values():
            float(v)
        timer.record((_time.perf_counter() - t_mark) / n_done)

    if args.ckpt_dir:
        save_checkpoint(os.path.abspath(args.ckpt_dir),
                        {"params": state.params, "opt_state": state.opt_state,
                         "step": state.step},
                        step=train_cfg.n_training_steps)
    logger.close()
    print(f"done: {train_cfg.n_training_steps} steps, "
          f"mean step {timer.mean*1e3:.1f} ms")


def main(argv=None):
    p = argparse.ArgumentParser(prog="lina_speech_tpu.train")
    sub = p.add_subparsers(dest="cmd", required=True)
    f = sub.add_parser("fit")
    f.add_argument("--config", type=str, default=None)
    f.add_argument("--steps", type=int, default=None)
    f.add_argument("--dp", type=int, default=-1)
    f.add_argument("--tp", type=int, default=1)
    f.add_argument("--cp", type=int, default=1,
                   help="context parallel: shard audio time over this many "
                        "devices (GLA backbone; audio len must divide by it)")
    f.add_argument("--seed", type=int, default=0)
    f.add_argument("--load-weights", type=str, default=None)
    f.add_argument("--resume", action="store_true",
                   help="resume from the latest step_* in --ckpt-dir")
    f.add_argument("--ckpt-dir", type=str, default=None)
    f.add_argument("--ckpt-every", type=int, default=1000)
    f.add_argument("--eval-every", type=int, default=0)
    f.add_argument("--log-every", type=int, default=10)
    f.add_argument("--log-file", type=str, default=None)
    f.add_argument("--coordinator", type=str, default=None,
                   help="multi-host coordinator address (host:port); "
                        "omit for auto-detection / single-process")
    f.add_argument("--platform", type=str, default=None,
                   help="force a jax backend (e.g. 'cpu' for a virtual mesh "
                        "with XLA_FLAGS=--xla_force_host_platform_device_count"
                        "=N); more reliable than JAX_PLATFORMS, which site "
                        "hooks can override")
    args = p.parse_args(argv)
    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
        n_dev = max(args.dp, 1) * args.tp * getattr(args, "cp", 1)
        if args.platform == "cpu" and n_dev > 1:
            from lina_speech_tpu.parallel import ensure_virtual_cpu_devices

            ensure_virtual_cpu_devices(n_dev)
    # persistent compile cache (host-scoped on CPU — see
    # utils/compile_cache.py); must follow the platform decision above
    from lina_speech_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    if args.cmd == "fit":
        fit(args)


if __name__ == "__main__":
    main()
