"""End-to-end initial-state tuning on hardware (VERDICT r2 item #8).

Pipeline (one TPU process, flagship convergence config):
  1. train the base model on STRUCTURED synthetic data (speaker 0) until
     the text->code mapping is learned (or restore --ckpt-dir);
  2. evaluate held-out loss on a NEW speaker (constant mapping shift the
     base model has never seen) with zero S0 -> L_before;
  3. tune per-layer low-rank S0 on a few speaker batches
     (train/initial_state.py, reference initial_state.py:85-160);
  4. re-evaluate the same held-out batches with tuned S0 -> L_after;
  5. generate with and without the tuned S0 and report how often each
     matches the speaker's expected mapping.

Prints one JSON line for BASELINE.md. Usage (TPU):
  python scripts/tune_s0_tpu.py --train-steps 400 --tune-steps 200
CPU smoke:
  python scripts/tune_s0_tpu.py --platform cpu --tiny --train-steps 30 \
      --tune-steps 16 --eval-batches 2
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--train-steps", type=int, default=400)
    ap.add_argument("--tune-steps", type=int, default=200,
                    help="micro-steps of S0 tuning")
    ap.add_argument("--speaker", type=int, default=3)
    ap.add_argument("--eval-batches", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--rank", type=int, default=4)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--ckpt-dir", type=str, default=None,
                    help="restore the base model instead of training")
    ap.add_argument("--save-ckpt-dir", type=str, default=None,
                    help="checkpoint the trained base model (so reruns "
                         "can --ckpt-dir past the 400-step train)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp
    import numpy as np

    from lina_speech_tpu.config import (
        build_model, lina_gla_169m, lina_gla_tiny, load_config,
    )
    from lina_speech_tpu.data.synthetic import synthetic_tts_batches
    from lina_speech_tpu.train import TrainConfig, create_train_state, make_train_step
    from lina_speech_tpu.train.initial_state import (
        InitialStateTuningConfig, train_initial_state,
    )

    if args.tiny:
        cfg = lina_gla_tiny()
    else:
        cfg = load_config(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "configs", "lina_gla_169m_convergence.yaml"))["model"]
    model = build_model(cfg)

    mk_batches = lambda speaker, seed: synthetic_tts_batches(
        batch_size=args.batch_size, n_quant=cfg.n_quant,
        n_codebook=cfg.n_codebook, seed=seed, structured=True,
        speaker=speaker,
        min_audio_len=64 if not args.tiny else 24,
        max_audio_len=128 if not args.tiny else 32,
    )

    # ---- 1. base model on speaker 0 ----
    b0 = next(mk_batches(0, 0))
    params = model.init(
        jax.random.PRNGKey(1),
        jnp.asarray(b0["text_token"]), jnp.asarray(b0["audio_token"]),
        jnp.asarray(b0["encoder_mask"]), jnp.asarray(b0["crossatt_mask"]),
        jnp.asarray(b0["y_mask"]),
    )
    if args.ckpt_dir:
        from lina_speech_tpu.utils.checkpoint import restore_checkpoint

        params = restore_checkpoint(os.path.abspath(args.ckpt_dir), params)
        print(f"restored {args.ckpt_dir}", flush=True)
    else:
        state = create_train_state(model, params, TrainConfig())
        train_step = make_train_step(model)
        rng = jax.random.PRNGKey(2)
        t0 = time.time()
        metrics = {"loss": float("nan")}  # in case --train-steps 0
        for i, batch in enumerate(mk_batches(0, 0)):
            if i >= args.train_steps:
                break
            batch = {k: jnp.asarray(v) for k, v in batch.items()
                     if k != "text"}
            state, metrics = train_step(state, batch, rng)
            if i % 50 == 0 or i == args.train_steps - 1:
                print(f"base step {i}: loss {float(metrics['loss']):.3f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
        params = state.params
        if args.save_ckpt_dir:
            from lina_speech_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(os.path.abspath(args.save_ckpt_dir), params,
                            step=args.train_steps)
            print(f"saved base ckpt -> {args.save_ckpt_dir}", flush=True)
    base_loss = float(metrics["loss"]) if not args.ckpt_dir else float("nan")

    # ---- 2. held-out eval on the new speaker, zero S0 ----
    # jitted: eager flagship forwards over the axon tunnel take minutes;
    # synthetic batches pad to multiples of 64 so there are <=2 shape buckets
    @jax.jit
    def _eval_step(p, xt, ya, em, cm, ym, init_state):
        _, loss, _ = model.apply(p, xt, ya, em, cm, logits_mask=ym,
                                 init_state=init_state)
        return loss

    def eval_loss(init_state):
        ls = []
        for batch in itertools.islice(mk_batches(args.speaker, 999),
                                      args.eval_batches):
            loss = _eval_step(
                params,
                jnp.asarray(batch["text_token"]),
                jnp.asarray(batch["audio_token"]),
                jnp.asarray(batch["encoder_mask"]),
                jnp.asarray(batch["crossatt_mask"]),
                jnp.asarray(batch["y_mask"]),
                init_state,
            )
            ls.append(float(loss))
        return float(np.mean(ls))

    t0 = time.time()
    loss_before = eval_loss(None)
    print(f"speaker-{args.speaker} held-out loss, zero S0: "
          f"{loss_before:.3f} ({time.time()-t0:.0f}s)", flush=True)

    # ---- 3. tune S0 on the new speaker ----
    tcfg = InitialStateTuningConfig(lr=args.lr, rank=args.rank,
                                    batch_size=args.batch_size)
    tune_batches = ({k: jnp.asarray(v) for k, v in b.items() if k != "text"}
                    for b in itertools.islice(mk_batches(args.speaker, 7),
                                              args.tune_steps))
    t0 = time.time()
    tuned, losses = train_initial_state(model, params, tune_batches, tcfg)
    dt_tune = time.time() - t0
    print(f"tuned S0: first-loss {losses[0]:.3f} last-loss {losses[-1]:.3f} "
          f"({dt_tune:.0f}s, {dt_tune/max(len(losses),1)*1e3:.0f} ms/micro-step)",
          flush=True)

    # ---- 4. held-out eval with tuned S0 ----
    mk_state = lambda b: model.attentive_rnn.state_from_params(
        tuned, b, scale=tcfg.scale)
    loss_after = eval_loss(mk_state(args.batch_size))
    print(f"speaker-{args.speaker} held-out loss, tuned S0: "
          f"{loss_after:.3f}", flush=True)

    # ---- 5. generation shift toward the speaker mapping ----
    from lina_speech_tpu.generate import generate_batch

    eval_b = next(mk_batches(args.speaker, 1234))
    x = jnp.asarray(eval_b["text_token"])[:4]
    n_gen = 48 if not args.tiny else 16

    def mapping_match(tokens):
        # expected speaker mapping for each text row (pos cycle of 3)
        src_rows = np.asarray(eval_b["text_token"])[:4]
        match, total = 0, 0
        toks = np.asarray(tokens)  # (q, b, n)
        for r in range(toks.shape[1]):
            ids = src_rows[r][src_rows[r] > 2]  # drop pad/special
            if len(ids) == 0:
                continue
            pos = np.arange(toks.shape[2])
            src = ids[(pos // 3) % len(ids)]
            for q in range(toks.shape[0]):
                exp = (src * 131 + pos % 3 * 47 + q * 29
                       + args.speaker * 977) % cfg.n_codebook
                got = toks[q, r] - 3  # undo special-token offset
                match += int((got == exp).sum())
                total += len(pos)
        return match / max(total, 1)

    g0 = generate_batch(model, params, x, jax.random.PRNGKey(5), k=1,
                        max_seqlen=n_gen, force_max_seqlen=True)
    g1 = generate_batch(model, params, x, jax.random.PRNGKey(5), k=1,
                        max_seqlen=n_gen, force_max_seqlen=True,
                        init_state=mk_state(4))
    acc0, acc1 = mapping_match(g0.tokens), mapping_match(g1.tokens)
    print(f"generation speaker-mapping accuracy: zero-S0 {acc0:.3f} "
          f"tuned-S0 {acc1:.3f}", flush=True)

    print(json.dumps({
        "config": "tiny" if args.tiny else "lina_gla_169m_convergence",
        "base_train_loss": base_loss,
        "speaker": args.speaker,
        "heldout_loss_zero_s0": loss_before,
        "heldout_loss_tuned_s0": loss_after,
        "tune_micro_steps": len(losses),
        "tune_ms_per_micro_step": dt_tune / max(len(losses), 1) * 1e3,
        "gen_mapping_acc_zero_s0": acc0,
        "gen_mapping_acc_tuned_s0": acc1,
    }))


if __name__ == "__main__":
    main()
