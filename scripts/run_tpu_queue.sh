#!/bin/bash
# HISTORICAL (round-3): everything this queue measures has since been run
# on hardware and recorded in BASELINE.md / BENCH_r04+ (b1-int8 1313,
# train 46.1k, S0 e2e clean, quality bounds). Kept as the methodology
# record for re-running A/Bs after a tunnel outage.
# Round-3 TPU-gated queue (see VERDICT.md r2 items #2, #3, #8).
# Runs everything SERIALLY — never run two TPU processes at once: the axon
# tunnel serializes them and both stall (CLAUDE.md).
#
# Logs land in /tmp/tpuq/. Each phase records its exit code; a phase
# failure does not abort the queue (later phases are independent).
set -u
cd /root/repo
mkdir -p /tmp/tpuq
Q=/tmp/tpuq

phase() {
  local name="$1"; shift
  echo "=== $name start $(date -u) ===" >> "$Q/queue.log"
  "$@" > "$Q/$name.log" 2>&1
  local rc=$?
  echo "=== $name done rc=$rc $(date -u) ===" >> "$Q/queue.log"
  echo "$rc" > "$Q/$name.rc"
}

# 1. b1 (+int8) decode bench — VERDICT #2 target >=1000 tok/s b1-int8.
#    First run since the fused int8 SwiGLU FFN, quantized logits head and
#    the mixed-quant merged-projection fix: expect a fresh (slow) compile.
#    batch=2 keeps the main phase cheap while enabling the b1/b1-int8
#    extras (bench.py gates them on batch > 1).
phase b1_bench env BENCH_STEPS=256 BENCH_BATCH=2 BENCH_LAZY=0 \
  BENCH_STATE_QUANT=0 BENCH_TRAIN=0 BENCH_CODEC=0 python bench.py

# 1b. b1-int8 decode trace + summary (round-4 VERDICT #2: find where the
#     int8 stream's 353-of-647 GB/s gap lives before attacking it).
phase b1_profile python scripts/profile_decode.py --batch 1 --steps 128 \
  --lazy-window 0 --weight-quant int8 --out /tmp/jaxprof_b1int8
phase b1_profile_sum python scripts/summarize_trace.py /tmp/jaxprof_b1int8 \
  --top 40

# 2. Train-throughput probe with hoist_param_cast on vs off — VERDICT #3.
phase train_hoist env BENCH_DECODE=0 BENCH_B1=0 BENCH_STATE_QUANT=0 \
  BENCH_CODEC=0 BENCH_HOIST=1 BENCH_TRAIN_STEPS=16 python bench.py
phase train_nohoist env BENCH_DECODE=0 BENCH_B1=0 BENCH_STATE_QUANT=0 \
  BENCH_CODEC=0 BENCH_HOIST=0 BENCH_TRAIN_STEPS=16 python bench.py

# 2b. Folded-layout projections A/B (round-4 VERDICT #3: fold head-split
#     transposes into the projection GEMMs; parity-tested, opt-in).
phase train_fold env GLA_FOLD_LAYOUT=1 BENCH_DECODE=0 BENCH_B1=0 \
  BENCH_STATE_QUANT=0 BENCH_CODEC=0 BENCH_HOIST=1 BENCH_TRAIN_STEPS=16 \
  python bench.py

# 2c. Train-step traces with/without the folded layout (VERDICT #3 "done"
#     criterion: layout copies < 4 ms in the profile).
phase train_profile_fold env GLA_FOLD_LAYOUT=1 \
  python scripts/profile_train.py --out /tmp/jaxprof_train_fold
phase train_profile_fold_sum python scripts/summarize_trace.py \
  /tmp/jaxprof_train_fold --top 40
phase train_profile_base python scripts/profile_train.py \
  --out /tmp/jaxprof_train_base
phase train_profile_base_sum python scripts/summarize_trace.py \
  /tmp/jaxprof_train_base --top 40

# 3. S0-tuning end-to-end clean run (VERDICT #8) — long (~30-40 min).
#    The 18:06 partial run already produced the headline numbers
#    (BASELINE.md); this validates the full pipeline incl. generate_batch.
phase s0_e2e python scripts/tune_s0_tpu.py --save-ckpt-dir /tmp/s0_base_ckpt

# 4. Lossy-knob quality bounds at flagship scale (round-4 VERDICT #5):
#    greedy b64 token agreement + teacher-forced logit deltas for
#    state_quant="int8", candidate recall + TV distance for approx_topk.
#    Record the JSON line in BASELINE.md next to the 217.8x claim.
phase quality_lossy python scripts/quality_lossy_decode.py \
  --batch 64 --steps 256

# 5. Full default bench sanity (what the driver will run at round end).
phase full_bench env BENCH_STEPS=256 python bench.py

echo "QUEUE COMPLETE $(date -u)" >> "$Q/queue.log"
