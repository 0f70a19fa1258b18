#!/usr/bin/env bash
# Round-3 artifact runbook (run with the TPU otherwise idle):
#   1. end-to-end trainer timing window at the production batch-64 config
#      -> artifacts/train_e2e_timing.json -> ledger row train_e2e/m3/trainer
#   2. sampler hyperparameter sweep at the 75k checkpoint (VERDICT r2 #2c)
#   3. full perf-ledger refresh + regenerated docs tables
#   4. headline bench sanity (the BENCH_r03 artifact the driver records)
set -u
cd "$(dirname "$0")/.."

TOK=${TOK:-outputs/r2_tok/step_0001200}
CKPT=${CKPT:-outputs/r2_m3/step_0075000}
LOG=${LOG:-outputs/collect_round3.log}

echo "== [1/4] e2e trainer timing window ==" | tee -a "$LOG"
timeout 2400 python scripts/main.py \
  --decoder_model "$TOK" \
  --dataset moving_mnist --image_size 64 --n_past 5 \
  --ema_decay 0.999 --dim 384 --mlp_dim 512 --heads 1 --depth 20 \
  --dim_head 128 --extents 3,1,1 --batch_size 64 --bf16 true \
  --lr 1e-4 --warmup 100 --max_steps 600 --log_interval 10 \
  --checkpoint_interval 300 --eval_interval 0 \
  --timing_report artifacts/train_e2e_timing.json \
  --output_dir outputs/r3_e2e --name m3e2e >>"$LOG" 2>&1 \
  && timeout 1200 python benchmarks/perf_ledger.py train_e2e >>"$LOG" 2>&1 \
  || echo "e2e timing failed" | tee -a "$LOG"

echo "== [2/4] sampler sweep @75k ==" | tee -a "$LOG"
timeout 5400 python benchmarks/sampler_sweep.py \
  --checkpoint "$CKPT" --fvd_clips 64 --batch_size 16 >>"$LOG" 2>&1 \
  || echo "sampler sweep failed" | tee -a "$LOG"

echo "== [3/4] docs tables from ledger ==" | tee -a "$LOG"
python benchmarks/ledger_report.py --update README.md docs/ROADMAP.md \
  | tee -a "$LOG"

echo "== [4/4] bench sanity ==" | tee -a "$LOG"
timeout 1800 python bench.py | tee -a "$LOG"
echo "[collect_round3] done" | tee -a "$LOG"
