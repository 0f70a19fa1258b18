#!/usr/bin/env bash
# Round-3 quality-trend evidence on the 16x16-grid model #3 run
# (chain_train_f16.sh). The round-2 8x8 run's FVD/PSNR trend was flat
# because its tokenizer saturated ~20dB early (VERDICT r2, Missing #2);
# the 16x16 grid raises that ceiling so checkpoint differences can show.
#
# Collects, per 20k/50k/75k checkpoint: top-100 EMA rollouts (GIF+PNG),
# next-frame PSNR/SSIM vs held-out futures (incl. the tokenizer-roundtrip
# ceiling), and 64-clip FVD with bootstrap 95% CIs — enough clips that a
# real difference between checkpoints exceeds the CI (VERDICT r2 #2b).
# Then the sampler hyperparameter sweep at 75k. Run with the TPU idle.
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:-outputs/r3_m3f16}
DEST=${DEST:-artifacts/round3_f16}
LOG=${LOG:-outputs/collect_round3_f16.log}
mkdir -p "$DEST"

for STEP in 20000 50000 75000; do
  CKPT=$(printf '%s/step_%07d' "$OUT" "$STEP")
  [ -d "$CKPT" ] || { echo "skip $CKPT (missing)" | tee -a "$LOG"; continue; }
  echo "== rollout @ $STEP ==" | tee -a "$LOG"
  timeout 2400 python scripts/rollout.py \
    --checkpoint "$CKPT" --use_ema true --topk 100 \
    --batch_size 8 --num_frames 8 --num_eval_iterations 30 \
    --gt_metrics true --fvd true --fvd_clips 64 --fvd_batch_size 8 \
    --output_dir "$DEST" --name "m3f16_$STEP" >>"$LOG" 2>&1 \
    || echo "rollout $STEP failed" | tee -a "$LOG"
done

cp -f "$OUT"/m3f16_metrics.jsonl "$DEST/m3f16_75k_metrics.jsonl" 2>/dev/null

echo "== sampler sweep @75k (16x16) ==" | tee -a "$LOG"
CKPT=$(printf '%s/step_%07d' "$OUT" 75000)
if [ -d "$CKPT" ]; then
  timeout 5400 python benchmarks/sampler_sweep.py \
    --checkpoint "$CKPT" --fvd_clips 64 --batch_size 8 \
    --out artifacts/sampler_sweep_f16.json >>"$LOG" 2>&1 \
    || echo "sampler sweep failed" | tee -a "$LOG"
fi

# single-source quality table (same policy as the perf-ledger tables)
python scripts/summarize_quality.py --dir "$DEST" --prefix m3f16 \
  --title "Model #3 @16x16 grid: quality across 20k/50k/75k checkpoints" \
  --out "$DEST/README.md" | tee -a "$LOG" || true
echo "[collect_round3_f16] done" | tee -a "$LOG"
