#!/usr/bin/env bash
# Round-2 artifact collection: rollouts + quantitative trend across the
# 20k/50k/75k model #3 checkpoints (VERDICT r1 item 10), plus the remaining
# TPU perf-ledger sections. Run on the TPU after chain_train.sh reaches 75k.
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:-outputs/r2_m3}
DEST=${DEST:-artifacts/round2}
mkdir -p "$DEST"

for STEP in 20000 50000 75000; do
  CKPT=$(printf '%s/step_%07d' "$OUT" "$STEP")
  [ -d "$CKPT" ] || { echo "skip $CKPT (missing)"; continue; }
  echo "== rollout @ $STEP =="
  timeout 2100 python scripts/rollout.py \
    --checkpoint "$CKPT" --use_ema true --topk 100 \
    --batch_size 8 --num_frames 8 --num_eval_iterations 30 \
    --gt_metrics true --fvd true --fvd_clips 16 --fvd_batch_size 8 \
    --output_dir "$DEST" --name "m3_$STEP" || echo "rollout $STEP failed"
done

cp -f "$OUT"/m3_metrics.jsonl "$DEST/m3_75k_metrics.jsonl" 2>/dev/null
for f in "$OUT"/m3_eval_*_ema.gif "$OUT"/m3_eval_*_ema.png; do
  [ -f "$f" ] && cp -f "$f" "$DEST/" || true
done

echo "== perf ledger (attn/train/denoise) =="
timeout 2100 python benchmarks/perf_ledger.py attn train denoise tokenize512 \
  || echo "ledger sections failed"

echo "== headline bench =="
timeout 1200 python bench.py || echo "bench failed"
echo "collect_round2 done"
