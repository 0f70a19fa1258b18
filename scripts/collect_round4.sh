#!/usr/bin/env bash
# Round-4 TPU evidence collection:
#  1. fresh 8x8 tokenizer + model-#3 trainer run with --device_composite
#     and the NEW probe-reconciled timing report (the wall-vs-compiled
#     closure VERDICT r3 #1 asks for)
#  2. two-framework FVD: the trained weights pushed into the actual
#     PyTorch reference and sampled by ITS evaluate_model (north-star #2)
#  3. masked-denoise prototype trained on the TPU (r3 #4b)
#
# The SOM pipeline has its own script (collect_round4_som.sh). Each stage
# is bounded under the relay's ~45-min process kill and skipped when its
# artifact already exists; safe to re-run until everything is green.
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:-outputs/r4}
ART=${ART:-artifacts/round4}
M3_STEPS=${M3_STEPS:-30000}
mkdir -p "$ART"

latest() {
  python - "$1" <<'EOF'
import sys
from world_modelz_tpu.train.checkpoint import latest_checkpoint
print(latest_checkpoint(sys.argv[1]) or "")
EOF
}
ckpt_step() {
  local p="$1"
  [ -n "$p" ] && basename "$p" | sed 's/step_0*//' || echo 0
}

# ---- 1a. tokenizer (downscale 3 -> 8x8 grid, the as-trained config) ------
if [ -z "$(latest "$OUT/tok")" ]; then
  timeout 2400 python scripts/train_vqae.py \
    --dataset moving_mnist --image_size 64 --in_channels 1 \
    --max_steps 1200 --batch_size 96 --num_embeddings 512 \
    --embedding_dim 64 --downscale_steps 3 --checkpoint_interval 600 \
    --output_dir "$OUT/tok" --name tok || true
fi
TOK=$(latest "$OUT/tok"); [ -n "$TOK" ] || exit 1
echo "[r4] tokenizer: $TOK"

# ---- 1b. m3 trainer, composite + probes, chained to $M3_STEPS ------------
for i in $(seq 1 30); do
  CKPT=$(latest "$OUT/m3")
  STEP=$(ckpt_step "$CKPT")
  [ "${STEP:-0}" -ge "$M3_STEPS" ] && break
  echo "[r4] m3 segment $i from step ${STEP:-0}"
  timeout 2400 python scripts/main.py \
    --decoder_model "$TOK" \
    --dataset moving_mnist --image_size 64 --n_past 5 \
    --device_composite true \
    --ema_decay 0.999 --dim 384 --mlp_dim 512 --heads 1 --depth 20 \
    --dim_head 128 --extents 3,1,1 --batch_size 64 --bf16 true \
    --lr 1e-4 --warmup 500 --max_steps "$M3_STEPS" \
    --steps_per_dispatch 10 --probe_interval 500 \
    --checkpoint_interval 2500 --eval_interval 0 \
    --timing_report artifacts/train_e2e_timing.json \
    --output_dir "$OUT/m3" --name m3r4 \
    ${CKPT:+--checkpoint "$CKPT"} || true
done
M3=$(latest "$OUT/m3"); echo "[r4] m3: $M3"

# ---- 2. two-framework FVD (CPU: both frameworks on the host) -------------
if [ -n "$M3" ] && [ ! -f "$ART/two_framework_fvd.json" ]; then
  timeout 2400 python benchmarks/fvd_two_framework.py \
    --checkpoint "$M3" --use_ema --clips 64 --batch_size 8 \
    --num_frames 8 --out "$ART/two_framework_fvd.json" || true
fi

# ---- 3. masked-denoise prototype on the TPU -------------------------------
if [ -z "$(latest "$OUT/masked")" ]; then
  timeout 2400 python scripts/masked_denoise.py \
    --batch_size 32 --max_steps 4000 --eval_interval 2000 \
    --checkpoint_interval 2000 --log_interval 100 \
    --output_dir "$OUT/masked" --name masked || true
fi
cp -f "$OUT"/masked/masked_eval_*.png "$ART/" 2>/dev/null || true
cp -f "$OUT"/masked/masked_metrics.jsonl "$ART/masked_metrics.jsonl" \
  2>/dev/null || true

ls -la "$ART"
echo "[r4] done"
