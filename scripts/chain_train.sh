#!/usr/bin/env bash
# Chained-resume TPU training to the reference's published 75k-step budget
# (vq-video-diffusion/results/README.md:13-24, model #3: dim 384, depth 20,
# extents (3,1,1), batch 64, ema 0.999, 75k steps).
#
# The TPU relay kills processes at ~45 min wall, so the run is driven as
# bounded segments: each segment resumes from the newest checkpoint in
# $OUT and runs until `timeout` fires; the loop exits once the checkpoint
# step reaches $TARGET. Safe to re-run — it picks up where it left off.
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:-outputs/r2_m3}
TOK=${TOK:-outputs/r2_tok}
TARGET=${TARGET:-75000}
SEG=${SEG:-2340}            # seconds per segment, under the ~45-min kill
LOG=${LOG:-outputs/chain_train.log}

mkdir -p "$(dirname "$LOG")"

latest() {
  python - "$1" <<'EOF'
import sys
from world_modelz_tpu.train.checkpoint import latest_checkpoint
print(latest_checkpoint(sys.argv[1]) or "")
EOF
}

ckpt_step() {  # step number embedded in a step_XXXXXXX path ("" -> 0)
  local p="$1"
  [ -n "$p" ] && basename "$p" | sed 's/step_0*//' || echo 0
}

# ---- stage 1: VQ-VAE tokenizer (512 codes, dim 64, f8) -------------------
if [ -z "$(latest "$TOK")" ]; then
  echo "[chain] training tokenizer" | tee -a "$LOG"
  timeout "$SEG" python scripts/train_vqae.py \
    --dataset moving_mnist --image_size 64 --in_channels 1 --max_steps 1200 \
    --batch_size 96 --num_embeddings 512 --embedding_dim 64 \
    --downscale_steps 3 --checkpoint_interval 600 \
    --output_dir "$TOK" --name tok >>"$LOG" 2>&1 || true
fi
TOK_CKPT=$(latest "$TOK")
if [ -z "$TOK_CKPT" ]; then
  echo "[chain] FATAL: no tokenizer checkpoint" | tee -a "$LOG"
  exit 1
fi
echo "[chain] tokenizer: $TOK_CKPT" | tee -a "$LOG"

# ---- stage 2: model #3 masked video diffusion, chained to $TARGET --------
for i in $(seq 1 60); do
  CKPT=$(latest "$OUT")
  STEP=$(ckpt_step "$CKPT")
  if [ "${STEP:-0}" -ge "$TARGET" ]; then
    echo "[chain] reached $STEP >= $TARGET; done" | tee -a "$LOG"
    break
  fi
  echo "[chain] segment $i from step ${STEP:-0} ($(date -u +%H:%M:%S))" \
    | tee -a "$LOG"
  timeout "$SEG" python scripts/main.py \
    --decoder_model "$TOK_CKPT" \
    --dataset moving_mnist --image_size 64 --n_past 5 \
    --ema_decay 0.999 --dim 384 --mlp_dim 512 --heads 1 --depth 20 \
    --dim_head 128 --extents 3,1,1 --batch_size 64 --bf16 true \
    --lr 1e-4 --warmup 500 --max_steps "$TARGET" \
    --checkpoint_interval 2500 --eval_interval 5000 \
    --eval_timesteps 8 --topk 100 \
    --output_dir "$OUT" --name m3 \
    ${CKPT:+--checkpoint "$CKPT"} >>"$LOG" 2>&1 || true
done
echo "[chain] loop finished at $(latest "$OUT")" | tee -a "$LOG"
