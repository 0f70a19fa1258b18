#!/usr/bin/env bash
# Chained-resume TPU training of model #3 at the 16x16 token grid
# (tokenizer downscale_steps 2 instead of the reference train_vqae.py:83
# default of 3). Same published model-#3 recipe otherwise
# (vq-video-diffusion/results/README.md:13-24: dim 384, depth 20,
# extents (3,1,1), batch 64, ema 0.999, 75k steps).
#
# Why: the round-2 8x8-grid run saturated its tokenizer's ~20dB
# reconstruction ceiling early, which made the 20k/50k/75k FVD/PSNR trend
# flat (round-2 verdict, Missing #2). 4x more tokens per frame raises the
# ceiling so quality metrics have headroom to move across checkpoints.
#
# The TPU relay kills processes at ~45 min wall, so the run is driven as
# bounded segments; each resumes from the newest checkpoint. Safe to
# re-run; exits once the checkpoint step reaches $TARGET.
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:-outputs/r3_m3f16}
TOK=${TOK:-outputs/r3_tok16}
TARGET=${TARGET:-75000}
SEG=${SEG:-2340}            # seconds per segment, under the ~45-min kill
LOG=${LOG:-outputs/chain_train_f16.log}

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

# ---- stage 1: VQ-VAE tokenizer (512 codes, dim 64, f4 -> 16x16) ----------
if [ -z "$(latest "$TOK")" ]; then
  echo "[chain-f16] training tokenizer" | tee -a "$LOG"
  timeout "$SEG" python scripts/train_vqae.py \
    --dataset moving_mnist --image_size 64 --in_channels 1 --max_steps 1200 \
    --batch_size 96 --num_embeddings 512 --embedding_dim 64 \
    --downscale_steps 2 --checkpoint_interval 600 \
    --output_dir "$TOK" --name tok16 >>"$LOG" 2>&1 || true
fi
TOK_CKPT=$(latest "$TOK")
if [ -z "$TOK_CKPT" ]; then
  echo "[chain-f16] FATAL: no tokenizer checkpoint" | tee -a "$LOG"
  exit 1
fi
echo "[chain-f16] tokenizer: $TOK_CKPT" | tee -a "$LOG"

# ---- stage 2: model #3 @16x16 masked video diffusion, chained ------------
for i in $(seq 1 60); do
  CKPT=$(latest "$OUT")
  STEP=$(ckpt_step "$CKPT")
  if [ "${STEP:-0}" -ge "$TARGET" ]; then
    echo "[chain-f16] reached $STEP >= $TARGET; done" | tee -a "$LOG"
    break
  fi
  echo "[chain-f16] segment $i from step ${STEP:-0} ($(date -u +%H:%M:%S))" \
    | tee -a "$LOG"
  timeout "$SEG" python scripts/main.py \
    --decoder_model "$TOK_CKPT" \
    --dataset moving_mnist --image_size 64 --n_past 5 \
    --ema_decay 0.999 --dim 384 --mlp_dim 512 --heads 1 --depth 20 \
    --dim_head 128 --extents 3,1,1 --batch_size 64 --bf16 true \
    --lr 1e-4 --warmup 500 --max_steps "$TARGET" \
    --steps_per_dispatch 10 \
    --checkpoint_interval 1250 --eval_interval 0 \
    --output_dir "$OUT" --name m3f16 \
    ${CKPT:+--checkpoint "$CKPT"} >>"$LOG" 2>&1 || true
done
echo "[chain-f16] loop finished at $(latest "$OUT")" | tee -a "$LOG"
