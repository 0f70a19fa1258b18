#!/usr/bin/env bash
# Chained-resume TPU training of the sparse space-time diffusion model
# (minecraft/sparse_diffusion.py analog) on the synthetic trajectory
# corpus — the round-3 second trained model family. Long-context config
# (num_context 1024) runs the dense backbone on the flash-attention
# backend in production. Same segment-resume protocol as chain_train.sh
# (the relay kills processes at ~45 min).
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:-outputs/r3_sparse}
TOK=${TOK:-outputs/r3_tok3}
TARGET=${TARGET:-30000}
SEG=${SEG:-2340}
LOG=${LOG:-outputs/chain_train_sparse.log}

mkdir -p "$(dirname "$LOG")"

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

# ---- stage 1: 3-channel VQ-VAE tokenizer on synthetic trajectories -------
if [ -z "$(latest "$TOK")" ]; then
  echo "[chain-sparse] training tokenizer" | tee -a "$LOG"
  timeout "$SEG" python scripts/train_vqae.py \
    --dataset synthetic --image_size 64 --max_steps 1200 \
    --batch_size 96 --num_embeddings 512 --embedding_dim 64 \
    --downscale_steps 2 --checkpoint_interval 600 \
    --output_dir "$TOK" --name tok >>"$LOG" 2>&1 || true
fi
TOK_CKPT=$(latest "$TOK")
if [ -z "$TOK_CKPT" ]; then
  echo "[chain-sparse] FATAL: no tokenizer checkpoint" | tee -a "$LOG"
  exit 1
fi
echo "[chain-sparse] tokenizer: $TOK_CKPT" | tee -a "$LOG"

# ---- stage 2: sparse diffusion over the 16x16x16 token volume ------------
for i in $(seq 1 60); do
  CKPT=$(latest "$OUT")
  STEP=$(ckpt_step "$CKPT")
  if [ "${STEP:-0}" -ge "$TARGET" ]; then
    echo "[chain-sparse] reached $STEP >= $TARGET; done" | tee -a "$LOG"
    break
  fi
  echo "[chain-sparse] segment $i from step ${STEP:-0} ($(date -u +%H:%M:%S))" \
    | tee -a "$LOG"
  timeout "$SEG" python scripts/sparse_diffusion.py \
    --decoder_model "$TOK_CKPT" \
    --dataset synthetic --image_size 64 --S 16 --H 16 --W 16 \
    --num_context 1024 --attn_backend flash \
    --dim 512 --depth 8 --heads 8 --mlp_dim 1024 \
    --batch_size 16 --bf16 true --ema_decay 0.999 \
    --lr 1e-4 --warmup 500 --max_steps "$TARGET" \
    --checkpoint_interval 2500 --eval_interval 5000 \
    --output_dir "$OUT" --name sp \
    ${CKPT:+--checkpoint "$CKPT"} >>"$LOG" 2>&1 || true
done
echo "[chain-sparse] loop finished at $(latest "$OUT")" | tee -a "$LOG"
