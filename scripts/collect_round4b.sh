#!/usr/bin/env bash
# Round-4 TPU evidence, part B (run after collect_round4.sh + _som.sh):
#  1. serving matrix suite (occupancy ladder / sessions / overload /
#     swept-optimal preset) -> artifacts/serve_suite.json  (VERDICT r3 #6)
#  2. sparse-trainer e2e timing window with the probe-reconciled
#     --timing_report so train_e2e/sparse/trainer gets the same
#     wall-vs-device closure as the m3 row               (VERDICT r3 #1)
#  3. two-extractor checkpoint trend (collect_round4_trend.sh)  (#7)
#
# Each stage is bounded under the relay's ~45-min process kill and
# skipped when its artifact already exists; safe to re-run.
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:-outputs/r4_sparse}
TOK=${TOK:-outputs/r4_sparse_tok}
SPARSE_STEPS=${SPARSE_STEPS:-3000}

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

# ---- 1. serving matrix ----------------------------------------------------
if [ ! -f artifacts/serve_suite.json ]; then
  timeout 2400 python benchmarks/serve_bench.py --suite || true
fi

# ---- 2a. 3-channel synthetic tokenizer (16x16 grid: downscale 2) ----------
if [ -z "$(latest "$TOK")" ]; then
  timeout 2400 python scripts/train_vqae.py \
    --dataset synthetic --image_size 64 --max_steps 1200 \
    --batch_size 96 --num_embeddings 512 --embedding_dim 64 \
    --downscale_steps 2 --checkpoint_interval 600 \
    --output_dir "$TOK" --name tok || true
fi
TOK_CKPT=$(latest "$TOK"); [ -n "$TOK_CKPT" ] || exit 1
echo "[r4b] tokenizer: $TOK_CKPT"

# ---- 2b. sparse trainer timing window (production long-ctx config) --------
for i in 1 2 3; do
  CKPT=$(latest "$OUT")
  STEP=$(ckpt_step "$CKPT")
  [ "${STEP:-0}" -ge "$SPARSE_STEPS" ] && break
  echo "[r4b] sparse segment $i from step ${STEP:-0}"
  timeout 2400 python scripts/sparse_diffusion.py \
    --decoder_model "$TOK_CKPT" \
    --dataset synthetic --image_size 64 --S 16 --H 16 --W 16 \
    --num_context 1024 --attn_backend flash \
    --dim 512 --depth 8 --heads 8 --mlp_dim 1024 \
    --batch_size 16 --bf16 true --ema_decay 0.999 \
    --lr 1e-4 --warmup 500 --max_steps "$SPARSE_STEPS" \
    --checkpoint_interval 1500 --eval_interval 0 \
    --timing_report artifacts/train_e2e_sparse_timing.json \
    --probe_interval 500 \
    --output_dir "$OUT" --name sp \
    ${CKPT:+--checkpoint "$CKPT"} || true
done
echo "[r4b] sparse done at $(latest "$OUT")"

# ---- 3. two-extractor checkpoint trend ------------------------------------
bash scripts/collect_round4_trend.sh

echo "[r4b] done"
