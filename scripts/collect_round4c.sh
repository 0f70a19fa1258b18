#!/usr/bin/env bash
# Round-4 TPU evidence, part C (run after collect_round4b.sh):
#  1. composite (16x16-grid, --device_composite) trainer e2e window with
#     the probe-reconciled --timing_report, so train_e2e/m3/composite gets
#     the same wall-vs-device closure as the m3 and sparse rows
#     (VERDICT r3 #1: "every train_e2e row's buckets + compiled step sum
#     to >=90% of wall").
#  2. ledger refresh: ingest all three timing reports + the serve suite,
#     then regenerate the README/ROADMAP tables from the ledger.
#
# Each stage is bounded under the relay's ~45-min process kill and skipped
# when its artifact is already fresh; safe to re-run.
set -u
cd "$(dirname "$0")/.."

TOK16=${TOK16:-outputs/r4c_tok16}

latest() {
  python - "$1" <<'EOF'
import sys
from world_modelz_tpu.train.checkpoint import latest_checkpoint
print(latest_checkpoint(sys.argv[1]) or "")
EOF
}

# ---- 1a. moving_mnist ds=2 tokenizer (16x16 token grid at 64px) -----------
if [ -z "$(latest "$TOK16")" ]; then
  timeout 2400 python scripts/train_vqae.py \
    --dataset moving_mnist --image_size 64 --in_channels 1 \
    --max_steps 1200 --batch_size 96 --num_embeddings 512 \
    --embedding_dim 64 --downscale_steps 2 --checkpoint_interval 600 \
    --output_dir "$TOK16" --name tok16 || true
fi
TOK_CKPT=$(latest "$TOK16"); [ -n "$TOK_CKPT" ] || exit 1
echo "[r4c] tokenizer: $TOK_CKPT"

# ---- 1b. composite trainer window with fenced device/h2d probes -----------
need_composite=$(python - <<'EOF'
import json, os
p = "artifacts/train_e2e_composite_timing.json"
try:
    d = json.load(open(p))
    print("no" if "probe" in d else "yes")
except Exception:
    print("yes")
EOF
)
if [ "$need_composite" = yes ]; then
  timeout 2400 python scripts/main.py \
    --decoder_model "$TOK_CKPT" \
    --dataset moving_mnist --image_size 64 --n_past 5 \
    --device_composite true \
    --dim 384 --mlp_dim 512 --heads 1 --depth 20 --dim_head 128 \
    --extents 3,1,1 --batch_size 64 --bf16 true \
    --lr 1e-4 --warmup 100 --max_steps 1000 --steps_per_dispatch 10 \
    --probe_interval 50 \
    --checkpoint_interval 0 --eval_interval 0 \
    --timing_report artifacts/train_e2e_composite_timing.json \
    --output_dir outputs/r4c_composite_e2e --name ce2e \
    || echo "[r4c] composite e2e run failed"
fi

# ---- 2. ledger ingest + README/ROADMAP regen -------------------------------
timeout 1200 python benchmarks/perf_ledger.py \
  train_e2e train_e2e_sparse serve_suite || true
python benchmarks/ledger_report.py --update README.md docs/ROADMAP.md || true

echo "[r4c] done"
