#!/usr/bin/env bash
# Round-3 perf measurements that need an idle TPU (run AFTER
# chain_train_f16.sh reaches 75k and collect_round3_f16.sh finished):
#
#  1. banded H-tiled backward A/B at the Sber 32x32 and S=32 shapes
#     (kernels/local3d.py round-3 banding; numbers land in the log and
#     docs/ROADMAP.md gets updated from them by hand once)
#  2. the trajectory-shipping trainer's end-to-end timing window
#     (--device_composite) -> artifacts/train_e2e_composite_timing.json
#  3. perf-ledger refresh for the attention section + e2e rows, then the
#     README/ROADMAP table regeneration
#  4. bench.py sanity (the driver runs it again at round end)
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-outputs/collect_round3_perf.log}
TOK=${TOK:-outputs/r3_tok16}

echo "== band A/B: sber 32x32 (H-tiled bwd) ==" | tee -a "$LOG"
timeout 2400 python benchmarks/band_ab.py --shape sber --dtype bf16 \
  2>&1 | tee -a "$LOG" | grep -E "fwd|bwd|fit" || true
echo "== band A/B: s32 ==" | tee -a "$LOG"
timeout 2400 python benchmarks/band_ab.py --shape s32 --dtype bf16 \
  2>&1 | tee -a "$LOG" | grep -E "h-tiled" || true

echo "== composite trainer e2e window ==" | tee -a "$LOG"
TOK_CKPT=$(python - "$TOK" <<'EOF'
import sys
from world_modelz_tpu.train.checkpoint import latest_checkpoint
print(latest_checkpoint(sys.argv[1]) or "")
EOF
)
if [ -n "$TOK_CKPT" ]; then
  timeout 2400 python scripts/main.py \
    --decoder_model "$TOK_CKPT" \
    --dataset moving_mnist --image_size 64 --n_past 5 \
    --device_composite true \
    --dim 384 --mlp_dim 512 --heads 1 --depth 20 --dim_head 128 \
    --extents 3,1,1 --batch_size 64 --bf16 true \
    --lr 1e-4 --warmup 100 --max_steps 700 --steps_per_dispatch 10 \
    --checkpoint_interval 0 --eval_interval 0 \
    --timing_report artifacts/train_e2e_composite_timing.json \
    --output_dir outputs/r3_composite_e2e --name ce2e >>"$LOG" 2>&1 \
    || echo "composite e2e run failed" | tee -a "$LOG"
else
  echo "no tokenizer checkpoint under $TOK; skipping composite e2e" \
    | tee -a "$LOG"
fi

echo "== ledger refresh (attn + e2e) ==" | tee -a "$LOG"
timeout 3600 python benchmarks/perf_ledger.py attn train_e2e \
  >>"$LOG" 2>&1 || echo "ledger refresh failed" | tee -a "$LOG"
python benchmarks/ledger_report.py --update README.md docs/ROADMAP.md \
  | tee -a "$LOG" || true

echo "== bench.py sanity ==" | tee -a "$LOG"
timeout 600 python bench.py | tee -a "$LOG" || true
echo "[collect_round3_perf] done" | tee -a "$LOG"
