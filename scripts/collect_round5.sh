#!/usr/bin/env bash
# Round-5 TPU evidence collection (VERDICT r4 asks #4-#8):
#  1. relay dispatch-latency decomposition         (#5: probed-vs-compiled)
#  2. serving matrix suite                         (#4; done 08-20, skipped
#     via artifacts/serve_suite.json + serve_suite ledger rows)
#  3. sparse/composite probe-reconciled timing     (#5; done 08-20, skipped
#     via the `probe` key in their timing JSONs)
#  4. fresh 16x16 flagship run (round-3/4 checkpoints were wiped between
#     rounds) + two-extractor trend + 16x16 two-framework FVD (#8)
#  5. SOM + masked retrain (outputs/ wiped) + quantitative quality (#7)
#  6. ledger ingest + README/ROADMAP regen
#
# Stage order = judge priority: the 16x16 north-star chain first, the
# SOM/masked quality numbers second, the (partial-emitting) two-framework
# FVD last so it can run until the round ends.
#
# Stages are bounded under the relay's ~45-min process kill and skipped
# when their artifact already exists; safe to re-run. Keep the host idle:
# concurrent CPU work inflates relay timing ~2x (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."

ART=${ART:-artifacts/round5}
OUT=${OUT:-outputs/r5}
M316_STEPS=${M316_STEPS:-30000}
mkdir -p "$ART" "$OUT"

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

# ---- 1. relay dispatch latency (host must be idle) --------------------------
if [ ! -f artifacts/relay_latency.json ]; then
  timeout 2400 python benchmarks/relay_probe.py || true
fi

# ---- 2. serving matrix (done 08-20; only re-run if artifact vanished) -------
if [ ! -f artifacts/serve_suite.json ]; then
  timeout 2400 python benchmarks/serve_bench.py --suite || true
fi

# ---- 3. sparse timing window (done 08-20; only if probe key vanished) -------
TOKS=${TOKS:-outputs/r4_sparse_tok}
TOK_SP=$(latest "$TOKS")
if [ -n "$TOK_SP" ] && ! python - <<'EOF'
import json
d = json.load(open("artifacts/train_e2e_sparse_timing.json"))
raise SystemExit(0 if "probe" in d else 1)
EOF
then
  timeout 2400 python scripts/sparse_diffusion.py \
    --decoder_model "$TOK_SP" \
    --dataset synthetic --image_size 64 --S 16 --H 16 --W 16 \
    --num_context 1024 --attn_backend flash \
    --dim 512 --depth 8 --heads 8 --mlp_dim 1024 \
    --batch_size 16 --bf16 true --ema_decay 0.999 \
    --lr 1e-4 --warmup 200 --max_steps 1500 \
    --checkpoint_interval 0 --eval_interval 0 \
    --timing_report artifacts/train_e2e_sparse_timing.json \
    --probe_interval 300 \
    --output_dir "$OUT/sparse_e2e" --name sp || true
fi

# ---- 4. 16x16 tokenizer (needed by the flagship + tokenizer extractor) -----
TOK16_DIR=${TOK16_DIR:-outputs/r5_tok16}
if [ -z "$(latest "$TOK16_DIR")" ]; then
  timeout 2400 python scripts/train_vqae.py \
    --dataset moving_mnist --image_size 64 --in_channels 1 \
    --max_steps 1200 --batch_size 96 --num_embeddings 512 \
    --embedding_dim 64 --downscale_steps 2 --checkpoint_interval 600 \
    --output_dir "$TOK16_DIR" --name tok16 || true
fi
TOK16=$(latest "$TOK16_DIR"); echo "[r5] tok16: $TOK16"

if [ -n "$TOK16" ] && ! python - <<'EOF'
import json
d = json.load(open("artifacts/train_e2e_composite_timing.json"))
raise SystemExit(0 if "probe" in d else 1)
EOF
then
  timeout 2400 python scripts/main.py \
    --decoder_model "$TOK16" \
    --dataset moving_mnist --image_size 64 --n_past 5 \
    --device_composite true \
    --dim 384 --mlp_dim 512 --heads 1 --depth 20 --dim_head 128 \
    --extents 3,1,1 --batch_size 64 --bf16 true \
    --lr 1e-4 --warmup 100 --max_steps 1000 --steps_per_dispatch 10 \
    --probe_interval 50 \
    --checkpoint_interval 0 --eval_interval 0 \
    --timing_report artifacts/train_e2e_composite_timing.json \
    --output_dir "$OUT/composite_e2e" --name ce2e || true
fi

# ---- 4b. fresh 16x16 flagship (chained segments under the relay kill) ------
if [ -n "$TOK16" ]; then
  for i in 1 2 3 4 5 6 7 8; do
    CKPT=$(latest "$OUT/m316")
    STEP=$(ckpt_step "$CKPT")
    [ "${STEP:-0}" -ge "$M316_STEPS" ] && break
    echo "[r5] m316 segment $i from step ${STEP:-0}"
    timeout 2400 python scripts/main.py \
      --decoder_model "$TOK16" \
      --dataset moving_mnist --image_size 64 --n_past 5 \
      --device_composite true \
      --dim 384 --mlp_dim 512 --heads 1 --depth 20 --dim_head 128 \
      --extents 3,1,1 --batch_size 64 --bf16 true --ema_decay 0.999 \
      --lr 1e-4 --warmup 500 --max_steps "$M316_STEPS" \
      --steps_per_dispatch 10 \
      --checkpoint_interval 2500 --eval_interval 0 \
      --output_dir "$OUT/m316" --name m316 \
      ${CKPT:+--checkpoint "$CKPT"} || true
  done
  echo "[r5] m316 at $(latest "$OUT/m316")"
fi

# ---- 4c. 16x16 trend: both extractors over the SAME clips (#8) -------------
M316=$(latest "$OUT/m316")
if [ -n "$M316" ]; then
  for s in 2500 10000 20000 $M316_STEPS; do
    ck="$OUT/m316/step_$(printf '%07d' "$s")"
    [ -d "$ck" ] || { echo "skip missing $ck"; continue; }
    if [ ! -f "$ART/trend/m316_${s}_fvd.json" ]; then
      timeout 2400 python -m world_modelz_tpu.cli.rollout \
        --checkpoint "$ck" --use_ema true --batch_size 8 --num_frames 8 \
        --fvd true --fvd_clips 64 --gt_metrics true \
        --output_dir "$ART/trend" --name "m316_${s}" || true
    fi
    if [ ! -f "$ART/trend/m316tok_${s}_fvd.json" ]; then
      timeout 2400 python -m world_modelz_tpu.cli.rollout \
        --checkpoint "$ck" --use_ema true --batch_size 8 --num_frames 8 \
        --fvd true --fvd_clips 64 \
        --fvd_feature_net tokenizer --fvd_weights "$TOK16" \
        --output_dir "$ART/trend" --name "m316tok_${s}" || true
    fi
  done
  python scripts/summarize_quality.py --dir "$ART/trend" \
    --prefix m316 --prefix2 m316tok --fvd2_label "tokenizer feats, v2" \
    --out "$ART/trend/README.md" \
    --title "m3 16x16 quality trend (two extractors, round 5)" || true
fi

# ---- 5. SOM pipeline + masked-denoise retrain (outputs/ wiped between
#         rounds) then quantitative quality scores (#7) ----------------------
if [ ! -f "$ART/som_masked_quality.json" ]; then
  OUT=outputs/r4_som ART="$ART/som" bash scripts/collect_round4_som.sh || true
  if [ -z "$(latest outputs/r4/masked)" ]; then
    timeout 2400 python scripts/masked_denoise.py \
      --batch_size 32 --max_steps 4000 --eval_interval 2000 \
      --checkpoint_interval 2000 --log_interval 100 \
      --output_dir outputs/r4/masked --name masked || true
  fi
  timeout 2400 python benchmarks/quality_som_masked.py \
    --out "$ART/som_masked_quality.json" || true
fi

# ---- 6. two-framework FVD at the 16x16 production grid (#8; torch
#         reference sampler ~4x slower per clip at 4x tokens -> 32 clips;
#         the harness emits partial scores per chunk either way) -------------
if [ -n "$M316" ] && [ ! -f "$ART/two_framework_fvd_16x16.json" ]; then
  timeout 5400 python benchmarks/fvd_two_framework.py \
    --checkpoint "$M316" --use_ema --clips 32 --batch_size 8 \
    --num_frames 8 --tokenizer_extractor "$TOK16" \
    --out "$ART/two_framework_fvd_16x16.json" || true
fi

# ---- 7. ledger ingest + new family rows + docs regen ------------------------
timeout 2400 python benchmarks/perf_ledger.py \
  train_e2e train_e2e_sparse serve_suite train_som train_masked || true
python benchmarks/ledger_report.py --update README.md docs/ROADMAP.md || true

echo "[r5] done"
