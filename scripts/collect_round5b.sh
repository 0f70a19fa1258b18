#!/usr/bin/env bash
# Round-5 follow-up collection (runs after collect_round5.sh stage 6):
#  1. refill the m316tok_10000 trend cell (lost to a relay remote_compile
#     error during stage 4c)
#  2. recalibrate the tokenizer-extractor noise floor ON the round-5 16x16
#     tokenizer (the round-4 floor was measured with a different tokenizer's
#     features; the trend README should compare against a floor computed
#     with the exact extractor that scored the trend cells)
#  3. regenerate the two-extractor trend README
#
# Stages skip when their artifact exists; safe to re-run. Keep the host
# otherwise idle (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."

ART=${ART:-artifacts/round5}
OUT=${OUT:-outputs/r5}
TOK16=$(python - <<'EOF'
from world_modelz_tpu.train.checkpoint import latest_checkpoint
print(latest_checkpoint("outputs/r5_tok16") or "")
EOF
)
echo "[r5b] tok16: $TOK16"

# ---- 1. refill the missing 10k tokenizer-extractor cell ---------------------
ck="$OUT/m316/step_0010000"
if [ -d "$ck" ] && [ -n "$TOK16" ] && [ ! -f "$ART/trend/m316tok_10000_fvd.json" ]; then
  timeout 2400 python -m world_modelz_tpu.cli.rollout \
    --checkpoint "$ck" --use_ema true --batch_size 8 --num_frames 8 \
    --fvd true --fvd_clips 64 \
    --fvd_feature_net tokenizer --fvd_weights "$TOK16" \
    --output_dir "$ART/trend" --name "m316tok_10000" || true
fi

# ---- 2. tokenizer-extractor floor on the round-5 extractor ------------------
if [ -n "$TOK16" ] && [ ! -f "$ART/fvd_floor_tok16.json" ]; then
  timeout 2400 python benchmarks/fvd_calibration.py \
    --clips 64 --extractors tokenizer --tokenizer "$TOK16" \
    --out "$ART/fvd_floor_tok16.json" || true
fi

# ---- 3. regenerate the trend README ------------------------------------------
python scripts/summarize_quality.py --dir "$ART/trend" \
  --prefix m316 --prefix2 m316tok --fvd2_label "tokenizer feats, v2" \
  --out "$ART/trend/README.md" \
  --title "m3 16x16 quality trend (two extractors, round 5)" || true

echo "[r5b] done"
