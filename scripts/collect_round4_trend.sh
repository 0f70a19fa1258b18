#!/usr/bin/env bash
# Round-4: checkpoint-trend quality evidence with TWO independent feature
# extractors (VERDICT r3 #7 — corroborate the single-extractor FVD trend).
#
# For each kept m3 checkpoint (8x8 grid, trained by collect_round4.sh) run
# the rollout CLI twice — once scoring FVD with the deterministic 'tiny'
# extractor, once with the trained-tokenizer-encoder extractor
# (utils/fvd.make_tokenizer_extractor) — same seed, so both score the SAME
# generated clips. gt_metrics (PSNR/SSIM per horizon) ride the tiny pass.
# Also runs the corruption-sensitivity calibration for both extractors.
#
# Artifacts land in artifacts/round4/trend/ (summarize with
# scripts/summarize_quality.py --dir artifacts/round4/trend --prefix m3r4).
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:-outputs/r4}
ART=${ART:-artifacts/round4/trend}
TOK=${TOK:-$OUT/tok/step_0001200}
STEPS=${STEPS:-"2500 10000 20000 30000"}
mkdir -p "$ART"

for s in $STEPS; do
  ck="$OUT/m3/step_$(printf '%07d' "$s")"
  [ -d "$ck" ] || { echo "skip missing $ck"; continue; }
  if [ ! -f "$ART/m3r4_${s}_fvd.json" ]; then
    timeout 2400 python -m world_modelz_tpu.cli.rollout \
      --checkpoint "$ck" --use_ema true --batch_size 8 --num_frames 8 \
      --fvd true --fvd_clips 64 --gt_metrics true \
      --output_dir "$ART" --name "m3r4_${s}" || true
  fi
  if [ ! -f "$ART/m3r4tok_${s}_fvd.json" ]; then
    timeout 2400 python -m world_modelz_tpu.cli.rollout \
      --checkpoint "$ck" --use_ema true --batch_size 8 --num_frames 8 \
      --fvd true --fvd_clips 64 \
      --fvd_feature_net tokenizer --fvd_weights "$TOK" \
      --output_dir "$ART" --name "m3r4tok_${s}" || true
  fi
done

# corruption-sensitivity calibration for both extractors (CPU-friendly;
# the tokenizer extractor reads its checkpoint via --tokenizer/env)
if [ ! -f artifacts/round4/fvd_calibration_two.json ]; then
  WMZ_TOKENIZER_EXTRACTOR="$TOK" timeout 2400 \
    python benchmarks/fvd_calibration.py \
    --extractors tiny,tokenizer --tokenizer "$TOK" \
    --out artifacts/round4/fvd_calibration_two.json || true
fi

ls -la "$ART"
echo "[r4-trend] done"
