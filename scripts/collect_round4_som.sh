#!/usr/bin/env bash
# Round-4: run the som-diffusion 5-stage pipeline END-TO-END ON THE TPU
# at small scale (procedural synthetic images — zero-egress environment),
# collecting the evidence VERDICT r3 asked for: the pipeline's previous
# proof was CPU smoke tests only. Artifacts land in artifacts/round4/som/:
# SOM map PNG, finetuned reconstructions, DDPM samples, metrics JSONLs.
#
# Reference pipeline: som-diffusion/experiments/ds2/README.md:8-27
# (train_ae -> train_som -> finetune_ae -> create_diffusion_dataset ->
# train_diffusion). Each stage rehydrates from the previous stage's
# embedded-config checkpoint.
#
# The TPU relay kills processes at ~45 min; every stage here is far
# shorter. Safe to re-run: completed stages are skipped via their
# checkpoints.
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:-outputs/r4_som}
ART=${ART:-artifacts/round4/som}
mkdir -p "$ART"

latest() {
  python - "$1" <<'EOF'
import sys
from world_modelz_tpu.train.checkpoint import latest_checkpoint
print(latest_checkpoint(sys.argv[1]) or "")
EOF
}

# ---- stage 1: AE (conv VQ-less autoencoder, SmoothL1) --------------------
if [ -z "$(latest "$OUT/ae")" ]; then
  timeout 2400 python scripts/train_ae.py \
    --dataset synthetic --image_size 64 --batch_size 96 \
    --max_steps 3000 --checkpoint_interval 1500 --log_interval 100 \
    --output_dir "$OUT/ae" --name ae
fi
AE=$(latest "$OUT/ae"); [ -n "$AE" ] || exit 1

# ---- stage 2: SOM over the AE latents (organizes the codebook) -----------
if [ -z "$(latest "$OUT/som")" ]; then
  timeout 2400 python scripts/train_som.py \
    --ae_checkpoint "$AE" --batch_size 96 --image_size 64 \
    --som_width 32 --som_height 32 --max_steps 4000 \
    --checkpoint_interval 2000 --log_interval 200 \
    --output_dir "$OUT/som" --name som
fi
SOM=$(latest "$OUT/som"); [ -n "$SOM" ] || exit 1

# ---- stage 3: finetune the decoder against quantized latents -------------
if [ -z "$(latest "$OUT/ft")" ]; then
  timeout 2400 python scripts/finetune_ae.py \
    --som_checkpoint "$SOM" --batch_size 96 --image_size 64 \
    --max_steps 1500 --checkpoint_interval 750 --log_interval 100 \
    --output_dir "$OUT/ft" --name ft
fi
FT=$(latest "$OUT/ft"); [ -n "$FT" ] || exit 1

# ---- stage 4: export the 2D SOM-coordinate latent dataset ----------------
if [ ! -f "$OUT/latents.npz" ]; then
  timeout 1200 python scripts/create_diffusion_dataset.py \
    --checkpoint "$FT" --batch_size 96 --image_size 64 \
    --max_examples 8192 --dataset_fn "$OUT/latents.npz"
fi

# ---- stage 5: DDPM UNet over the latent maps + sampling eval -------------
if [ -z "$(latest "$OUT/diff")" ]; then
  timeout 2400 python scripts/train_diffusion.py \
    --input_dataset "$OUT/latents.npz" --decoder_model "$FT" \
    --batch_size 128 --model_channels 64 --num_res_blocks 2 \
    --max_steps 3000 --warmup 200 --eval_interval 1500 \
    --eval_timesteps 250 --eval_batch_size 16 \
    --checkpoint_interval 1500 --log_interval 100 \
    --output_dir "$OUT/diff" --name diff
fi

# ---- collect artifacts -----------------------------------------------------
cp -f "$OUT"/som/som_som_*.png "$ART/" 2>/dev/null || true
cp -f "$OUT"/ft/ft_reconst_*.png "$ART/" 2>/dev/null || true
cp -f "$OUT"/diff/diff_sampling_*.png "$ART/" 2>/dev/null || true
for f in ae/ae som/som ft/ft diff/diff; do
  cp -f "$OUT/${f}_metrics.jsonl" "$ART/" 2>/dev/null || true
done
ls -la "$ART"
echo "[r4-som] done"
