"""Sampling-hyperparameter sweep at a fixed checkpoint.

Round-2 review (VERDICT Missing #2c): mean next-frame PSNR *dropped* from
the 50k to the 75k checkpoint and nobody knew whether the model or the
sampler was the ceiling. This sweeps the iterative unmask sampler's
hyperparameters (number of unmask iterations, top-k truncation) at one
checkpoint and records FVD (with bootstrap CIs) and held-out next-frame
PSNR/SSIM for each setting — one JSON artifact, one row per combination.

Reference sampling defaults: 30 iterations, full softmax sampling
(vq-video-diffusion/sample.py / results/README.md:13-24).

Run (TPU): python benchmarks/sampler_sweep.py \
    --checkpoint outputs/r2_m3/step_0075000 --fvd_clips 64
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

OUT_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts",
    "sampler_sweep.json",
)


def run(
    checkpoint: str,
    iterations=(10, 30, 60),
    topks=(-1, 100, 25),
    fvd_clips: int = 64,
    batch_size: int = 16,
    num_frames: int = 16,
    seed: int = 0,
    use_ema: bool = True,  # round-2 trend artifacts evaluated EMA weights
    platform: str = "",
    out: str = OUT_DEFAULT,
    outputs_dir: str = "outputs/sampler_sweep",
) -> dict:
    from world_modelz_tpu.cli.rollout import RolloutConfig
    from world_modelz_tpu.cli import rollout as rollout_cli

    rows = []
    for it in iterations:
        for topk in topks:
            name = f"it{it}_topk{topk}"
            cfg = RolloutConfig(
                checkpoint=checkpoint,
                platform=platform,
                use_ema=use_ema,
                batch_size=batch_size,
                num_frames=num_frames,
                num_eval_iterations=it,
                topk=topk,
                manual_seed=seed,
                output_dir=outputs_dir,
                name=name,
                fvd=True,
                fvd_clips=fvd_clips,
                gt_metrics=True,
            )
            rollout_cli.run(cfg)
            with open(f"{outputs_dir}/{name}_fvd.json") as f:
                fvd_rec = json.load(f)
            with open(f"{outputs_dir}/{name}_gt_metrics.json") as f:
                gt_rec = json.load(f)
            rows.append(
                {
                    "iterations": it,
                    "topk": topk,
                    "fvd": fvd_rec["fvd"],
                    "fvd_ci95": fvd_rec["fvd_ci95"],
                    "mean_psnr": gt_rec["mean_psnr"],
                    "mean_ssim": gt_rec["mean_ssim"],
                }
            )
            print("sweep row:", json.dumps(rows[-1]))

    report = {
        "checkpoint": checkpoint,
        "fvd_clips": fvd_clips,
        "gt_clips": batch_size,
        "num_frames": num_frames,
        "rows": rows,
    }
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("->", out)
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--iterations", default="10,30,60")
    p.add_argument("--topks", default="-1,100,25")
    p.add_argument("--use_ema", default="true")
    p.add_argument("--fvd_clips", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default="")
    p.add_argument("--out", default=OUT_DEFAULT)
    p.add_argument("--outputs_dir", default="outputs/sampler_sweep")
    a = p.parse_args(argv)
    run(
        checkpoint=a.checkpoint,
        iterations=tuple(int(x) for x in a.iterations.split(",")),
        topks=tuple(int(x) for x in a.topks.split(",")),
        fvd_clips=a.fvd_clips,
        batch_size=a.batch_size,
        num_frames=a.num_frames,
        seed=a.seed,
        use_ema=a.use_ema.lower() in ("1", "true", "yes"),
        platform=a.platform,
        out=a.out,
        outputs_dir=a.outputs_dir,
    )


if __name__ == "__main__":
    main()
