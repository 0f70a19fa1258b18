#!/usr/bin/env python
"""Generate the quality-trend README for a collected checkpoint series.

Reads the `<prefix>_<step>_fvd.json` / `<prefix>_<step>_gt_metrics.json`
records that `scripts/rollout.py --fvd --gt_metrics` (driven by
scripts/collect_round3_f16.sh) writes, and emits one markdown table with
FVD (and its bootstrap 95% CI when recorded), mean/horizon-1 PSNR/SSIM
and the tokenizer-roundtrip ceiling — the single source for the
artifacts README (same no-hand-edited-numbers policy as the perf-ledger
tables, VERDICT r2 #9).

    python scripts/summarize_quality.py --dir artifacts/round3_f16 \
        --prefix m3f16 --out artifacts/round3_f16/README.md
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re


def load_series(directory: str, prefix: str):
    rows = {}
    for fn in glob.glob(os.path.join(directory, f"{prefix}_*_fvd.json")):
        m = re.search(rf"{re.escape(prefix)}_(\d+)_fvd\.json$", fn)
        if not m:
            continue
        rows.setdefault(int(m.group(1)), {})["fvd"] = json.load(open(fn))
    for fn in glob.glob(
        os.path.join(directory, f"{prefix}_*_gt_metrics.json")
    ):
        m = re.search(rf"{re.escape(prefix)}_(\d+)_gt_metrics\.json$", fn)
        if not m:
            continue
        rows.setdefault(int(m.group(1)), {})["gt"] = json.load(open(fn))
    return dict(sorted(rows.items()))


def fmt_fvd(rec) -> str:
    if rec is None:
        return "—"
    s = f"{rec['fvd']:.3f}"
    ci = rec.get("fvd_ci95")
    if ci:
        s += f" [{ci[0]:.3f}, {ci[1]:.3f}]"
    return f"{s} (n={rec.get('clips', '?')})"


def table(rows, fvd2_label: str = "") -> str:
    two = bool(fvd2_label)
    head = (
        "| Checkpoint | mean PSNR | mean SSIM | horizon-1 PSNR | "
        "tokenizer ceiling PSNR | FVD [95% CI] |"
    )
    sep = "|---|---|---|---|---|---|"
    if two:
        head += f" FVD ({fvd2_label}) [95% CI] |"
        sep += "---|"
    lines = [head, sep]
    for step, r in rows.items():
        gt = r.get("gt")
        if gt:
            hs = gt["per_horizon"]
            mean_psnr = sum(h["psnr"] for h in hs) / len(hs)
            mean_ssim = sum(h["ssim"] for h in hs) / len(hs)
            ceiling = sum(h["tokenizer_ceiling_psnr"] for h in hs) / len(hs)
            g = (
                f"{mean_psnr:.2f} | {mean_ssim:.3f} | "
                f"{hs[0]['psnr']:.2f} | {ceiling:.2f}"
            )
        else:
            g = "— | — | — | —"
        row = f"| {step / 1000:g}k | {g} | {fmt_fvd(r.get('fvd'))} |"
        if two:
            row += f" {fmt_fvd(r.get('fvd2'))} |"
        lines.append(row)
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dir", required=True)
    p.add_argument("--prefix", required=True)
    p.add_argument(
        "--prefix2",
        default="",
        help="second rollout series (e.g. the tokenizer-encoder FVD "
        "extractor, VERDICT r3 #7) appended as an extra FVD column",
    )
    p.add_argument(
        "--fvd2_label",
        default="2nd extractor",
        help="column label for the --prefix2 FVD series",
    )
    p.add_argument("--out", default="")
    p.add_argument(
        "--title", default="Quality trend across training checkpoints"
    )
    a = p.parse_args(argv)

    rows = load_series(a.dir, a.prefix)
    if not rows:
        raise SystemExit(
            f"no {a.prefix}_*_{{fvd,gt_metrics}}.json under {a.dir}"
        )
    if a.prefix2:
        for step, r in load_series(a.dir, a.prefix2).items():
            if "fvd" in r:
                rows.setdefault(step, {})["fvd2"] = r["fvd"]
    md = (
        f"## {a.title}\n\n"
        + table(rows, a.fvd2_label if a.prefix2 else "")
        + "\n"
    )
    print(md)
    if a.out:
        marker = ("<!-- quality:begin -->", "<!-- quality:end -->")
        block = f"{marker[0]}\n{md}{marker[1]}"
        if os.path.exists(a.out):
            text = open(a.out).read()
            if marker[0] in text:
                pre = text.split(marker[0])[0]
                post = text.split(marker[1])[1]
                text = pre + block + post
            else:
                text = text.rstrip() + "\n\n" + block + "\n"
        else:
            text = block + "\n"
        with open(a.out, "w") as f:
            f.write(text)
        print("wrote", a.out)


if __name__ == "__main__":
    main()
