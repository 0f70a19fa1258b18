"""Render the perf ledger as markdown — the ONE source of perf numbers.

Round-2 review flagged number drift between README/ROADMAP prose and
`artifacts/perf_ledger.json` (64.9 vs 68.2 steps/sec for the same bench).
Docs now embed the generated table between the markers

    <!-- ledger:begin -->  ...  <!-- ledger:end -->

and this script rewrites that region in place:

    python benchmarks/ledger_report.py              # print markdown table
    python benchmarks/ledger_report.py --update README.md docs/ROADMAP.md

A test asserts the committed docs match a fresh render, so a ledger refresh
without a doc refresh fails CI instead of silently drifting.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
LEDGER = os.path.join(ROOT, "artifacts", "perf_ledger.json")
BEGIN, END = "<!-- ledger:begin -->", "<!-- ledger:end -->"


def _fmt_config(cfg: dict) -> str:
    parts = []
    for k, v in cfg.items():
        if isinstance(v, float):
            v = f"{v:g}"
        elif isinstance(v, (list, tuple)):
            v = "x".join(str(x) for x in v)
        parts.append(f"{k}={v}")
    return " ".join(parts)


def render(ledger_path: str = LEDGER) -> str:
    with open(ledger_path) as f:
        data = json.load(f)
    entries = sorted(data.get("entries", []), key=lambda e: e["name"])
    device = data.get("device", "?")
    newest = max((e.get("ts", 0) for e in entries), default=0)
    stamp = (
        datetime.datetime.fromtimestamp(newest, datetime.timezone.utc).strftime(
            "%Y-%m-%d"
        )
        if newest
        else "?"
    )
    lines = [
        f"Source: `artifacts/perf_ledger.json` on **{device}** "
        f"(latest entry {stamp}; regenerate with "
        "`python benchmarks/ledger_report.py --update README.md docs/ROADMAP.md`).",
        "",
        "| Benchmark | ms | TFLOP/s | MFU % | Config |",
        "|---|---|---|---|---|",
    ]
    for e in entries:
        mfu = e.get("mfu_pct")
        tfs = e.get("tflops_per_sec")
        lines.append(
            "| `{name}` | {ms:.4g} | {tfs} | {mfu} | {cfg} |".format(
                name=e["name"],
                ms=e["ms"],
                tfs=f"{tfs:.2f}" if tfs is not None else "—",
                mfu=f"{mfu:.1f}" if mfu is not None else "—",
                cfg=_fmt_config(e.get("config", {})),
            )
        )
    return "\n".join(lines)


def update_file(path: str, table: str) -> bool:
    """Replace the marker region in `path`; returns True if changed."""
    with open(path) as f:
        text = f.read()
    if BEGIN not in text or END not in text:
        raise SystemExit(
            f"{path}: missing {BEGIN} / {END} markers — add them where the "
            "perf table should live."
        )
    new = re.sub(
        re.escape(BEGIN) + r".*?" + re.escape(END),
        BEGIN + "\n" + table + "\n" + END,
        text,
        flags=re.S,
    )
    if new != text:
        with open(path, "w") as f:
            f.write(new)
        return True
    return False


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ledger", default=LEDGER)
    ap.add_argument(
        "--update",
        nargs="*",
        default=None,
        help="files whose marker region to rewrite (paths relative to repo root)",
    )
    ap.add_argument(
        "--check",
        nargs="*",
        default=None,
        help="fail (exit 1) if these files' regions are stale",
    )
    args = ap.parse_args(argv)
    table = render(args.ledger)
    if args.update is None and args.check is None:
        print(table)
        return 0
    rc = 0
    for path in args.update or []:
        full = path if os.path.isabs(path) else os.path.join(ROOT, path)
        changed = update_file(full, table)
        print(f"{path}: {'updated' if changed else 'already current'}")
    for path in args.check or []:
        full = path if os.path.isabs(path) else os.path.join(ROOT, path)
        with open(full) as f:
            text = f.read()
        want = BEGIN + "\n" + table + "\n" + END
        if want not in text:
            print(f"{path}: STALE perf table (rerun with --update)")
            rc = 1
        else:
            print(f"{path}: current")
    return rc


if __name__ == "__main__":
    sys.exit(main())
