"""Roofline decomposition of the measured attention ledger rows.

Round-2 review (VERDICT #4) asked, for the flagship m3 attention shape,
either a >=1.5x kernel win or "a recorded profile showing the op is at its
memory roofline ... at minimum measuring where the 0.107 ms goes". This
script answers that *offline*: for every `attn/*` / `attn_block/*` /
`vq/*` / `tokenize/*` entry already measured into
`artifacts/perf_ledger.json`, it computes

  t_flops = flops / MXU peak        (time if purely compute-bound)
  t_bytes = min HBM bytes / HBM BW  (time if purely bandwidth-bound)

and compares both against the measured time. The minimal-traffic model
counts each operand tensor once (inputs read + outputs written at their
benched dtype); per-program grid overheads, VMEM copy inefficiency and
relay dispatch are the unexplained remainder. A row is labeled with its
DOMINANT limit (compute or memory) when that limit explains >=40% of the
measured time, else overhead-bound.

For Pallas attention rows a third limit is scored: the EXECUTED flops of
the routed masked-dense variant (the kernels dot every query against all
Ts*HW loaded keys and mask out-of-window entries — 28.4x the useful
flops at extents (3,1,1) on a 16x16 grid).

Conclusion this records for the m3 shape (b8 s6 16x16 inner128 f32): the
useful-flop limit is ~2 us and the HBM limit ~31 us, but the EXECUTED
masked-dense flops need >=57 us even at bf16 peak (the bench feeds f32,
which runs the MXU slower still) against ~107 us measured — the op is
near its *executed*-compute roofline, not launch-bound and not at the
memory roofline. The 28x masked-dense waste, inherent to computing
full-plane scores for a 9-position spatial window, is both why the op
only matches XLA at small grids and the remaining lever: a narrower key
band per query tile (the H-tiled variant's two-TH-row-slab trick already
does this for big grids) buys up to ~2.5x before hitting HBM. Reference
baseline for the op itself:
vq-video-diffusion/triton_prototpye/local_3d_attention_triton1.py:283-313
(wall-clock ratios only, no roofline accounting).

Run (no TPU needed): python benchmarks/attn_roofline.py
Writes artifacts/attn_roofline.json and prints one line per row.
"""

from __future__ import annotations

import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(ROOT, "artifacts", "perf_ledger.json")
OUT = os.path.join(ROOT, "artifacts", "attn_roofline.json")

# v5e public peaks (utils/flops.DEVICE_PEAKS); entries record their device
PEAKS = {"TPU v5 lite": (197.0e12, 819.0e9), "TPU v5e": (197.0e12, 819.0e9)}


def _hw(cfg):
    h, w = (int(t) for t in str(cfg.get("hw", "0x0")).split("x"))
    return h, w


def executed_attn_flops(cfg: dict) -> tuple[int, str] | None:
    """EXECUTED MXU flops of the routed Pallas variant (vs the USEFUL
    flops the ledger scores MFU against).

    The kernels compute masked-DENSE scores: every query row dots every
    key row of its loaded block, out-of-window entries masked to -inf.
    Full-frame/all-frames load Ts whole frames per query frame (Ts*HW
    keys/query: 28x the <=63 useful at extents (3,1,1), 16x16); the
    H-tiled variant loads two TH-row slabs per frame offset (Ts*2*TH*W
    keys/query). Executed = 2 matmuls x 2*M*K*N over those widths —
    this, not launch count, is what the measured times track (see
    artifacts/attn_roofline.json rows)."""
    from world_modelz_tpu.kernels import local3d as K

    h, w = _hw(cfg)
    b, s, inner = cfg["b"], cfg["s"], cfg["inner"]
    es = cfg["extents"][0] if isinstance(cfg["extents"], (list, tuple)) \
        else int(str(cfg["extents"]).split("x")[0])
    ts = 2 * es + 1
    hw = h * w
    dh = inner  # benched heads=1
    ext = (es, 1, 1)
    eh = 1

    def banded(qt, tag, allframes=False):
        # exact executed work across tiles: edge tiles have clamped
        # (smaller) key bands; the all-frames kernels additionally skip
        # statically-invalid temporal offsets (zero-pad frames), so each
        # query frame executes only its nj <= Ts real offsets
        dots = 0
        for f in range(s):
            nj = (
                min(ts, es - f + s) - max(0, es - f) if allframes else ts
            )
            for h0 in range(0, h, qt):
                lo, hi = max(0, h0 - eh), min(h, h0 + qt + eh)
                dots += (qt * w) * (nj * (hi - lo) * w)
        fl = 2 * 2 * b * dots * dh
        keys = round(dots / (s * hw))
        band_tag = f" qt={qt}" if qt < h else ""
        return fl, f"{tag}{band_tag}: ~{keys} keys/query masked-dense"

    esize = 2 if cfg.get("dtype") == "bf16" else 4  # benched operand size
    qt = K.pick_allframes_band(s, h, w, ext, dh, esize)
    if qt is not None:
        return banded(qt, "all-frames", allframes=True)
    qt = K.pick_frame_band(s, h, w, ext, dh)
    if qt is not None:
        return banded(qt, "per-frame")
    th = K.pick_h_tile(s, h, w, ext, dh)
    if th is None:
        return None
    keys = ts * (th + 2 * eh) * w  # banded tiled forward
    fl = 2 * 2 * (b * s * hw) * keys * dh
    return fl, f"H-tiled th={th}: {keys} keys/query masked-dense"


def min_bytes(name: str, cfg: dict) -> tuple[int, str] | None:
    """Minimal HBM traffic model (each operand once, benched dtype)."""
    if name.startswith("attn/"):
        # q, k, v read + out written, at the row's benched operand dtype
        # (sec_attn records it; legacy rows without a dtype benched f32)
        h, w = _hw(cfg)
        n = cfg["b"] * cfg["s"] * h * w * cfg["inner"]
        esize = 2 if cfg.get("dtype") == "bf16" else 4
        return (
            4 * n * esize,
            f"q+k+v in, out; {cfg.get('dtype', 'f32')} (sec_attn operands)",
        )
    if name.startswith("attn_block/"):
        # x in + out in bf16, q/k/v round-trip HBM when the projections
        # are separate XLA ops (xla & pallas backends); fused keeps them
        # in VMEM. Weights (3*dim*inner + inner*dim) are ~0.4 MB, counted.
        h, w = _hw(cfg)
        n = cfg["b"] * cfg["s"] * h * w
        dim, inner = cfg["dim"], cfg["inner"]
        io = 2 * n * dim * 2 + 4 * dim * inner * 2
        if name.endswith("/fused"):
            return io, "x in, out, weights; q/k/v stay in VMEM (bf16)"
        qkv = 2 * 3 * n * inner * 2  # written by projections, read by attn
        return io + qkv, "x in, out, weights + q/k/v HBM round-trip (bf16)"
    if name.startswith("vq/"):
        n, k, d = cfg["n"], cfg["k"], cfg["d"]
        out = n * d * 4 if "index_only" not in name else n * 4
        return n * d * 4 + k * d * 4 + out, "x, codebook in; out (f32)"
    if name.startswith("tokenize/"):
        b, img = cfg["batch"], cfg["img"]
        c_img = b * img * img * 3 * 2  # bf16 images
        grid = b * (img // 8) * (img // 8) * 4  # int32 token grid
        params = 2_000_000  # ~1M-param conv stacks, bf16
        if "encode" in name:
            return c_img + grid + params, "images in, tokens out, params"
        if "decode" in name:
            return grid + c_img + params, "tokens in, images out, params"
        return 2 * c_img + 2 * grid + 2 * params, "encode+decode traffic"
    return None


def main():
    with open(LEDGER) as f:
        entries = json.load(f)["entries"]
    rows = []
    for e in entries:
        if not re.match(r"attn/|attn_block/|vq/|tokenize/", e["name"]):
            continue
        if e.get("ms") is None or e["device"] not in PEAKS:
            continue
        flop_peak, bw_peak = PEAKS[e["device"]]
        mb = min_bytes(e["name"], e["config"])
        if mb is None:
            continue
        nbytes, note = mb
        t_meas = e["ms"] * 1e-3
        t_flops = e["flops"] / flop_peak
        t_bytes = nbytes / bw_peak
        # Pallas attention rows: also score against the EXECUTED flops of
        # the routed masked-dense variant (bf16-peak lower bound; the
        # sec_attn bench feeds f32 operands, which run the MXU slower)
        exec_fl = None
        if e["name"].startswith("attn/") and e["name"].endswith("/pallas"):
            exec_fl = executed_attn_flops(e["config"])
        t_exec = exec_fl[0] / flop_peak if exec_fl else None
        # dominant limit + how much of the measured time it explains;
        # when nothing explains >=40%, per-program overhead is the story
        cands = [("compute", t_flops), ("memory", t_bytes)]
        if t_exec is not None:
            cands.append(("kernel-compute(executed)", t_exec))
        limit, t_lim = max(cands, key=lambda c: c[1])
        explained = t_lim / t_meas
        bound = limit if explained >= 0.4 else "overhead"
        rows.append({
            "name": e["name"],
            "measured_us": round(t_meas * 1e6, 1),
            "flops": e["flops"],
            "hbm_bytes_min": nbytes,
            "t_flops_us": round(t_flops * 1e6, 2),
            "t_bytes_us": round(t_bytes * 1e6, 2),
            "mfu_pct": e.get("mfu_pct"),
            "hbm_bw_pct": round(100 * t_bytes / t_meas, 1),
            "limit_explains_pct": round(100 * explained, 1),
            "overhead_pct": round(
                100 * max(0.0, t_meas - t_lim) / t_meas, 1
            ),
            "bound": bound,
            **(
                {
                    "executed_flops": exec_fl[0],
                    "executed_waste_x": round(exec_fl[0] / e["flops"], 1),
                    "t_exec_flops_us": round(t_exec * 1e6, 2),
                    "variant": exec_fl[1],
                }
                if exec_fl
                else {}
            ),
            "traffic_model": note,
            "config": e["config"],
        })
        print(
            f"{e['name']:32s} {t_meas*1e6:9.1f}us meas | "
            f"{t_flops*1e6:7.2f}us flop-limit | "
            f"{t_bytes*1e6:7.2f}us hbm-limit | {bound}"
        )
    doc = {
        "about": (
            "Measured time vs analytic compute/bandwidth limits per ledger "
            "row; 'overhead' = neither limit explains >=70% (per-program "
            "launch/grid cost dominates). See module docstring."
        ),
        "device": "TPU v5 lite (197 TFLOP/s bf16, 819 GB/s HBM)",
        "rows": rows,
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"[roofline] {len(rows)} rows -> {OUT}")


if __name__ == "__main__":
    main()
