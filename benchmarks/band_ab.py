"""A/B the banded all-frames local3d kernels on TPU at the flagship shape.

One-off measurement driving the qt (query row band) preference in
`kernels.local3d.pick_allframes_band`: narrower bands execute fewer
masked-dense flops (the lever identified by benchmarks/attn_roofline.py)
but shrink the MXU M dimension. Run on the real chip:

    python benchmarks/band_ab.py [--dtype bf16] [--shape m3|s32]
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp

from world_modelz_tpu.utils import compcache
from world_modelz_tpu.utils.profiling import benchmark_chained


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument(
        "--shape", default="m3",
        choices=["m3", "m3b64", "s32", "g8", "sber"]
    )
    p.add_argument(
        "--only",
        default=None,
        choices=["allframes", "perframe", "htiled", "split"],
        help="measure just one variant family (each skipped family saves "
        "several 1-4 minute remote compiles)",
    )
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    compcache.enable()

    from world_modelz_tpu.kernels.local3d import (
        _bwd_impl,
        _bwd_impl_allframes,
        _fwd_impl,
        _fwd_impl_allframes,
        fits_vmem_allframes,
        fits_vmem_allframes_bwd,
    )

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    item = jnp.dtype(dtype).itemsize
    if args.shape == "m3":
        b, s, h, w, inner, heads = 8, 6, 16, 16, 128, 1
    elif args.shape == "m3b64":
        # the production-batch 16x16 train step (train_step/m3_b64):
        # per-sample attention here is ~1.3x slower than at b8 — this
        # shape checks whether qt preference shifts with grid length
        b, s, h, w, inner, heads = 64, 6, 16, 16, 128, 1
    elif args.shape == "g8":
        # the as-trained model-#3 configuration: batch 64, 8x8 token grid
        b, s, h, w, inner, heads = 64, 6, 8, 8, 128, 1
    elif args.shape == "sber":
        # Sber 32x32 (the ledger's attn/sber row; bwd routes H-tiled)
        b, s, h, w, inner, heads = 2, 16, 32, 32, 128, 1
    else:
        b, s, h, w, inner, heads = 2, 32, 16, 16, 128, 1
    extents = (3, 1, 1)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (b, s, h, w, inner), dtype)

    def fwd_step(qt, wt=None):
        def step(x):
            return _fwd_impl_allframes(
                x, x, x, extents, heads, False, qt, wt
            )
        return step

    def bwd_step(qt, wt=None):
        def step(x):
            dq, dk, dv = _bwd_impl_allframes(
                x, x, x, x, extents, heads, False, qt, wt
            )
            return dq + dk + dv
        return step

    def want(family):
        return args.only is None or args.only == family

    # (qt, wt) combos: row bands as before, plus dual-axis column bands
    # (wt) — the executed-flop lever on the W axis (pick_allframes_wt)
    combos = [(None, None), (8, None), (4, None), (2, None),
              (8, 8), (8, 4), (4, 8), (16, 8)]
    for qt, wt in combos if want("allframes") else ():
        if qt is not None and (qt > h or h % qt):
            continue
        if wt is not None and (wt + 2 * extents[2] >= w or w % wt):
            continue
        tag = f"qt={qt} wt={wt}"
        if not fits_vmem_allframes(s, h, w, extents, inner // heads, item, qt):
            print(f"fwd {tag}: does not fit")
        else:
            us = benchmark_chained(
                fwd_step(qt, wt), x0, iters_short=40, iters_long=240,
                trials=3,
            ) * 1e6
            print(f"fwd {tag}: {us:.1f} us")
        if not fits_vmem_allframes_bwd(
            s, h, w, extents, inner // heads, item, qt
        ):
            print(f"bwd {tag}: does not fit")
            continue
        us = benchmark_chained(
            bwd_step(qt, wt), x0, iters_short=40, iters_long=240, trials=3
        ) * 1e6
        print(f"bwd {tag}: {us:.1f} us")

    # per-frame-grid variants (the routed path for shapes whose all-frames
    # working set does not fit), banded and unbanded
    def fwd_pf(qt):
        def step(x):
            return _fwd_impl(x, x, x, extents, heads, False, qt)
        return step

    def bwd_pf(qt):
        def step(x):
            dq, dk, dv = _bwd_impl(x, x, x, x, extents, heads, False, qt)
            return dq + dk + dv
        return step

    def try_bench(tag, step):
        # a variant the router would not pick (e.g. unbanded 32x32) can
        # exceed the scoped-VMEM limit at compile time; record and move on
        try:
            us = benchmark_chained(
                step, x0, iters_short=40, iters_long=240, trials=3
            ) * 1e6
            print(f"{tag}: {us:.1f} us")
        except Exception as e:  # noqa: BLE001 — remote-compile errors vary
            msg = str(e).splitlines()[0][:100]
            print(f"{tag}: compile/run failed ({msg})")

    for qt in (None, 8, 4) if want("perframe") else ():
        if qt is not None and (qt >= h or h % qt):
            continue
        try_bench(f"fwd per-frame qt={qt}", fwd_pf(qt))
        try_bench(f"bwd per-frame qt={qt}", bwd_pf(qt))

    # H-tiled variant (the routed BACKWARD at 32x32+; its key-row banding
    # shipped round 3 — this block records the banded numbers)
    from world_modelz_tpu.kernels.local3d import (
        _bwd_impl_tiled,
        _fwd_impl_tiled,
        pick_h_tile,
    )

    th = pick_h_tile(s, h, w, extents, inner // heads)
    if not want("htiled"):
        th = None
    if th is not None:

        def fwd_ht(x):
            return _fwd_impl_tiled(x, x, x, extents, heads, False, th)

        def bwd_ht(x):
            dq, dk, dv = _bwd_impl_tiled(
                x, x, x, x, extents, heads, False, th
            )
            return dq + dk + dv

        us = benchmark_chained(
            fwd_ht, x0, iters_short=40, iters_long=240, trials=3
        ) * 1e6
        print(f"fwd h-tiled th={th}: {us:.1f} us")
        us = benchmark_chained(
            bwd_ht, x0, iters_short=40, iters_long=240, trials=3
        ) * 1e6
        print(f"bwd h-tiled th={th}: {us:.1f} us")
    elif want("htiled"):
        print("h-tiled: no valid TH at this shape")

    # split (flash-style) backward: dQ pass + key-centric dK/dV pass,
    # no partial slabs, no fold
    from world_modelz_tpu.kernels.local3d import (
        _bwd_impl_split,
        pick_split_bands,
    )

    if not want("split"):
        return
    picked = pick_split_bands(s, h, w, extents, inner // heads, item)
    print(f"split bands picked: {picked}")
    for qt, kt in {
        picked,
        (picked[0] if picked else None, 4 if h % 4 == 0 else None),
        (picked[0] if picked else None, 8 if h % 8 == 0 else None),
    } - {None}:
        if qt is None or kt is None:
            continue

        def bwd_split(x, qt=qt, kt=kt):
            dq, dk, dv = _bwd_impl_split(
                x, x, x, x, extents, heads, False, qt, kt
            )
            return dq + dk + dv

        try_bench(f"bwd split qt={qt} kt={kt}", bwd_split)


if __name__ == "__main__":
    main()
