"""Fused local 3D windowed space-time attention as a Pallas TPU kernel.

TPU equivalent of the reference's Triton prototype
(vq-video-diffusion/triton_prototpye/local_3d_attention_triton1.py:16-104),
which computed Q.K scores over the *virtual* unfolded key tensor to avoid the
27x materialization — but was forward-only and single-head (:186-189). This
kernel is multi-head with a full backward pass.

Design (vs. the XLA reference `models.attention.local3d_attention`, which is
the golden baseline): one grid program per (batch*head, frame). The program
loads its query frame (HW, dh) and the 2e_s+1 zero-padded neighbor frames of
K and V — each neighbor offset is its own input spec, giving stride-1
overlapping windows over the frame axis — computes the (HW, Ts*HW) score
matrix on the MXU, applies the spatial-window + sequence-border mask
generated in-register from iota (no mask tensor ever touches HBM),
softmaxes, and multiplies back down to the (HW, dh) output. The score matrix
lives only in VMEM, flash-attention style; the XLA path materializes it in
HBM (~59 MB per head per clip at minecraft scale S=32, HW=256, Ts=7).

Backward: a hand-written flash-style Pallas kernel (`_bwd_kernel`) that
recomputes the score matrix in VMEM (rematerialization — the same trade the
reference makes with `torch.utils.checkpoint`,
local_3d_attention.py:110-113), produces dQ directly, and emits per-offset
partial dK/dV slabs that a cheap diagonal shift-sum on the host side folds
into the overlapping key frames — no cross-program write races, nothing but
the inputs and gradients ever touches HBM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

# leave headroom under the ~16 MiB/core VMEM for double buffering
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024
# all-frames kernels statically unroll seq*ceil(H/qt) tiles; Mosaic stack
# reuse across the unroll is imperfect (see pick_allframes_band) — measured
# safe at <=24 tiles (m3), compile-time scoped-VMEM OOM at 128 (s=32 bf16)
_MAX_ALLFRAMES_TILES = 32


def _part_dtype(q):
    """Storage dtype for the partial dK/dV slabs the backward kernels
    emit for the host-side fold. Each element is a single MXU pass's
    f32-accumulated result; on the bf16 hot path storing it at bf16
    halves the dominant HBM traffic of the backward (slab write + fold
    read) at ~0.4% relative error per contribution, well inside bf16
    gradient tolerance — the fold still accumulates in f32 and f32
    inputs keep f32 slabs (exact parity with the XLA reference)."""
    return jnp.float32 if q.dtype == jnp.float32 else q.dtype


def fits_vmem(
    seq: int, height: int, width: int, extents: Tuple[int, int, int],
    dh: int, qt: int | None = None, bwd: bool = False,
    itemsize: int = 4,
) -> bool:
    """Whether one full-frame grid program's working set fits the VMEM
    budget.

    Forward per program: q + out (HW, dh) and k/v blocks (Ts*HW, dh) at
    the operand dtype (`itemsize` — 2 on the bf16 hot path), plus two
    score-sized f32 intermediates — (HW, Ts*HW) unbanded, or
    (qt*W, Ts*band*W) with a `qt`-row query band. The backward adds g,
    dq, the dK/dV slabs (f32 on-kernel accumulators PLUS their
    operand-dtype output blocks), f32 dp/dscores, and two operand-dtype
    score casts — a substantially larger working set, which is why the
    fit is direction-specific: at 32x32 e=(3,1,1) the BANDED FORWARD
    fits the 32-program per-frame grid while the backward must stay
    H-tiled. When this is False the H-tiled variant takes over
    (`pick_h_tile`); only if that is also impossible do callers fall
    back to XLA.
    """
    hw = height * width
    es, eh, _ = extents
    ts = 2 * es + 1
    qt = height if qt is None else qt
    rows_q = qt * width
    rows_k = ts * min(height, qt + 2 * eh) * width
    score_bytes = rows_q * rows_k * 4 * 2  # scores/p + attn (f32)
    kv_bytes = ts * hw * dh * itemsize * 2  # k, v
    q_bytes = hw * dh * itemsize * 2  # q + out
    total = score_bytes + kv_bytes + q_bytes
    if bwd:
        total += (
            hw * dh * itemsize * 2  # g + dq
            + ts * hw * dh * 4 * 2  # f32 dK/dV slab accumulators
            + ts * hw * dh * itemsize * 2  # slab output blocks
            + rows_q * rows_k * 4 * 2  # dp + dscores
            + rows_q * rows_k * itemsize * 2  # ds_lo/at_lo casts
        )
    return total <= _VMEM_BUDGET_BYTES


def _band_candidates(height: int, width: int, eh: int, min_m: int = 128):
    """qt preference order: narrowest band whose M dim is at least
    `min_m` MXU stream rows, wider full-M bands, then the unbanded whole
    frame. Measured on v5e (benchmarks/band_ab.py, 16x16 e=(3,1,1)
    bf16): with the fused exp*mask softmax the FORWARD prefers qt=4
    (M=64, 45.7 us) over qt=8 (59.0 us) — the executed-flop/VPU cut
    beats the shorter MXU stream — so forward callers pass min_m=64;
    the BACKWARD (more MXU passes per tile) keeps qt=8/M=128 (88.6 vs
    114.0 us at qt=4), the default. At the as-trained 8x8 grid every
    banded variant was measured worse than unbanded (M <= 32); min_m
    filters those out. Bands that cover the whole height anyway
    (qt + 2eh >= height) save no flops and are excluded too."""
    return [
        qt for qt in (2, 4, 8, 16, 32, 64)
        if qt + 2 * eh < height and height % qt == 0 and qt * width >= min_m
    ] + [height]


def pick_frame_band(
    seq: int, height: int, width: int, extents: Tuple[int, int, int],
    dh: int, bwd: bool = False, itemsize: int = 4,
) -> int | None:
    """Query row band for the per-frame grid kernels, or None if even the
    narrowest band exceeds VMEM (callers then try the H-tiled variant)."""
    for qt in _band_candidates(height, width, extents[1]):
        if fits_vmem(seq, height, width, extents, dh, qt, bwd, itemsize):
            return qt
    return None


def pick_h_tile(
    seq: int, height: int, width: int, extents: Tuple[int, int, int], dh: int
):
    """Choose the query-row tile TH for the H-tiled kernel, or None.

    The tiled kernel covers a query tile's (TH + 2*eh)-row key window with
    TWO TH-row slabs per frame offset (the overlapping-block trick needs
    TH >= 2*eh), so valid tiles satisfy TH >= 2*eh and H % TH == 0. The
    smallest fitting tile wins — smaller tiles waste less masked compute.
    """
    es, eh, ew = extents
    ts = 2 * es + 1
    for th in (4, 8, 16, 32):
        if th < 2 * eh or th >= height or height % th:
            continue
        rows_q = th * width
        rows_k = ts * 2 * th * width
        score_bytes = rows_q * rows_k * 4 * 2
        kv_bytes = rows_k * dh * 4 * 4
        q_bytes = rows_q * dh * 4 * 4
        if score_bytes + kv_bytes + q_bytes <= _VMEM_BUDGET_BYTES:
            return th
    return None


def kernel_supported(
    seq: int, height: int, width: int, extents: Tuple[int, int, int], dh: int
) -> bool:
    """True when some Pallas path applies in BOTH directions: a (possibly
    banded) per-frame grid, the split backward, or the H-tiled variant.
    (The all-frames route implies the per-frame one — its working set is
    strictly larger.)"""
    tiled = pick_h_tile(seq, height, width, extents, dh) is not None
    fwd_ok = tiled or (
        pick_frame_band(seq, height, width, extents, dh) is not None
    )
    bwd_ok = (
        tiled
        or pick_frame_band(seq, height, width, extents, dh, bwd=True)
        is not None
        or pick_split_bands(seq, height, width, extents, dh) is not None
    )
    return fwd_ok and bwd_ok


def _attn_kernel(
    *refs, seq: int, height: int, width: int,
    extents: Tuple[int, int, int], dh: int, qt: int
):
    es, eh, ew = extents
    ts = 2 * es + 1
    s = pl.program_id(1)  # traced — _mask_band only uses it arithmetically

    q_ref = refs[0]
    k_refs = refs[1 : 1 + ts]
    v_refs = refs[1 + ts : 1 + 2 * ts]
    o_ref = refs[1 + 2 * ts]

    scale = dh**-0.5
    # operands stay in their input dtype (bf16 on the hot path — the MXU
    # multiplies bf16 natively; upcasting first would force slow f32
    # passes); accumulation is f32 via preferred_element_type. Query row
    # tiles dot only their clamped ±eh key band (see _attn_kernel_allframes).
    for h0 in range(0, height, qt):
        lo, hi = _band_bounds(height, eh, h0, qt)
        q = q_ref[0, 0, h0 * width : (h0 + qt) * width]  # (qt*W, dh)
        k = jnp.concatenate(
            [r[0, 0, lo * width : hi * width] for r in k_refs], axis=0
        )  # (Ts*band*W, dh)
        v = jnp.concatenate(
            [r[0, 0, lo * width : hi * width] for r in v_refs], axis=0
        )
        scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        ok = _mask_band(seq, height, width, extents, s, h0, qt, lo, hi)
        scores = jnp.where(ok, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        attn = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, 0, h0 * width : (h0 + qt) * width] = jnp.dot(
            attn.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _fwd_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    extents: Tuple[int, int, int],
    heads: int,
    interpret: bool,
    qt: int | None = None,
) -> jnp.ndarray:
    es, eh, ew = extents
    b, s, h, w, inner = q.shape
    dh = inner // heads
    hw = h * w
    ts = 2 * es + 1

    def to_zs(t):
        # (B, S, H, W, heads*dh) -> (B*heads, S, HW, dh)
        t = t.reshape(b, s, hw, heads, dh)
        return t.transpose(0, 3, 1, 2, 4).reshape(b * heads, s, hw, dh)

    qz, kz, vz = to_zs(q), to_zs(k), to_zs(v)
    # zero-pad the frame axis so offset ds reads padded frame s + ds
    kz = jnp.pad(kz, ((0, 0), (es, es), (0, 0), (0, 0)))
    vz = jnp.pad(vz, ((0, 0), (es, es), (0, 0), (0, 0)))

    def frame_spec(ds):
        # overlapping stride-1 windows: one (1, 1, HW, dh) block per offset;
        # block index == element index because the frame-dim block size is 1
        return pl.BlockSpec(
            (1, 1, hw, dh),
            lambda z, i, ds=ds: (z, i + ds, 0, 0),
            memory_space=pltpu.VMEM,
        )

    q_spec = pl.BlockSpec(
        (1, 1, hw, dh), lambda z, i: (z, i, 0, 0), memory_space=pltpu.VMEM
    )

    qt = h if qt is None else qt
    band = min(h, qt + 2 * extents[1])
    kernel = functools.partial(
        _attn_kernel, seq=s, height=h, width=w, extents=extents, dh=dh,
        qt=qt,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b * heads, s),
        in_specs=[q_spec]
        + [frame_spec(ds) for ds in range(ts)]
        + [frame_spec(ds) for ds in range(ts)],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b * heads, s, hw, dh), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * s * hw * ts * band * w * dh,
            bytes_accessed=4 * b * heads * s * hw * dh * 4,
            transcendentals=b * heads * s * hw * ts * band * w,
        ),
    )(qz, *([kz] * ts), *([vz] * ts))

    return (
        out.reshape(b, heads, s, hw, dh)
        .transpose(0, 2, 3, 1, 4)
        .reshape(b, s, h, w, inner)
    )


# ---------------------------------------------------------------------------
# All-frames variant (small-S shapes: one program per (batch, head))
# ---------------------------------------------------------------------------
#
# At the flagship model-#3 shape (S=6, 16x16) the per-(z, frame) grid is
# launch-bound: 48 programs for ~0.13 ms of compute. When the WHOLE clip's
# working set fits VMEM, one program per (batch*head) processes every frame
# in an unrolled loop — 8 programs instead of 48 — and the backward
# accumulates dK/dV across frames directly in VMEM (each program owns its
# whole clip), eliminating the host-side diagonal fold entirely.


def fits_vmem_allframes(
    seq: int,
    height: int,
    width: int,
    extents: Tuple[int, int, int],
    dh: int,
    itemsize: int = 4,
    qt: int | None = None,
) -> bool:
    """Forward all-frames working set: q + out + padded k/v + one query
    tile's score intermediates. Operands are sized at their dtype
    (`itemsize` — 2 for the bf16 hot path); score intermediates are always
    f32. `qt` is the query row band (None = whole frame): banding shrinks
    the live score tile from (HW, Ts*HW) to (qt*W, Ts*(qt+2eh)*W)."""
    hw = height * width
    es, eh, _ = extents
    ts = 2 * es + 1
    qt = height if qt is None else qt
    rows_q = qt * width
    rows_k = ts * min(height, qt + 2 * eh) * width
    qkv = (seq * hw * dh + 2 * (seq + 2 * es) * hw * dh) * itemsize
    out = seq * hw * dh * itemsize
    score = rows_q * rows_k * 4 * 2
    return qkv + out + score <= _VMEM_BUDGET_BYTES


def fits_vmem_allframes_bwd(
    seq: int,
    height: int,
    width: int,
    extents: Tuple[int, int, int],
    dh: int,
    itemsize: int = 4,
    qt: int | None = None,
) -> bool:
    """Backward adds g + dq + two f32 dK/dV accumulators over padded
    frames — a substantially larger working set than the forward. q/g/dq
    and k/v are sized at the operand dtype; the dK/dV accumulators are
    always f32 (4 bytes).

    The per-tile temporaries are counted too: scores/p, dp, dscores
    ((qt*W, Ts*band*W) f32), their low-precision casts ds_lo/at_lo, and
    the dk_f/dv_f window blocks. Omitting them admitted the b64 m3 shape
    whose true Mosaic stack was 17.3 MB against the 16 MB scoped-VMEM
    limit (compile-time OOM in the train_b64 ledger section). Banding
    (`qt` < height) shrinks exactly these temporaries — it is what lets
    the flagship S=6 16x16 bf16 shape run the all-frames backward at all."""
    hw = height * width
    es, eh, _ = extents
    ts = 2 * es + 1
    pad = seq + 2 * es
    qt = height if qt is None else qt
    rows_q = qt * width
    band = min(height, qt + 2 * eh)
    rows_k = ts * band * width
    per_clip = seq * hw * dh * itemsize  # one of q / g / dq
    per_pad = pad * hw * dh * itemsize  # one of k / v
    per_pad_acc = pad * hw * dh * 4  # one of dk / dv (f32 accumulators)
    score = rows_q * rows_k * 4  # one score-tile f32 intermediate
    score_lo = rows_q * rows_k * itemsize  # one low-precision cast of it
    dkv_f = ts * band * width * dh * 4  # one per-tile dK/dV window block
    return (
        3 * per_clip
        + 2 * per_pad
        + 2 * per_pad_acc
        + 4 * score  # scores/p, dp, dscores (+1 headroom for attn)
        + 2 * score_lo  # ds_lo, at_lo
        + 2 * dkv_f
        <= _VMEM_BUDGET_BYTES
    )


def pick_allframes_band(
    seq: int,
    height: int,
    width: int,
    extents: Tuple[int, int, int],
    dh: int,
    itemsize: int = 4,
    bwd: bool = False,
) -> int | None:
    """Choose the all-frames query row band, or None if no variant fits.

    Every query at (h, w) only attends to key rows within ±eh, so dotting
    a qt-row query tile against the clamped [h0-eh, h0+qt+eh) key band
    skips most of the masked-dense waste the roofline analysis measured
    (28.4x executed flops at 16x16 e=(3,1,1) full-frame; ~7x at qt=4
    with static offset skipping). Preference order per
    `_band_candidates` — the forward admits narrower bands (M >= 64)
    than the backward (M >= 128), per the band_ab measurements. Returns
    the winning qt (== height means unbanded).

    The kernels statically unroll seq * ceil(H/qt) tiles; Mosaic's stack
    allocator does not fully reuse per-tile temporaries across the
    unroll, so the true scoped-VMEM footprint grows with tile count in a
    way the analytic fits model cannot see. Measured on v5e: the m3
    shape (s=6, <=24 tiles) compiles at a modeled ~9.5 MB, while
    s=32/qt=4 (128 tiles, modeled 9.5 MB) demands 29.7 MB of scoped
    VMEM and OOMs at compile time. `_MAX_ALLFRAMES_TILES` caps the
    unroll at the measured-safe range; larger volumes route to the
    per-frame / H-tiled kernels, whose grids iterate instead of
    unrolling."""
    fits = fits_vmem_allframes_bwd if bwd else fits_vmem_allframes
    for qt in _band_candidates(
        height, width, extents[1], min_m=128 if bwd else 64
    ):
        tiles = seq * -(-height // qt)
        if tiles > _MAX_ALLFRAMES_TILES:
            continue
        if fits(seq, height, width, extents, dh, itemsize, qt):
            return qt
    return None


def _band_bounds(height: int, eh: int, h0: int, qt: int):
    """Clamped key row band [lo, hi) serving query rows [h0, h0+qt)."""
    return max(0, h0 - eh), min(height, h0 + qt + eh)


def pick_allframes_wt(height, width, extents, qt) -> int | None:
    """Column band for the all-frames kernels — measured NEGATIVE
    verdict, never routed (None = full width).

    In principle a wt-column query tile dots only its clamped
    [w0-ew, w0+wt+ew) key columns, cutting executed flops by
    ~(wt+2ew)/W on top of the row band. In practice the column slice of
    the loaded key band ((nj, nrow, W, dh)[:, :, cl:ch]) leaves the
    second-minor dim at wt+2ew — not a sublane multiple at any wt that
    divides these widths — so every tile pays a full relayout of its
    key/value block. Measured on v5e (benchmarks/band_ab.py, m3 16x16
    e=(3,1,1)): fwd qt=8 wt=8 79-112 us and qt=8 wt=4 315-510 us vs
    45.7 us for the routed row-banded qt=4 — 2-11x WORSE at every
    measured (qt, wt). The kernels keep the wt parameter (parity-tested,
    tests/test_kernels.py::test_allframes_colband_fwd_bwd_parity) for
    future shapes where wt+2ew lands on a sublane multiple; the router
    never selects it."""
    return None


def _mask_band(seq, height, width, extents, f, h0, qt, lo, hi):
    """(qt*W, Ts*band*W) bool valid-mask for the query row tile [h0,
    h0+qt) of frame f against the key row band [lo, hi). All indices are
    Python ints (static unroll), so the whole mask constant-folds."""
    es, eh, ew = extents
    ts = 2 * es + 1
    bw = (hi - lo) * width
    rows_q = qt * width
    qi = jax.lax.broadcasted_iota(jnp.int32, (rows_q, ts * bw), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (rows_q, ts * bw), 1)
    hq = h0 + qi // width
    wq = qi % width
    ds = kj // bw
    rem = kj % bw
    hk = lo + rem // width
    wk = rem % width
    frame = f + ds - es
    return (
        (jnp.abs(hq - hk) <= eh)
        & (jnp.abs(wq - wk) <= ew)
        & (frame >= 0)
        & (frame < seq)
    )


def _mask_tile(extents, h0, qt, w0, wt, lo, hi, cl, ch, nj, width):
    """(qt*wt, nj*nrow*ncol) bool valid-mask for the dual-axis query tile
    rows [h0, h0+qt) x cols [w0, w0+wt) against the key band rows
    [lo, hi) x cols [cl, ch) over nj statically-valid temporal offsets.

    Unlike `_mask_band` there is no frame-validity term: the all-frames
    kernels skip zero-pad temporal offsets in their static unroll, so
    every offset reaching the MXU is a real frame. All indices are Python
    ints, so the mask constant-folds."""
    eh, ew = extents[1], extents[2]
    nrow, ncol = hi - lo, ch - cl
    rows_q = qt * wt
    cols_k = nj * nrow * ncol
    qi = jax.lax.broadcasted_iota(jnp.int32, (rows_q, cols_k), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (rows_q, cols_k), 1)
    hq = h0 + qi // wt
    wq = w0 + qi % wt
    rem = kj % (nrow * ncol)
    hk = lo + rem // ncol
    wk = cl + rem % ncol
    return (jnp.abs(hq - hk) <= eh) & (jnp.abs(wq - wk) <= ew)


def _valid_offsets(seq, es, f):
    """Static temporal-offset range [j0, j1) whose padded key frames
    f + j hold REAL frames (f + j - es in [0, seq)): the zero-pad
    offsets outside it are skipped entirely instead of masked — at
    S=6 es=3 that is 30 of 42 (f, offset) pairs executed (1.4x fewer
    flops, exps and mask lanes than the masked-dense unroll)."""
    return max(0, es - f), min(2 * es + 1, es - f + seq)


def _attn_kernel_allframes(
    *refs, seq: int, height: int, width: int,
    extents: Tuple[int, int, int], dh: int, qt: int, wt: int | None = None
):
    es, eh, ew = extents
    q_ref, k_ref, v_ref, o_ref = refs
    wt = width if wt is None else wt

    scale = dh**-0.5
    # static triple unroll: S, H/qt and W/wt are small here by
    # construction. Each query tile dots only its statically-valid
    # temporal offsets and its clamped key row band x column band — the
    # executed-flop levers from the roofline analysis (masked-dense waste
    # 28.4x full-frame -> 16x row-banded qt=8 -> ~6.4x with offset
    # skipping + wt=8 column bands at 16x16 e=(3,1,1)).
    for f in range(seq):
        j0, j1 = _valid_offsets(seq, es, f)
        nj = j1 - j0
        for h0 in range(0, height, qt):
            lo, hi = _band_bounds(height, eh, h0, qt)
            nrow = hi - lo
            kband = k_ref[0, f + j0 : f + j1, lo * width : hi * width]
            vband = v_ref[0, f + j0 : f + j1, lo * width : hi * width]
            qrows = q_ref[0, f, h0 * width : (h0 + qt) * width]

            def tile(q, kk, vv, ok):
                scores = (
                    jnp.dot(q, kk.T, preferred_element_type=jnp.float32)
                    * scale
                )
                # fewer full-matrix VPU passes than the classic
                # where/max/exp/div chain: ONE fused FMA folds the mask
                # into the scores (masked keys pushed to -1e9, so the max
                # is over VALID entries and exp(masked - m) is exactly 0 —
                # a raw-score max could underflow every valid probability
                # when a garbage out-of-extent key dominates by >88, giving
                # 0/0 NaN), then exp, with the normalization moved to the
                # small (M, dh) output of the PV dot. The executed score
                # matrix is the kernel's VPU bottleneck at small dh, so
                # each saved pass is worth ~10% of the op.
                adj = scores - (1.0 - ok.astype(jnp.float32)) * 1e9
                m = jnp.max(adj, axis=-1, keepdims=True)
                p = jnp.exp(adj - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                return (
                    jnp.dot(
                        p.astype(vv.dtype), vv,
                        preferred_element_type=jnp.float32,
                    )
                    / l
                )

            if wt >= width:
                ok = _mask_tile(
                    extents, h0, qt, 0, width, lo, hi, 0, width, nj, width
                )
                out = tile(
                    qrows,
                    kband.reshape(nj * nrow * width, dh),
                    vband.reshape(nj * nrow * width, dh),
                    ok,
                )
            else:
                q4 = qrows.reshape(qt, width, dh)
                k4 = kband.reshape(nj, nrow, width, dh)
                v4 = vband.reshape(nj, nrow, width, dh)
                outs = []
                for w0 in range(0, width, wt):
                    cl, ch = max(0, w0 - ew), min(width, w0 + wt + ew)
                    ncol = ch - cl
                    ok = _mask_tile(
                        extents, h0, qt, w0, wt, lo, hi, cl, ch, nj, width
                    )
                    o = tile(
                        q4[:, w0 : w0 + wt].reshape(qt * wt, dh),
                        k4[:, :, cl:ch].reshape(nj * nrow * ncol, dh),
                        v4[:, :, cl:ch].reshape(nj * nrow * ncol, dh),
                        ok,
                    )
                    outs.append(o.reshape(qt, wt, dh))
                out = jnp.concatenate(outs, axis=1).reshape(
                    qt * width, dh
                )
            o_ref[0, f, h0 * width : (h0 + qt) * width] = out.astype(
                o_ref.dtype
            )


def _fwd_impl_allframes(q, k, v, extents, heads, interpret, qt=None,
                        wt=None):
    es, eh, ew = extents
    b, s, h, w, inner = q.shape
    dh = inner // heads
    hw = h * w

    def to_zs(t):
        t = t.reshape(b, s, hw, heads, dh)
        return t.transpose(0, 3, 1, 2, 4).reshape(b * heads, s, hw, dh)

    qz = to_zs(q)
    kz = jnp.pad(to_zs(k), ((0, 0), (es, es), (0, 0), (0, 0)))
    vz = jnp.pad(to_zs(v), ((0, 0), (es, es), (0, 0), (0, 0)))

    q_spec = pl.BlockSpec(
        (1, s, hw, dh), lambda z: (z, 0, 0, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, s + 2 * es, hw, dh), lambda z: (z, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    qt = h if qt is None else qt
    kernel = functools.partial(
        _attn_kernel_allframes, seq=s, height=h, width=w,
        extents=extents, dh=dh, qt=qt, wt=wt,
    )
    band = min(h, qt + 2 * extents[1])
    cband = min(w, (wt or w) + 2 * extents[2])
    navg = min(s, 2 * es + 1)  # statically-valid offsets per frame (avg<=)
    out = pl.pallas_call(
        kernel,
        grid=(b * heads,),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b * heads, s, hw, dh), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * s * hw * navg * band * cband * dh,
            bytes_accessed=4 * b * heads * s * hw * dh * 4,
            transcendentals=b * heads * s * hw * navg * band * cband,
        ),
    )(qz, kz, vz)
    return (
        out.reshape(b, heads, s, hw, dh)
        .transpose(0, 2, 3, 1, 4)
        .reshape(b, s, h, w, inner)
    )


def _band_add(acc, contrib, start):
    """acc[start:start+n] += contrib via static-slice concatenation.

    Mosaic has no dynamic_slice lowering and jnp's `.at[].add` traces to
    one even with Python-int indices, so the banded update is expressed as
    slice / add / re-concatenate with all-static bounds."""
    n = contrib.shape[0]
    total = acc.shape[0]
    if n == total:
        return acc + contrib
    parts = []
    if start > 0:
        parts.append(acc[:start])
    parts.append(acc[start : start + n] + contrib)
    if start + n < total:
        parts.append(acc[start + n :])
    return jnp.concatenate(parts, axis=0)


def _band_add_ax2(acc, contrib, start):
    """acc[:, :, start:start+n] += contrib — `_band_add` on axis 2, for
    folding a column-banded dK/dV tile (nj, nrow, ncol, dh) into the
    full-width (nj, nrow, W, dh) accumulator. Column tiles OVERLAP by
    2*ew, so this must add, not concatenate tiles side by side."""
    n = contrib.shape[2]
    total = acc.shape[2]
    if n == total:
        return acc + contrib
    parts = []
    if start > 0:
        parts.append(acc[:, :, :start])
    parts.append(acc[:, :, start : start + n] + contrib)
    if start + n < total:
        parts.append(acc[:, :, start + n :])
    return jnp.concatenate(parts, axis=2)


def _bwd_kernel_allframes(
    *refs, seq: int, height: int, width: int,
    extents: Tuple[int, int, int], dh: int, qt: int, wt: int | None = None
):
    es, eh, ew = extents
    hw = height * width
    q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref = refs
    wt = width if wt is None else wt

    scale = dh**-0.5
    # per-padded-frame f32 accumulator rows. A whole-tensor zero-pad + add
    # per query frame (the previous formulation) kept `seq` live
    # (S+2es, HW, dh) temporaries on the Mosaic stack — 17.3 MB at the b64
    # m3 shape, over the 16 MB scoped-VMEM limit. Row-granular static
    # updates touch only the rows a frame actually contributes to.
    npf = seq + 2 * es
    dk_rows = [jnp.zeros((hw, dh), jnp.float32) for _ in range(npf)]
    dv_rows = [jnp.zeros((hw, dh), jnp.float32) for _ in range(npf)]
    for f in range(seq):
        j0, j1 = _valid_offsets(seq, es, f)
        nj = j1 - j0
        for h0 in range(0, height, qt):
            lo, hi = _band_bounds(height, eh, h0, qt)
            nrow = hi - lo
            qrows = q_ref[0, f, h0 * width : (h0 + qt) * width]
            grows = g_ref[0, f, h0 * width : (h0 + qt) * width]
            kband = k_ref[0, f + j0 : f + j1, lo * width : hi * width]
            vband = v_ref[0, f + j0 : f + j1, lo * width : hi * width]

            def tile(q, g, kk, vv, ok):
                scores = (
                    jnp.dot(q, kk.T, preferred_element_type=jnp.float32)
                    * scale
                )
                # fused mask-FMA + valid-max (see the forward kernel's
                # underflow-safety note)
                adj = scores - (1.0 - ok.astype(jnp.float32)) * 1e9
                m = jnp.max(adj, axis=-1, keepdims=True)
                p = jnp.exp(adj - m)
                attn = p / jnp.sum(p, axis=-1, keepdims=True)

                dp = jnp.dot(g, vv.T, preferred_element_type=jnp.float32)
                row = jnp.sum(dp * attn, axis=-1, keepdims=True)
                dscores = attn * (dp - row)
                ds_lo = dscores.astype(q.dtype)
                at_lo = attn.astype(g.dtype)

                dq = (
                    jnp.dot(ds_lo, kk, preferred_element_type=jnp.float32)
                    * scale
                )
                dk = (
                    jnp.dot(ds_lo.T, q, preferred_element_type=jnp.float32)
                    * scale
                )
                dv = jnp.dot(
                    at_lo.T, g, preferred_element_type=jnp.float32
                )
                return dq, dk, dv

            if wt >= width:
                ok = _mask_tile(
                    extents, h0, qt, 0, width, lo, hi, 0, width, nj, width
                )
                dq, dkb, dvb = tile(
                    qrows, grows,
                    kband.reshape(nj * nrow * width, dh),
                    vband.reshape(nj * nrow * width, dh),
                    ok,
                )
                dk_f = dkb.reshape(nj, nrow * width, dh)
                dv_f = dvb.reshape(nj, nrow * width, dh)
            else:
                q4 = qrows.reshape(qt, width, dh)
                g4 = grows.reshape(qt, width, dh)
                k4 = kband.reshape(nj, nrow, width, dh)
                v4 = vband.reshape(nj, nrow, width, dh)
                dqs = []
                dk_acc = jnp.zeros((nj, nrow, width, dh), jnp.float32)
                dv_acc = jnp.zeros((nj, nrow, width, dh), jnp.float32)
                for w0 in range(0, width, wt):
                    cl, ch = max(0, w0 - ew), min(width, w0 + wt + ew)
                    ncol = ch - cl
                    ok = _mask_tile(
                        extents, h0, qt, w0, wt, lo, hi, cl, ch, nj, width
                    )
                    dqt, dkt, dvt = tile(
                        q4[:, w0 : w0 + wt].reshape(qt * wt, dh),
                        g4[:, w0 : w0 + wt].reshape(qt * wt, dh),
                        k4[:, :, cl:ch].reshape(nj * nrow * ncol, dh),
                        v4[:, :, cl:ch].reshape(nj * nrow * ncol, dh),
                        ok,
                    )
                    dqs.append(dqt.reshape(qt, wt, dh))
                    dk_acc = _band_add_ax2(
                        dk_acc, dkt.reshape(nj, nrow, ncol, dh), cl
                    )
                    dv_acc = _band_add_ax2(
                        dv_acc, dvt.reshape(nj, nrow, ncol, dh), cl
                    )
                dq = jnp.concatenate(dqs, axis=1).reshape(qt * width, dh)
                dk_f = dk_acc.reshape(nj, nrow * width, dh)
                dv_f = dv_acc.reshape(nj, nrow * width, dh)
            dq_ref[0, f, h0 * width : (h0 + qt) * width] = dq.astype(
                dq_ref.dtype
            )
            # each program owns the whole clip: accumulate straight onto
            # the padded key frames (no cross-program races, no host-side
            # fold); banded tiles land on their [lo, hi) row slice, and
            # only statically-valid offsets contribute at all.
            for j in range(nj):
                dk_rows[f + j0 + j] = _band_add(
                    dk_rows[f + j0 + j], dk_f[j], lo * width
                )
                dv_rows[f + j0 + j] = _band_add(
                    dv_rows[f + j0 + j], dv_f[j], lo * width
                )
    dk_ref[0] = jnp.stack(dk_rows).astype(dk_ref.dtype)
    dv_ref[0] = jnp.stack(dv_rows).astype(dv_ref.dtype)


def _bwd_impl_allframes(q, k, v, g, extents, heads, interpret, qt=None,
                        wt=None):
    es, eh, ew = extents
    b, s, h, w, inner = q.shape
    dh = inner // heads
    hw = h * w

    def to_zs(t):
        t = t.reshape(b, s, hw, heads, dh)
        return t.transpose(0, 3, 1, 2, 4).reshape(b * heads, s, hw, dh)

    qz, gz = to_zs(q), to_zs(g)
    kz = jnp.pad(to_zs(k), ((0, 0), (es, es), (0, 0), (0, 0)))
    vz = jnp.pad(to_zs(v), ((0, 0), (es, es), (0, 0), (0, 0)))

    q_spec = pl.BlockSpec(
        (1, s, hw, dh), lambda z: (z, 0, 0, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, s + 2 * es, hw, dh), lambda z: (z, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    qt = h if qt is None else qt
    kernel = functools.partial(
        _bwd_kernel_allframes, seq=s, height=h, width=w,
        extents=extents, dh=dh, qt=qt, wt=wt,
    )
    dq, dk_p, dv_p = pl.pallas_call(
        kernel,
        grid=(b * heads,),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec],
        out_specs=[q_spec, kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b * heads, s, hw, dh), q.dtype),
            # fully accumulated on-kernel (f32 rows), so storing at the
            # operand dtype adds no error beyond the final cast below
            jax.ShapeDtypeStruct(
                (b * heads, s + 2 * es, hw, dh), _part_dtype(q)
            ),
            jax.ShapeDtypeStruct(
                (b * heads, s + 2 * es, hw, dh), _part_dtype(q)
            ),
        ],
        interpret=interpret,
    )(qz, kz, vz, gz)

    # un-pad: padded frame index f covers true frame f - es
    dkz = dk_p[:, es : es + s].astype(k.dtype)
    dvz = dv_p[:, es : es + s].astype(v.dtype)

    def from_zs(t):
        return (
            t.reshape(b, heads, s, hw, dh)
            .transpose(0, 2, 3, 1, 4)
            .reshape(b, s, h, w, inner)
        )

    return from_zs(dq), from_zs(dkz), from_zs(dvz)


# ---------------------------------------------------------------------------
# H-tiled variant (32x32 grids and beyond — VERDICT r1 item 5)
# ---------------------------------------------------------------------------


def _tiled_masks_banded(
    seq, height, width, extents, th, s, iq
):
    """(TH*W, Ts*(TH+2eh)*W) bool valid-mask for query tile iq of frame s
    against the clamped key row band (the first TH+2eh padded rows of each
    offset's two-slab pair)."""
    es, eh, ew = extents
    ts = 2 * es + 1
    band = th + 2 * eh
    rows_q = th * width
    rows_k = ts * band * width
    qi = jax.lax.broadcasted_iota(jnp.int32, (rows_q, rows_k), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (rows_q, rows_k), 1)
    hq = iq * th + qi // width
    wq = qi % width
    slab = kj // (band * width)  # frame offset index
    within = kj % (band * width)
    hk = iq * th + within // width - eh  # absolute key row
    wk = within % width
    frame = s + slab - es
    return (
        (jnp.abs(hq - hk) <= eh)
        & (jnp.abs(wq - wk) <= ew)
        & (hk >= 0)
        & (hk < height)
        & (frame >= 0)
        & (frame < seq)
    )


def _attn_kernel_tiled(
    *refs, seq: int, height: int, width: int,
    extents: Tuple[int, int, int], dh: int, th: int
):
    es, eh, ew = extents
    ts = 2 * es + 1
    s = pl.program_id(1)
    iq = pl.program_id(2)
    rows_q = th * width
    band = th + 2 * eh  # key rows actually attended per frame offset

    q_ref = refs[0]
    k_refs = refs[1 : 1 + 2 * ts]
    v_refs = refs[1 + 2 * ts : 1 + 4 * ts]
    o_ref = refs[1 + 4 * ts]

    q = q_ref[0, 0].reshape(rows_q, dh)  # input dtype; f32 accumulate below

    def banded(slab_refs):
        # the queries of tile iq (padded rows [iq*th+eh, (iq+1)*th+eh))
        # reach only padded rows [iq*th, iq*th + th + 2eh) — the first
        # `band` rows of the offset's two loaded TH-row slabs; dotting
        # beyond that is pure masked waste
        parts = []
        for ds in range(ts):
            pair = jnp.concatenate(
                [
                    slab_refs[2 * ds][0, 0].reshape(rows_q, dh),
                    slab_refs[2 * ds + 1][0, 0].reshape(rows_q, dh),
                ],
                axis=0,
            )
            parts.append(pair[: band * width])
        return jnp.concatenate(parts, axis=0)  # (Ts*band*W, dh)

    k = banded(k_refs)
    v = banded(v_refs)

    scale = dh**-0.5
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    ok = _tiled_masks_banded(seq, height, width, extents, th, s, iq)
    scores = jnp.where(ok, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    attn = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0, 0] = (
        jnp.dot(attn.astype(v.dtype), v, preferred_element_type=jnp.float32)
        .reshape(th, width, dh)
        .astype(o_ref.dtype)
    )


def _tiled_layout(q, k, v, extents, heads, th):
    """Reshape to (Z, S, H, W, dh) per head and pad S by es, H to H+TH
    (low pad eh so padded row = true row + eh; high pad TH-eh so the last
    query tile's second slab exists)."""
    es, eh, ew = extents
    b, s, h, w, inner = q.shape
    dh = inner // heads

    def to_z(t):
        t = t.reshape(b, s, h, w, heads, dh)
        return t.transpose(0, 4, 1, 2, 3, 5).reshape(b * heads, s, h, w, dh)

    qz, kz, vz = to_z(q), to_z(k), to_z(v)
    pad = ((0, 0), (es, es), (eh, th - eh), (0, 0), (0, 0))
    return qz, jnp.pad(kz, pad), jnp.pad(vz, pad), dh


def _fwd_impl_tiled(q, k, v, extents, heads, interpret, th):
    es, eh, ew = extents
    b, s, h, w, inner = q.shape
    ts = 2 * es + 1
    nq = h // th
    qz, kz_p, vz_p, dh = _tiled_layout(q, k, v, extents, heads, th)
    z = b * heads

    def slab_spec(ds, j):
        return pl.BlockSpec(
            (1, 1, th, w, dh),
            lambda zz, ss, iq, ds=ds, j=j: (zz, ss + ds, iq + j, 0, 0),
            memory_space=pltpu.VMEM,
        )

    q_spec = pl.BlockSpec(
        (1, 1, th, w, dh),
        lambda zz, ss, iq: (zz, ss, iq, 0, 0),
        memory_space=pltpu.VMEM,
    )

    kernel = functools.partial(
        _attn_kernel_tiled, seq=s, height=h, width=w,
        extents=extents, dh=dh, th=th,
    )
    slabs = [(ds, j) for ds in range(ts) for j in range(2)]
    out = pl.pallas_call(
        kernel,
        grid=(z, s, nq),
        in_specs=[q_spec]
        + [slab_spec(ds, j) for ds, j in slabs]
        + [slab_spec(ds, j) for ds, j in slabs],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((z, s, h, w, dh), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * z * s * h * w * ts * (th + 2 * eh) * w * dh,
            bytes_accessed=4 * z * s * h * w * dh * 4,
            transcendentals=z * s * h * w * ts * (th + 2 * eh) * w,
        ),
    )(qz, *([kz_p] * len(slabs)), *([vz_p] * len(slabs)))

    return (
        out.reshape(b, heads, s, h, w, dh)
        .transpose(0, 2, 3, 4, 1, 5)
        .reshape(b, s, h, w, inner)
    )


def _bwd_kernel_tiled(
    *refs, seq: int, height: int, width: int,
    extents: Tuple[int, int, int], dh: int, th: int
):
    es, eh, ew = extents
    ts = 2 * es + 1
    s = pl.program_id(1)
    iq = pl.program_id(2)
    rows_q = th * width
    band = th + 2 * eh  # key rows actually attended per frame offset

    q_ref = refs[0]
    k_refs = refs[1 : 1 + 2 * ts]
    v_refs = refs[1 + 2 * ts : 1 + 4 * ts]
    g_ref = refs[1 + 4 * ts]
    dq_ref = refs[2 + 4 * ts]
    dk_ref = refs[3 + 4 * ts]
    dv_ref = refs[4 + 4 * ts]

    q = q_ref[0, 0].reshape(rows_q, dh)  # input dtype; f32 accumulate

    def banded(slab_refs):
        # same key-row banding as the forward (_attn_kernel_tiled): tile
        # iq's queries reach only the first TH+2eh padded rows of the
        # offset's two loaded TH-row slabs — scores, dscores, dK and dV
        # beyond that are pure masked waste (2TH/(TH+2eh)x executed-flop
        # cut on all four MXU passes)
        parts = []
        for ds in range(ts):
            pair = jnp.concatenate(
                [
                    slab_refs[2 * ds][0, 0].reshape(rows_q, dh),
                    slab_refs[2 * ds + 1][0, 0].reshape(rows_q, dh),
                ],
                axis=0,
            )
            parts.append(pair[: band * width])
        return jnp.concatenate(parts, axis=0)  # (Ts*band*W, dh)

    k = banded(k_refs)
    v = banded(v_refs)
    g = g_ref[0, 0].reshape(rows_q, dh)

    scale = dh**-0.5
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    ok = _tiled_masks_banded(seq, height, width, extents, th, s, iq)
    scores = jnp.where(ok, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    attn = p / jnp.sum(p, axis=-1, keepdims=True)

    dp = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
    row = jnp.sum(dp * attn, axis=-1, keepdims=True)
    dscores = attn * (dp - row)  # f32
    ds_lo = dscores.astype(q.dtype)  # bf16 operands for the MXU passes
    at_lo = attn.astype(g.dtype)

    dq_ref[0, 0] = (
        (jnp.dot(ds_lo, k, preferred_element_type=jnp.float32) * scale)
        .reshape(th, width, dh)
        .astype(dq_ref.dtype)
    )
    dk_cat = (
        jnp.dot(ds_lo.T, q, preferred_element_type=jnp.float32) * scale
    )  # (Ts*band*W, dh)
    dv_cat = jnp.dot(at_lo.T, g, preferred_element_type=jnp.float32)
    dk_ref[0, 0, 0] = dk_cat.reshape(ts, band * width, dh).astype(
        dk_ref.dtype
    )
    dv_ref[0, 0, 0] = dv_cat.reshape(ts, band * width, dh).astype(
        dv_ref.dtype
    )


def _bwd_impl_tiled(q, k, v, g, extents, heads, interpret, th):
    es, eh, ew = extents
    b, s, h, w, inner = q.shape
    ts = 2 * es + 1
    nq = h // th
    qz, kz_p, vz_p, dh = _tiled_layout(q, k, v, extents, heads, th)
    gz = _tiled_layout(g, g, g, extents, heads, th)[0]
    z = b * heads

    def slab_spec(ds, j):
        return pl.BlockSpec(
            (1, 1, th, w, dh),
            lambda zz, ss, iq, ds=ds, j=j: (zz, ss + ds, iq + j, 0, 0),
            memory_space=pltpu.VMEM,
        )

    q_spec = pl.BlockSpec(
        (1, 1, th, w, dh),
        lambda zz, ss, iq: (zz, ss, iq, 0, 0),
        memory_space=pltpu.VMEM,
    )
    band = th + 2 * eh
    part_spec = pl.BlockSpec(
        (1, 1, 1, ts, band * w, dh),
        lambda zz, ss, iq: (zz, ss, iq, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    kernel = functools.partial(
        _bwd_kernel_tiled, seq=s, height=h, width=w,
        extents=extents, dh=dh, th=th,
    )
    slabs = [(ds, j) for ds in range(ts) for j in range(2)]
    dq, dk_part, dv_part = pl.pallas_call(
        kernel,
        grid=(z, s, nq),
        in_specs=[q_spec]
        + [slab_spec(ds, j) for ds, j in slabs]
        + [slab_spec(ds, j) for ds, j in slabs]
        + [q_spec],
        out_specs=[q_spec, part_spec, part_spec],
        out_shape=[
            jax.ShapeDtypeStruct((z, s, h, w, dh), q.dtype),
            jax.ShapeDtypeStruct(
                (z, s, nq, ts, band * w, dh), _part_dtype(q)
            ),
            jax.ShapeDtypeStruct(
                (z, s, nq, ts, band * w, dh), _part_dtype(q)
            ),
        ],
        interpret=interpret,
    )(qz, *([kz_p] * len(slabs)), *([vz_p] * len(slabs)), gz)

    # fold the BANDED partial slabs back onto true (frame, row)
    # coordinates. part[z, sq, iq, ds] is the contribution to padded key
    # frame sq + ds (true frame sq + ds - es) at padded rows
    # iq*TH .. iq*TH + band (band = TH + 2eh; consecutive query tiles'
    # bands overlap by 2eh rows).
    def fold(part):
        part = part.reshape(z, s, nq, ts, band, w, dh)
        # frames: diagonal shift-sum identical to the untiled fold
        padded = jnp.pad(
            part, ((0, 0), (es, es)) + ((0, 0),) * 5
        )
        t_sum = jnp.zeros((z, s, nq, band, w, dh), jnp.float32)
        for ds in range(ts):
            t_sum = t_sum + padded[:, ds : ds + s, :, ts - 1 - ds]
        # rows: split each band into its TH-row head (landing at iq*TH,
        # contiguous across tiles) and its 2eh-row tail (landing at
        # (iq+1)*TH, zero-extended to TH rows so tiles stay contiguous) —
        # two vectorized adds instead of an nq-step scatter loop
        h_pad = jnp.zeros((z, s, h + th, w, dh), jnp.float32)
        head = t_sum[:, :, :, :th].reshape(z, s, nq * th, w, dh)
        h_pad = h_pad.at[:, :, : nq * th].add(head)
        tail = (
            jnp.zeros((z, s, nq, th, w, dh), jnp.float32)
            .at[:, :, :, : 2 * eh]
            .set(t_sum[:, :, :, th:])
            .reshape(z, s, nq * th, w, dh)
        )
        h_pad = h_pad.at[:, :, th : th + nq * th].add(tail)
        return h_pad[:, :, eh : eh + h]

    dkz = fold(dk_part).astype(k.dtype)
    dvz = fold(dv_part).astype(v.dtype)

    def from_z(t):
        return (
            t.reshape(b, heads, s, h, w, dh)
            .transpose(0, 2, 3, 4, 1, 5)
            .reshape(b, s, h, w, inner)
        )

    return from_z(dq), from_z(dkz), from_z(dvz)


# ---------------------------------------------------------------------------
# Split (flash-style) backward: query-centric dQ pass + key-centric dK/dV
# pass. Eliminates the partial dK/dV slabs and their host-side fold
# entirely — at the Sber 32x32 shape the H-tiled backward's partial
# write + fold read + per-tile slab refetches move ~1 GB of HBM per call
# (the measured 1.1 ms is within 20% of that traffic at the v5e's
# bandwidth), while the split moves ~0.3 GB. The price is recomputing the
# scores/dp dots in both passes (7 MXU passes vs 5), cheap at these
# memory-bound shapes. Standard flash-attention decomposition: pass 1
# saves each query row's softmax log-sum-exp and delta = rowsum(dP*P);
# pass 2 rebuilds attn = exp(scores - lse) per key tile.
# ---------------------------------------------------------------------------


def _bwd_kernel_dq(
    *refs, seq: int, height: int, width: int,
    extents: Tuple[int, int, int], dh: int, qt: int
):
    """dQ + per-query-row softmax stats (lse, delta), banded like
    `_bwd_kernel` but with no dK/dV work: 3 MXU passes, no slab outputs.
    Stats are stored as (rows, 1) blocks — the natural sublane layout of
    a lane-wise reduce; the impl re-lays them out for pass 2 in XLA."""
    es, eh, ew = extents
    ts = 2 * es + 1
    s = pl.program_id(1)

    q_ref = refs[0]
    k_refs = refs[1 : 1 + ts]
    v_refs = refs[1 + ts : 1 + 2 * ts]
    g_ref = refs[1 + 2 * ts]
    dq_ref = refs[2 + 2 * ts]
    lse_ref = refs[3 + 2 * ts]
    dl_ref = refs[4 + 2 * ts]

    scale = dh**-0.5
    for h0 in range(0, height, qt):
        lo, hi = _band_bounds(height, eh, h0, qt)
        q = q_ref[0, 0, h0 * width : (h0 + qt) * width]
        g = g_ref[0, 0, h0 * width : (h0 + qt) * width]
        k = jnp.concatenate(
            [r[0, 0, lo * width : hi * width] for r in k_refs], axis=0
        )
        v = jnp.concatenate(
            [r[0, 0, lo * width : hi * width] for r in v_refs], axis=0
        )
        scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        ok = _mask_band(seq, height, width, extents, s, h0, qt, lo, hi)
        scores = jnp.where(ok, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        attn = p / l

        dp = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
        row = jnp.sum(dp * attn, axis=-1, keepdims=True)
        dscores = attn * (dp - row)
        ds_lo = dscores.astype(q.dtype)

        sl = slice(h0 * width, (h0 + qt) * width)
        dq_ref[0, 0, sl] = (
            jnp.dot(ds_lo, k, preferred_element_type=jnp.float32) * scale
        ).astype(dq_ref.dtype)
        lse_ref[0, 0, sl] = m + jnp.log(l)
        dl_ref[0, 0, sl] = row


def _mask_dkv_t(seq, height, width, extents, f, k0, kt, j):
    """(kt*W, band*W) bool valid-mask, TRANSPOSED orientation (rows =
    keys of tile [k0, k0+kt) in frame f; cols = padded query rows
    [k0-eh, k0+kt+eh) of the frame at offset j-es). Transposing keeps
    the per-query stats on the lane axis, where broadcasting is free."""
    es, eh, ew = extents
    band = kt + 2 * eh
    rows_k = kt * width
    cols_q = band * width
    ki = jax.lax.broadcasted_iota(jnp.int32, (rows_k, cols_q), 0)
    qi = jax.lax.broadcasted_iota(jnp.int32, (rows_k, cols_q), 1)
    hk = k0 + ki // width
    wk = ki % width
    hq = k0 + qi // width - eh  # padded query row -> true row
    wq = qi % width
    fq = f + j - es
    return (
        (jnp.abs(hq - hk) <= eh)
        & (jnp.abs(wq - wk) <= ew)
        & (hq >= 0)
        & (hq < height)
        & (fq >= 0)
        & (fq < seq)
    )


def _bwd_kernel_dkv(
    *refs, seq: int, height: int, width: int,
    extents: Tuple[int, int, int], dh: int, kt: int
):
    """Key-centric dK/dV: one program owns key frame f; for each kt-row
    key tile it rebuilds attn from the saved lse against the ±eh query
    row band of each of the Ts frame offsets and accumulates exact dK/dV
    — no partial slabs, no fold. All dots run transposed (keys on
    sublanes) so lse/delta broadcast along lanes."""
    es, eh, ew = extents
    ts = 2 * es + 1
    f = pl.program_id(1)

    k_ref, v_ref = refs[0], refs[1]
    q_refs = refs[2 : 2 + ts]
    g_refs = refs[2 + ts : 2 + 2 * ts]
    lse_refs = refs[2 + 2 * ts : 2 + 3 * ts]
    dl_refs = refs[2 + 3 * ts : 2 + 4 * ts]
    dk_ref = refs[2 + 4 * ts]
    dv_ref = refs[3 + 4 * ts]

    scale = dh**-0.5
    band = kt + 2 * eh
    for k0 in range(0, height, kt):
        ksl = slice(k0 * width, (k0 + kt) * width)
        qsl = slice(k0 * width, (k0 + band) * width)  # padded rows
        k_t = k_ref[0, 0, ksl]
        v_t = v_ref[0, 0, ksl]
        dk_acc = jnp.zeros((kt * width, dh), jnp.float32)
        dv_acc = jnp.zeros((kt * width, dh), jnp.float32)
        for j in range(ts):
            qj = q_refs[j][0, 0, qsl]  # (band*W, dh), operand dtype
            gj = g_refs[j][0, 0, qsl]
            lse = lse_refs[j][0, 0, :, qsl]  # (1, band*W) f32, on lanes
            dlt = dl_refs[j][0, 0, :, qsl]
            scores_t = (
                jnp.dot(k_t, qj.T, preferred_element_type=jnp.float32)
                * scale
            )  # (kt*W, band*W)
            ok = _mask_dkv_t(seq, height, width, extents, f, k0, kt, j)
            p_t = jnp.exp(jnp.where(ok, scores_t - lse, NEG_INF))
            dp_t = jnp.dot(v_t, gj.T, preferred_element_type=jnp.float32)
            ds_t = p_t * (dp_t - dlt)
            dv_acc = dv_acc + jnp.dot(
                p_t.astype(gj.dtype), gj, preferred_element_type=jnp.float32
            )
            dk_acc = dk_acc + jnp.dot(
                ds_t.astype(qj.dtype), qj, preferred_element_type=jnp.float32
            )
        dk_ref[0, 0, ksl] = (dk_acc * scale).astype(dk_ref.dtype)
        dv_ref[0, 0, ksl] = dv_acc.astype(dv_ref.dtype)


def _fits_split_dq(seq, height, width, extents, dh, itemsize, qt):
    hw = height * width
    es, eh, _ = extents
    ts = 2 * es + 1
    rows_q = qt * width
    rows_k = ts * min(height, qt + 2 * eh) * width
    return (
        rows_q * rows_k * (4 * 4 + itemsize)  # scores/p/dp/dscores + cast
        + 2 * ts * hw * dh * itemsize  # k, v
        + 3 * hw * dh * itemsize  # q, g, dq
        + 2 * hw * 4  # lse, delta outputs
        <= _VMEM_BUDGET_BYTES
    )


def _fits_split_dkv(seq, height, width, extents, dh, itemsize, kt):
    hw = height * width
    es, eh, _ = extents
    ts = 2 * es + 1
    rows_p = (height + 2 * eh) * width
    rows_k = kt * width
    cols_q = (kt + 2 * eh) * width
    return (
        rows_k * cols_q * (4 * 4 + 2 * itemsize)  # scores/p/dp/ds + casts
        + 2 * ts * rows_p * dh * itemsize  # q, g padded frames
        + 2 * ts * rows_p * 4  # lse, delta padded frames
        + 4 * hw * dh * itemsize  # k, v, dk, dv
        + 2 * rows_k * dh * 4  # f32 dk/dv accumulators
        <= _VMEM_BUDGET_BYTES
    )


def pick_split_bands(
    seq: int, height: int, width: int, extents: Tuple[int, int, int],
    dh: int, itemsize: int = 4,
) -> Tuple[int, int] | None:
    """(qt, kt) for the split backward, or None if either pass exceeds
    VMEM at every band. Both passes keep `_band_candidates` narrow-first
    order (narrowest band whose M dim still fills the MXU sublane tile):
    measured on v5e (benchmarks/band_ab.py, bf16), kt=4 beats kt=8 at the
    Sber 32x32 shape (695 vs 829 us) — the narrower key tile's smaller
    score block outweighs the extra per-offset loop iterations."""
    qt = next(
        (
            c
            for c in _band_candidates(height, width, extents[1])
            if _fits_split_dq(seq, height, width, extents, dh, itemsize, c)
        ),
        None,
    )
    kt = next(
        (
            c
            for c in _band_candidates(height, width, extents[1])
            if _fits_split_dkv(seq, height, width, extents, dh, itemsize, c)
        ),
        None,
    )
    if qt is None or kt is None:
        return None
    return qt, kt


def _bwd_impl_split(
    q, k, v, g, extents, heads, interpret, qt=None, kt=None
):
    es, eh, ew = extents
    b, s, h, w, inner = q.shape
    dh = inner // heads
    hw = h * w
    ts = 2 * es + 1
    z = b * heads

    def to_zs(t):
        t = t.reshape(b, s, hw, heads, dh)
        return t.transpose(0, 3, 1, 2, 4).reshape(z, s, hw, dh)

    qz, kz, vz, gz = to_zs(q), to_zs(k), to_zs(v), to_zs(g)
    kz_p = jnp.pad(kz, ((0, 0), (es, es), (0, 0), (0, 0)))
    vz_p = jnp.pad(vz, ((0, 0), (es, es), (0, 0), (0, 0)))

    def frame_spec(ds):
        return pl.BlockSpec(
            (1, 1, hw, dh),
            lambda zz, i, ds=ds: (zz, i + ds, 0, 0),
            memory_space=pltpu.VMEM,
        )

    q_spec = pl.BlockSpec(
        (1, 1, hw, dh), lambda zz, i: (zz, i, 0, 0), memory_space=pltpu.VMEM
    )
    stat_spec = pl.BlockSpec(
        (1, 1, hw, 1), lambda zz, i: (zz, i, 0, 0), memory_space=pltpu.VMEM
    )

    qt = h if qt is None else qt
    k1 = functools.partial(
        _bwd_kernel_dq, seq=s, height=h, width=w, extents=extents, dh=dh,
        qt=qt,
    )
    dq, lse, dlt = pl.pallas_call(
        k1,
        grid=(z, s),
        in_specs=[q_spec]
        + [frame_spec(ds) for ds in range(ts)]
        + [frame_spec(ds) for ds in range(ts)]
        + [q_spec],
        out_specs=[q_spec, stat_spec, stat_spec],
        out_shape=[
            jax.ShapeDtypeStruct((z, s, hw, dh), q.dtype),
            jax.ShapeDtypeStruct((z, s, hw, 1), jnp.float32),
            jax.ShapeDtypeStruct((z, s, hw, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qz, *([kz_p] * ts), *([vz_p] * ts), gz)

    # re-lay out for the key-centric pass: frames padded by es, rows by
    # eh (padded row = true row + eh); stats move to the lane axis
    rows_p = (h + 2 * eh) * w

    def pad_frames_rows(t):
        t = t.reshape(z, s, h, w, dh)
        t = jnp.pad(t, ((0, 0), (es, es), (eh, eh), (0, 0), (0, 0)))
        return t.reshape(z, s + 2 * es, rows_p, dh)

    def pad_stat(t):
        t = t.reshape(z, s, h, w)
        t = jnp.pad(t, ((0, 0), (es, es), (eh, eh), (0, 0)))
        return t.reshape(z, s + 2 * es, 1, rows_p)

    qp, gp = pad_frames_rows(qz), pad_frames_rows(gz)
    lsep, dltp = pad_stat(lse), pad_stat(dlt)

    def pframe_spec(ds):
        return pl.BlockSpec(
            (1, 1, rows_p, dh),
            lambda zz, i, ds=ds: (zz, i + ds, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def pstat_spec(ds):
        return pl.BlockSpec(
            (1, 1, 1, rows_p),
            lambda zz, i, ds=ds: (zz, i + ds, 0, 0),
            memory_space=pltpu.VMEM,
        )

    kt = h if kt is None else kt
    k2 = functools.partial(
        _bwd_kernel_dkv, seq=s, height=h, width=w, extents=extents, dh=dh,
        kt=kt,
    )
    dk, dv = pl.pallas_call(
        k2,
        grid=(z, s),
        in_specs=[q_spec, q_spec]
        + [pframe_spec(ds) for ds in range(ts)]
        + [pframe_spec(ds) for ds in range(ts)]
        + [pstat_spec(ds) for ds in range(ts)]
        + [pstat_spec(ds) for ds in range(ts)],
        out_specs=[q_spec, q_spec],
        out_shape=[
            jax.ShapeDtypeStruct((z, s, hw, dh), k.dtype),
            jax.ShapeDtypeStruct((z, s, hw, dh), v.dtype),
        ],
        interpret=interpret,
    )(kz, vz, *([qp] * ts), *([gp] * ts), *([lsep] * ts), *([dltp] * ts))

    def from_zs(t):
        return (
            t.reshape(b, heads, s, hw, dh)
            .transpose(0, 2, 3, 1, 4)
            .reshape(b, s, h, w, inner)
        )

    return from_zs(dq), from_zs(dk), from_zs(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def local3d_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    extents: Tuple[int, int, int],
    heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for `models.attention.local3d_attention`.

    Args/returns identical to the XLA reference; `interpret=True` runs the
    Pallas interpreter (CPU testing). Grids whose full-frame working set
    exceeds VMEM are automatically H-tiled (`pick_h_tile`).
    """
    return _route_fwd(q, k, v, extents, heads, interpret)


def _route_fwd(q, k, v, extents, heads, interpret):
    b, s, h, w, inner = q.shape
    dh = inner // heads
    qt = pick_allframes_band(
        s, h, w, extents, dh, jnp.dtype(q.dtype).itemsize
    )
    if qt is not None:
        wt = pick_allframes_wt(h, w, extents, qt)
        return _fwd_impl_allframes(
            q, k, v, extents, heads, interpret, qt, wt
        )
    qt = pick_frame_band(
        s, h, w, extents, dh, False, jnp.dtype(q.dtype).itemsize
    )
    if qt is not None:
        return _fwd_impl(q, k, v, extents, heads, interpret, qt)
    th = pick_h_tile(s, h, w, extents, dh)
    if th is None:
        raise ValueError(
            f"local3d kernel working set exceeds VMEM for grid {h}x{w} "
            f"extents {extents} and no valid H-tile exists; use the XLA path"
        )
    return _fwd_impl_tiled(q, k, v, extents, heads, interpret, th)


def _route_bwd(q, k, v, g, extents, heads, interpret):
    b, s, h, w, inner = q.shape
    dh = inner // heads
    item = jnp.dtype(q.dtype).itemsize
    qt = pick_allframes_band(s, h, w, extents, dh, item, bwd=True)
    if qt is not None:
        wt = pick_allframes_wt(h, w, extents, qt)
        return _bwd_impl_allframes(
            q, k, v, g, extents, heads, interpret, qt, wt
        )
    qt = pick_frame_band(s, h, w, extents, dh, True, item)
    if qt is not None:
        return _bwd_impl(q, k, v, g, extents, heads, interpret, qt)
    # flash-style split backward before the H-tiled fallback: measured
    # (benchmarks/band_ab.py, bf16 v5e) 695 vs 1107 us at the Sber 32x32
    # shape — no partial dK/dV slabs, no XLA-side fold. Shapes the
    # per-frame grid still fits keep it (s32: per-frame 247 vs split
    # 283 us; the all-frames m3 route is faster than both at 125 us).
    bands = pick_split_bands(s, h, w, extents, dh, item)
    if bands is not None:
        return _bwd_impl_split(q, k, v, g, extents, heads, interpret, *bands)
    th = pick_h_tile(s, h, w, extents, dh)
    if th is None:
        raise ValueError(
            f"local3d kernel working set exceeds VMEM for grid {h}x{w} "
            f"extents {extents} and no valid H-tile exists; use the XLA path"
        )
    return _bwd_impl_tiled(q, k, v, g, extents, heads, interpret, th)


def _bwd_kernel(
    *refs, seq: int, height: int, width: int,
    extents: Tuple[int, int, int], dh: int, qt: int
):
    """Recompute attention for one (z, s) and emit dQ plus per-offset
    partial dK/dV slabs, one banded query row tile at a time."""
    es, eh, ew = extents
    hw = height * width
    ts = 2 * es + 1
    s = pl.program_id(1)

    q_ref = refs[0]
    k_refs = refs[1 : 1 + ts]
    v_refs = refs[1 + ts : 1 + 2 * ts]
    g_ref = refs[1 + 2 * ts]
    dq_ref = refs[2 + 2 * ts]
    dk_ref = refs[3 + 2 * ts]
    dv_ref = refs[4 + 2 * ts]

    scale = dh**-0.5
    dk_slabs = [jnp.zeros((hw, dh), jnp.float32) for _ in range(ts)]
    dv_slabs = [jnp.zeros((hw, dh), jnp.float32) for _ in range(ts)]
    for h0 in range(0, height, qt):
        lo, hi = _band_bounds(height, eh, h0, qt)
        bw = (hi - lo) * width
        q = q_ref[0, 0, h0 * width : (h0 + qt) * width]
        g = g_ref[0, 0, h0 * width : (h0 + qt) * width]
        k = jnp.concatenate(
            [r[0, 0, lo * width : hi * width] for r in k_refs], axis=0
        )  # (Ts*band*W, dh)
        v = jnp.concatenate(
            [r[0, 0, lo * width : hi * width] for r in v_refs], axis=0
        )

        scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        ok = _mask_band(seq, height, width, extents, s, h0, qt, lo, hi)
        scores = jnp.where(ok, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        attn = p / jnp.sum(p, axis=-1, keepdims=True)

        # softmax backward: dS = P * (dP - rowsum(dP * P))
        dp = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
        row = jnp.sum(dp * attn, axis=-1, keepdims=True)
        dscores = attn * (dp - row)  # f32, zero where masked
        ds_lo = dscores.astype(q.dtype)  # bf16 operands for the MXU passes
        at_lo = attn.astype(g.dtype)

        dq_ref[0, 0, h0 * width : (h0 + qt) * width] = (
            jnp.dot(ds_lo, k, preferred_element_type=jnp.float32) * scale
        ).astype(dq_ref.dtype)
        dk_band = (
            jnp.dot(ds_lo.T, q, preferred_element_type=jnp.float32) * scale
        ).reshape(ts, bw, dh)
        dv_band = jnp.dot(
            at_lo.T, g, preferred_element_type=jnp.float32
        ).reshape(ts, bw, dh)
        for j in range(ts):
            dk_slabs[j] = _band_add(dk_slabs[j], dk_band[j], lo * width)
            dv_slabs[j] = _band_add(dv_slabs[j], dv_band[j], lo * width)
    dk_ref[0, 0] = jnp.stack(dk_slabs).astype(dk_ref.dtype)
    dv_ref[0, 0] = jnp.stack(dv_slabs).astype(dv_ref.dtype)


def _bwd_impl(q, k, v, g, extents, heads, interpret, qt=None):
    es, eh, ew = extents
    b, s, h, w, inner = q.shape
    dh = inner // heads
    hw = h * w
    ts = 2 * es + 1

    def to_zs(t):
        t = t.reshape(b, s, hw, heads, dh)
        return t.transpose(0, 3, 1, 2, 4).reshape(b * heads, s, hw, dh)

    qz, kz, vz, gz = to_zs(q), to_zs(k), to_zs(v), to_zs(g)
    kz_p = jnp.pad(kz, ((0, 0), (es, es), (0, 0), (0, 0)))
    vz_p = jnp.pad(vz, ((0, 0), (es, es), (0, 0), (0, 0)))

    def frame_spec(ds):
        return pl.BlockSpec(
            (1, 1, hw, dh),
            lambda z, i, ds=ds: (z, i + ds, 0, 0),
            memory_space=pltpu.VMEM,
        )

    q_spec = pl.BlockSpec(
        (1, 1, hw, dh), lambda z, i: (z, i, 0, 0), memory_space=pltpu.VMEM
    )
    slab_spec = pl.BlockSpec(
        (1, 1, ts, hw, dh),
        lambda z, i: (z, i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    qt = h if qt is None else qt
    kernel = functools.partial(
        _bwd_kernel, seq=s, height=h, width=w, extents=extents, dh=dh,
        qt=qt,
    )
    dq, dk_part, dv_part = pl.pallas_call(
        kernel,
        grid=(b * heads, s),
        in_specs=[q_spec]
        + [frame_spec(ds) for ds in range(ts)]
        + [frame_spec(ds) for ds in range(ts)]
        + [q_spec],
        out_specs=[
            q_spec,
            slab_spec,
            slab_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * heads, s, hw, dh), q.dtype),
            jax.ShapeDtypeStruct((b * heads, s, ts, hw, dh), _part_dtype(q)),
            jax.ShapeDtypeStruct((b * heads, s, ts, hw, dh), _part_dtype(q)),
        ],
        interpret=interpret,
    )(qz, *([kz_p] * ts), *([vz_p] * ts), gz)

    # fold partial slabs into key frames: slab[z, sq, d] is the gradient
    # contribution to padded key frame sq + d, i.e. true frame sq + d - es.
    # dk[t] = sum_j pad(slab)[t + j, ts-1-j]  (diagonal shift-sum)
    def fold(slab):
        padded = jnp.pad(slab, ((0, 0), (es, es), (0, 0), (0, 0), (0, 0)))
        total = jnp.zeros((b * heads, s, hw, dh), jnp.float32)
        for j in range(ts):
            total = total + padded[:, j : j + s, ts - 1 - j]
        return total

    dkz = fold(dk_part).astype(k.dtype)
    dvz = fold(dv_part).astype(v.dtype)

    def from_zs(t):
        return (
            t.reshape(b, heads, s, hw, dh)
            .transpose(0, 2, 3, 1, 4)
            .reshape(b, s, h, w, inner)
        )

    return from_zs(dq), from_zs(dkz), from_zs(dvz)


def _fwd(q, k, v, extents, heads, interpret):
    return (
        _route_fwd(q, k, v, extents, heads, interpret),
        (q, k, v),
    )


def _bwd(extents, heads, interpret, residuals, g):
    q, k, v = residuals
    return _route_bwd(q, k, v, g, extents, heads, interpret)


local3d_attention_pallas.defvjp(_fwd, _bwd)
