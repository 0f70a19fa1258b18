"""Machine-readable perf ledger: every benchmark as one JSON artifact + MFU.

Runs the framework's benchmark suite (tokenizer encode/decode/roundtrip, VQ
kernels, local-3D attention kernels, model #3 train step, denoise forward)
with the honest chained-scan + value-readback methodology (see bench.py
docstring — on relayed TPU backends `block_until_ready` is an enqueue fence,
so only a value readback clocks compute), scores each measurement against an
analytic FLOPs model (utils/flops.py) and the chip's bf16 roofline, and
merges the results into `artifacts/perf_ledger.json`.

Sections are selectable because each costs several remote compiles:

    python benchmarks/perf_ledger.py tokenize vq attn train denoise
    python benchmarks/perf_ledger.py tokenize --platform cpu   # smoke

Entry schema: {name, backend, device, ms, flops, mfu_pct, bytes_note,
config, ts}. `mfu_pct` is null off-TPU.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time
from typing import Callable

import jax
import numpy as np
import jax.numpy as jnp

from world_modelz_tpu.utils import flops as F

OUT_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts",
    "perf_ledger.json",
)

ITERS = (5, 25)
TRIALS = 3
QUICK = False


def timed_chain(step_fn: Callable, x0, iters=None, trials=None) -> float:
    """Seconds per iteration of step_fn (pytree -> same-structure pytree).

    `iters`/`trials` default to the module globals AT CALL time so --quick
    (which reassigns them in main()) actually shortens every chain."""
    iters = ITERS if iters is None else iters
    trials = TRIALS if trials is None else trials

    @functools.partial(jax.jit, static_argnames="n")
    def chained(x, n):
        def body(x, _):
            return step_fn(x), ()

        final, _ = jax.lax.scan(body, x, None, length=n)
        leaves = jax.tree_util.tree_leaves(final)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    times = {}
    for n in iters:
        float(chained(x0, n))  # compile + warm
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(chained(x0, n))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return (times[iters[1]] - times[iters[0]]) / (iters[1] - iters[0])


class Ledger:
    def __init__(self, path: str):
        self.path = path
        self.entries = {}
        if os.path.exists(path):
            with open(path) as f:
                for e in json.load(f).get("entries", []):
                    self.entries[e["name"]] = e
        self.peak = F.device_peak()

    def record(self, name: str, seconds: float, flops: int, **config):
        peak = self.peak["bf16_flops"] if self.peak else None
        # differencing noise can push microsecond-scale measurements to <= 0;
        # record them as null rather than crashing (re-run with longer chains)
        valid = seconds > 0
        m = F.mfu(flops, seconds, peak) if (peak and valid) else None
        e = {
            "name": name,
            "device": (self.peak or {}).get(
                "device", jax.devices()[0].device_kind
            ),
            "ms": round(seconds * 1e3, 4) if valid else None,
            "flops": int(flops),
            "tflops_per_sec": (
                round(flops / seconds / 1e12, 2) if valid else None
            ),
            "mfu_pct": round(m, 2) if m is not None else None,
            "config": config,
            "ts": int(time.time()),
        }
        self.entries[name] = e
        print(json.dumps(e))
        return e

    def save(self):
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        entries = sorted(self.entries.values(), key=lambda e: e["name"])
        with open(self.path, "w") as f:
            json.dump(
                {"device": (self.peak or {}).get("device"), "entries": entries},
                f,
                indent=1,
            )
        print(f"[ledger] {len(entries)} entries -> {self.path}")


# --------------------------------------------------------------------------
# tokenizer: encode / decode / roundtrip at the headline-bench shape
# --------------------------------------------------------------------------

TOK = dict(
    embedding_dim=64, num_embeddings=512, downscale_steps=3, hidden_planes=128
)
TOK_BATCH, TOK_IMG, TOK_C = 256, 64, 3


def _tokenizer():
    from world_modelz_tpu.models import VQAutoEncoder

    tok = VQAutoEncoder(in_channels=TOK_C, **TOK)
    state = tok.init(
        jax.random.PRNGKey(0), jnp.zeros((1, TOK_IMG, TOK_IMG, TOK_C))
    )
    state = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32
        else x,
        state,
    )
    return tok, state


def sec_tokenize(led: Ledger):
    tok, state = _tokenizer()
    hw = (TOK_IMG, TOK_IMG)
    lat = tok.token_grid_shape(hw)
    n_lat = TOK_BATCH * lat[0] * lat[1]
    f_enc = TOK_BATCH * F.vqae_encode_flops(
        hw, TOK_C, TOK["embedding_dim"], TOK["hidden_planes"],
        TOK["downscale_steps"],
    ) + F.vq_search_flops(n_lat, TOK["num_embeddings"], TOK["embedding_dim"])
    f_dec = TOK_BATCH * F.vqae_decode_flops(
        hw, TOK_C, TOK["embedding_dim"], TOK["hidden_planes"],
        TOK["downscale_steps"],
    )
    key = jax.random.PRNGKey(1)
    frames = jax.random.uniform(
        key, (TOK_BATCH, TOK_IMG, TOK_IMG, TOK_C), jnp.bfloat16
    )
    tokens = tok.encode(state, frames)

    def enc_step(x):
        t = tok.encode(state, x)
        return x * 0.999 + jnp.mean(t.astype(x.dtype)) * 1e-6

    def dec_step(t):
        img = tok.decode(state, t)
        bump = jnp.sum(img.astype(jnp.float32)).astype(jnp.int32) % 2
        return (t + 1 + bump) % TOK["num_embeddings"]

    def rt_step(x):
        return tok.decode(state, tok.encode(state, x))

    s = timed_chain(enc_step, frames)
    led.record("tokenize/encode", s, f_enc, batch=TOK_BATCH, img=TOK_IMG,
               fps=round(TOK_BATCH / s, 1))
    s = timed_chain(dec_step, tokens)
    led.record("tokenize/decode", s, f_dec, batch=TOK_BATCH, img=TOK_IMG,
               fps=round(TOK_BATCH / s, 1))
    s = timed_chain(rt_step, frames)
    led.record("tokenize/roundtrip", s, f_enc + f_dec, batch=TOK_BATCH,
               img=TOK_IMG, fps=round(TOK_BATCH / s, 1))


# --------------------------------------------------------------------------
# VQ nearest-codebook kernels
# --------------------------------------------------------------------------


def sec_vq(led: Ledger):
    from world_modelz_tpu.kernels.vq_kernels import vq_encode_pallas
    from world_modelz_tpu.ops.vq import VQState, vq_decode, vq_encode

    n, d, k = (512, 16, 64) if QUICK else (16384, 64, 512)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, d))
    codebook = jax.random.normal(key, (1, k, d))
    state = VQState(
        codebook=codebook,
        cluster_size=jnp.ones((1, k)),
        activation_count=jnp.zeros((1, k)),
        accumulated_error=jnp.zeros((1, k)),
    )
    interp = jax.default_backend() != "tpu"
    f_idx = F.vq_search_flops(n, k, d)
    f_q = F.vq_search_flops(n, k, d, one_hot_decode=True)

    def xla_step(x):
        idx = vq_encode(state, x[:, None, :]).reshape(-1)
        return vq_decode(state, idx[:, None]).reshape(n, d) * 0.999 + x * 1e-3

    def xla_idx_step(x):
        idx = vq_encode(state, x[:, None, :]).reshape(-1)
        return x * 0.999 + jnp.mean(idx.astype(x.dtype)) * 1e-6

    def pal_step(x):
        _, q = vq_encode_pallas(x, codebook[0], interpret=interp)
        return q * 0.999 + x * 1e-3

    def pal_idx_step(x):
        idx, _ = vq_encode_pallas(
            x, codebook[0], return_quantized=False, interpret=interp
        )
        return x * 0.999 + jnp.mean(idx.astype(x.dtype)) * 1e-6

    cfg = dict(n=n, k=k, d=d)
    # microsecond-scale ops: long chains so the scan-length differencing
    # rises well above RPC jitter
    it = ITERS if QUICK else (20, 100)
    led.record(
        "vq/xla_encode_decode", timed_chain(xla_step, x, iters=it), f_q, **cfg
    )
    led.record(
        "vq/xla_index_only", timed_chain(xla_idx_step, x, iters=it), f_idx,
        **cfg,
    )
    led.record(
        "vq/pallas_encode_decode", timed_chain(pal_step, x, iters=it), f_q,
        **cfg,
    )
    led.record(
        "vq/pallas_index_only", timed_chain(pal_idx_step, x, iters=it),
        f_idx, **cfg,
    )

    # full training quantize pass: search + straight-through + EMA stats
    from world_modelz_tpu.ops.vq import vq_apply, vq_apply_fused

    f_train = 3 * F.vq_search_flops(n, k, d)  # scores + one-hot decode + dw

    def xla_train_step(x):
        out, _ = vq_apply(state, x[:, None, :], train=True)
        return out.quantized[:, 0, :] * 0.999 + x * 1e-3

    def pal_train_step(x):
        out, _ = vq_apply_fused(
            state, x[:, None, :], train=True, interpret=interp
        )
        return out.quantized[:, 0, :] * 0.999 + x * 1e-3

    led.record(
        "vq/xla_train_apply", timed_chain(xla_train_step, x, iters=it),
        f_train, **cfg,
    )
    led.record(
        "vq/pallas_train_fused", timed_chain(pal_train_step, x, iters=it),
        f_train, **cfg,
    )


# --------------------------------------------------------------------------
# local-3D attention kernels
# --------------------------------------------------------------------------


def sec_attn(led: Ledger):
    from world_modelz_tpu.kernels.local3d import local3d_attention_pallas
    from world_modelz_tpu.models.attention import local3d_attention

    on_tpu = jax.default_backend() == "tpu"

    def one(tag, b, s, h, w, inner, extents, heads, dtype=jnp.float32):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (b, s, h, w, inner), dtype)
        k = jax.random.normal(key, (b, s, h, w, inner), dtype)
        v = jax.random.normal(key, (b, s, h, w, inner), dtype)
        fl = F.local3d_attention_flops(b * s * h * w, extents, inner)
        cfg = dict(
            b=b, s=s, hw=f"{h}x{w}", inner=inner, extents=extents,
            dtype="bf16" if dtype == jnp.bfloat16 else "f32",
        )
        # sub-ms measurements need long chains or differencing noise wins
        # (measured: (20,100) chains spread 0.02-0.18 ms for the SAME
        # kernel across runs on the relay; CLAUDE.md floor is 40/240)
        it = ITERS if QUICK else (40, 240)

        led.record(
            f"attn/{tag}/xla",
            timed_chain(
                lambda q: local3d_attention(q, k, v, extents, heads), q,
                iters=it,
            ),
            fl,
            **cfg,
        )
        if on_tpu:
            led.record(
                f"attn/{tag}/pallas",
                timed_chain(
                    lambda q: local3d_attention_pallas(q, k, v, extents, heads),
                    q,
                    iters=it,
                ),
                fl,
                **cfg,
            )

    if QUICK:
        one("m3", 1, 3, 8, 8, 32, (1, 1, 1), 1)
        return
    one("m3", 8, 6, 16, 16, 128, (3, 1, 1), 1)  # model #3 scale
    # production train-path dtype (VERDICT r4 #6: the roofline verdict
    # must be drawn at bf16 operand traffic, not the f32 bench's)
    one("m3_bf16", 8, 6, 16, 16, 128, (3, 1, 1), 1, dtype=jnp.bfloat16)
    one("sparse32", 2, 32, 16, 16, 128, (3, 1, 1), 1)  # minecraft volume
    one("sparse32_bf16", 2, 32, 16, 16, 128, (3, 1, 1), 1,
        dtype=jnp.bfloat16)
    one("sber", 2, 16, 32, 32, 128, (3, 1, 1), 1)  # Sber 32x32 (H-tiled)


def sec_attn_bwd(led: Ledger):
    """Backward (dQ+dK+dV via vjp) of the routed local-3D kernel vs XLA
    autodiff, bf16 operands — the hot-path direction whose routing changed
    round 3 (sber 32x32 now takes the flash-style split backward, measured
    695 vs 1107 us for the banded H-tiled it replaced). Useful-flop
    convention: 3x the forward's two dots — the timed grad step runs the
    forward too (jax.grad), so its useful work is fwd (1x) + the
    backward's dp/dq/dk/dv MXU passes (2x, score recompute excluded) —
    see `flops_note` in each row's config."""
    from world_modelz_tpu.kernels.local3d import local3d_attention_pallas
    from world_modelz_tpu.models.attention import local3d_attention

    on_tpu = jax.default_backend() == "tpu"

    def one(tag, b, s, h, w, inner, extents, heads):
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (b, s, h, w, inner), jnp.bfloat16)
        k = jax.random.normal(kk, (b, s, h, w, inner), jnp.bfloat16)
        v = jax.random.normal(kv, (b, s, h, w, inner), jnp.bfloat16)
        fl = 3 * F.local3d_attention_flops(b * s * h * w, extents, inner)
        cfg = dict(
            b=b, s=s, hw=f"{h}x{w}", inner=inner, extents=extents,
            dtype="bf16", flops_note="grad step incl. forward: 3x fwd dots",
        )
        it = ITERS if QUICK else (20, 100)

        def grad_step(fn):
            def step(q):
                g = jax.grad(
                    lambda q, k, v: jnp.sum(
                        fn(q, k, v, extents, heads).astype(jnp.float32) ** 2
                    ),
                    argnums=(0, 1, 2),
                )(q, k, v)
                return (g[0] + g[1] + g[2]).astype(q.dtype)

            return step

        led.record(
            f"attn_bwd/{tag}/xla",
            timed_chain(grad_step(local3d_attention), q, iters=it),
            fl,
            **cfg,
        )
        if on_tpu:
            led.record(
                f"attn_bwd/{tag}/pallas",
                timed_chain(grad_step(local3d_attention_pallas), q, iters=it),
                fl,
                **cfg,
            )

    if QUICK:
        one("m3", 1, 3, 8, 8, 32, (1, 1, 1), 1)
        return
    one("sber", 2, 16, 32, 32, 128, (3, 1, 1), 1)


def sec_attn_block(led: Ledger):
    """Whole residual-attention BLOCK (QKV projections + windowed attention
    + output projection + residual) at the flagship m3 shape. The round-2
    review showed the attention *op* alone is launch/HBM-bound there (XLA
    ~parity); the round-3 fused kernel (`kernels.local3d_block`) keeps the
    whole block's intermediates in VMEM. Rows: xla (all-XLA), pallas
    (XLA projections + attention kernel), fused (one program per clip)."""
    from world_modelz_tpu.models.attention import Local3dAttention

    b, (s, h, w) = M3_B, M3_SHAPE
    dim, heads = M3["dim"], M3["heads"]
    dh, extents = M3["dim_head"], M3["extents"]
    if QUICK:
        b, s, h, w, dim, dh = 1, 3, 8, 8, 32, 16
    inner = heads * dh
    n = b * s * h * w
    fl = (
        3 * 2 * n * dim * inner          # k/v/q projections
        + 2 * n * inner * dim            # output projection
        + F.local3d_attention_flops(n, extents, inner)
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, s, h, w, dim), jnp.bfloat16)
    on_tpu = jax.default_backend() == "tpu"
    # 'fused' is requested literally; Local3dAttention routes its f32 init
    # trace through the XLA path so only the bf16 apply runs the kernel
    backends = ["xla"] + (["pallas", "fused"] if on_tpu else [])
    for backend in backends:
        m = Local3dAttention(
            extents=extents, heads=heads, dim_head=dh, backend=backend,
        )
        params = jax.tree_util.tree_map(
            lambda t: t.astype(jnp.bfloat16),
            m.init(jax.random.PRNGKey(1), x, x)["params"],
        )
        # ~0.1 ms/op: 200-invocation differencing keeps relay jitter well
        # under 10% (the (10, 60) chain showed 1.7x run-to-run swings)
        s_ = timed_chain(
            lambda t: m.apply({"params": params}, t, t) + t, x,
            iters=ITERS if QUICK else (10, 210),
        )
        led.record(
            f"attn_block/m3/{backend}", s_, fl,
            b=b, s=s, hw=f"{h}x{w}", dim=dim, inner=inner, extents=extents,
        )


# --------------------------------------------------------------------------
# model #3 train step + denoise forward
# --------------------------------------------------------------------------

M3 = dict(dim=384, depth=20, dim_head=128, mlp_dim=512, heads=1,
          extents=(3, 1, 1))
M3_SHAPE = (6, 16, 16)
M3_B, M3_K = 8, 512


def _m3(backend, use_ckpt):
    from world_modelz_tpu.models.video import VqVideoDiffusionModel

    model = VqVideoDiffusionModel(
        data_shape=M3_SHAPE,
        num_classes=M3_K,
        backend=backend,
        use_checkpointing=use_ckpt,
        **M3,
    )
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (M3_B, *M3_SHAPE), 0, M3_K + 1)
    params = model.init(key, tokens)["params"]
    return model, params, tokens


def sec_train(led: Ledger):
    import optax

    fwd = F.local3d_transformer_flops(
        M3_B, M3_SHAPE, num_classes=M3_K, **M3
    )
    backends = ["xla"] + (
        ["pallas", "fused"] if jax.default_backend() == "tpu" else []
    )
    for backend in backends:
        model, params, tokens = _m3(backend, use_ckpt=(backend == "xla"))
        target = jax.random.randint(
            jax.random.PRNGKey(1), (M3_B, 16, 16), 0, M3_K
        )
        opt = optax.adamw(1e-4)
        opt_state = opt.init(params)

        def train_step(carry):
            params, opt_state = carry

            def loss_fn(p):
                p = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32
                    else x,
                    p,
                )
                logits = model.apply({"params": p}, tokens).astype(
                    jnp.float32
                )
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits.reshape(-1, M3_K), target.reshape(-1)
                ).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_opt)

        s = timed_chain(train_step, (params, opt_state), iters=(2, 8))
        led.record(
            f"train_step/m3/{backend}+bf16",
            s,
            F.train_step_flops(fwd, checkpointed=True),
            batch=M3_B,
            steps_per_sec=round(1 / s, 1),
            **{k: v for k, v in M3.items() if k != "extents"},
        )


def sec_train_b64(led: Ledger):
    """Compiled train step at the reference's PRODUCTION configuration —
    batch 64 (vq-video-diffusion/results/README.md:18) — so the gap between
    compiled-step rate and observed end-to-end trainer rate is a tracked
    number (VERDICT r2 #3). Pallas backend (the training default on TPU)."""
    import optax

    global M3_B
    prev = M3_B
    M3_B = 64
    try:
        fwd = F.local3d_transformer_flops(
            M3_B, M3_SHAPE, num_classes=M3_K, **M3
        )
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        model, params, tokens = _m3(backend, use_ckpt=(backend == "xla"))
        target = jax.random.randint(
            jax.random.PRNGKey(1), (M3_B, 16, 16), 0, M3_K
        )
        opt = optax.adamw(1e-4)
        opt_state = opt.init(params)

        def train_step(carry):
            params, opt_state = carry

            def loss_fn(p):
                p = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32
                    else x,
                    p,
                )
                logits = model.apply({"params": p}, tokens).astype(
                    jnp.float32
                )
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits.reshape(-1, M3_K), target.reshape(-1)
                ).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_opt)

        s = timed_chain(train_step, (params, opt_state), iters=(2, 6))
        led.record(
            f"train_step/m3_b64/{backend}+bf16",
            s,
            F.train_step_flops(fwd, checkpointed=True),
            batch=M3_B,
            steps_per_sec=round(1 / s, 2),
            samples_per_sec=round(M3_B / s, 1),
            **{k: v for k, v in M3.items() if k != "extents"},
        )
    finally:
        M3_B = prev


def sec_train_e2e(led: Ledger):
    """Ingest real-trainer timing reports (cli/video_diffusion
    --timing_report) as end-to-end ledger rows with the host-overhead
    breakdown in the config, so the compiled-vs-wall gap is explained by
    tracked numbers instead of footnotes. The optional `composite` report
    is the same trainer with --device_composite (trajectory shipping)."""
    art = os.path.dirname(OUT_DEFAULT)
    reports = (
        ("train_e2e/m3/trainer",
         os.environ.get("WMZ_TIMING_REPORT",
                        os.path.join(art, "train_e2e_timing.json")),
         True),
        ("train_e2e/m3/composite",
         os.environ.get("WMZ_COMPOSITE_TIMING_REPORT",
                        os.path.join(art, "train_e2e_composite_timing.json")),
         False),
    )
    for row, path, required in reports:
        if not os.path.exists(path):
            if required:
                print(f"train_e2e: no timing report at {path} — run the "
                      "trainer with --timing_report first; skipping")
            continue
        with open(path) as f:
            rep = json.load(f)
        # FLOPs at the run's ACTUAL token grid (the as-trained rounds use
        # the downscale-3 tokenizer -> 6x8x8, not M3_SHAPE's published
        # 16x16)
        shape = tuple(rep.get("token_shape", M3_SHAPE))
        fwd = F.local3d_transformer_flops(
            rep["batch_size"], shape, num_classes=M3_K, **M3
        )
        s = 1.0 / rep["steps_per_sec"]
        extra = {
            k: rep[k]
            for k in ("probe", "reconciliation", "h2d")
            if k in rep
        }
        led.record(
            row,
            s,
            F.train_step_flops(fwd, checkpointed=True),
            batch=rep["batch_size"],
            grid=f"{shape[1]}x{shape[2]}",
            steps_per_sec=rep["steps_per_sec"],
            samples_per_sec=round(
                rep["batch_size"] * rep["steps_per_sec"], 1
            ),
            window_steps=rep["window_steps"],
            breakdown_pct=rep["breakdown_pct"],
            **extra,
        )


def sec_train_e2e_sparse(led: Ledger):
    """Ingest the sparse trainer's timing report (cli/sparse_diffusion
    --timing_report) as an end-to-end row for the second trained model
    family (dense transformer over num_context of the S*H*W token volume,
    reference minecraft/sparse_diffusion.py:398-542)."""
    path = os.environ.get(
        "WMZ_SPARSE_TIMING_REPORT",
        os.path.join(
            os.path.dirname(OUT_DEFAULT), "train_e2e_sparse_timing.json"
        ),
    )
    if not os.path.exists(path):
        print(f"train_e2e_sparse: no timing report at {path} — run the "
              "sparse trainer with --timing_report first; skipping")
        return
    with open(path) as f:
        rep = json.load(f)
    c = rep["config"]
    fwd = F.dense_transformer_flops(
        rep["batch_size"],
        rep["num_context"],
        dim=c["dim"],
        depth=c["depth"],
        heads=c["heads"],
        dim_head=c["dim"] // c["heads"],
        mlp_dim=c["mlp_dim"],
        num_classes=rep.get("num_classes", 0),
    )
    s = 1.0 / rep["steps_per_sec"]
    extra = {
        k: rep[k] for k in ("probe", "reconciliation", "h2d") if k in rep
    }
    led.record(
        "train_e2e/sparse/trainer",
        s,
        F.train_step_flops(fwd),  # no remat in the dense path -> 3x fwd
        batch=rep["batch_size"],
        n_ctx=rep["num_context"],
        steps_per_sec=rep["steps_per_sec"],
        samples_per_sec=round(rep["batch_size"] * rep["steps_per_sec"], 1),
        window_steps=rep["window_steps"],
        breakdown_pct=rep["breakdown_pct"],
        **extra,
    )


def sec_train_sparse_step(led: Ledger):
    """Compiled sparse train step at the round-3 AS-TRAINED configuration
    (batch 16, n_ctx 1024 over a 16^3 token volume, dim 512 depth 8
    heads 8, flash backend, bf16, loss-aware sampling + corruption + EMA
    inside the step) so the train_e2e/sparse/trainer row divides by a
    compiled twin of the SAME program (VERDICT r3: that row previously
    had no compiled counterpart at its config)."""
    import optax

    from world_modelz_tpu.diffusion import corrupt_tokens
    from world_modelz_tpu.diffusion.sparse import sample_time_dependent
    from world_modelz_tpu.models.video import VqSparseDiffusionModel
    from world_modelz_tpu.train import (
        ema_init,
        ema_update,
        loss_aware_init,
        loss_aware_sample,
        loss_aware_update,
    )

    B, NCTX, K = 16, 1024, 512
    SHAPE = (16, 16, 16)
    DIM, DEPTH, HEADS, MLP = 512, 8, 8, 1024
    if QUICK:
        B, NCTX, DIM, DEPTH, HEADS, MLP = 2, 128, 64, 2, 2, 128
    backend = "flash" if jax.default_backend() == "tpu" else "xla"
    model = VqSparseDiffusionModel(
        shape=SHAPE, num_classes=K, dim=DIM, depth=DEPTH,
        dim_head=DIM // HEADS, mlp_dim=MLP, heads=HEADS,
        attn_backend=backend,
    )
    key = jax.random.PRNGKey(0)
    batch_z = jax.random.randint(key, (B,) + SHAPE, 0, K)
    params = model.init(
        key,
        jnp.zeros((1, NCTX), jnp.int32),
        jnp.zeros((1, NCTX), jnp.int32),
    )["params"]
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)
    ema = ema_init(params)
    sampler_state = loss_aware_init()

    def train_step(carry):
        params, ema, opt_state, sampler_state, k = carry
        k, k_r, k_idx, k_c = jax.random.split(k, 4)
        r = loss_aware_sample(sampler_state, k_r, B)
        indices = sample_time_dependent(k_idx, B, NCTX, SHAPE, r)
        target = jnp.take_along_axis(
            batch_z.reshape(B, -1), indices, axis=1
        )
        corrupted, _ = corrupt_tokens(
            k_c, target, r, num_classes=K, mask_token=K, p_max_uniform=0.1
        )

        def loss_fn(p):
            p = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32
                else x,
                p,
            )
            logits = model.apply({"params": p}, corrupted, indices).astype(
                jnp.float32
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, K), target.reshape(-1)
            )
            return ce.mean(), ce.reshape(B, -1).mean(axis=1)

        (loss, per_sample), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        sampler_state = loss_aware_update(sampler_state, r, per_sample)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(ema, params, 0.999)
        return (params, ema, opt_state, sampler_state, k)

    fwd = F.dense_transformer_flops(
        B, NCTX, dim=DIM, depth=DEPTH, heads=HEADS, dim_head=DIM // HEADS,
        mlp_dim=MLP, num_classes=K,
    )
    s = timed_chain(
        train_step, (params, ema, opt_state, sampler_state, key),
        iters=ITERS if QUICK else (2, 8),
    )
    led.record(
        f"train_step/sparse_b16/{backend}+bf16",
        s,
        F.train_step_flops(fwd),  # no remat in the dense path -> 3x fwd
        batch=B,
        n_ctx=NCTX,
        grid="16x16x16",
        steps_per_sec=round(1 / s, 2),
        samples_per_sec=round(B / s, 1),
        dim=DIM, depth=DEPTH, heads=HEADS, mlp_dim=MLP,
    )


def sec_train_b64_g8(led: Ledger):
    """Compiled b64 train step at the AS-TRAINED round-2/3 configuration
    (downscale-3 tokenizer -> 6x8x8 token grid) so the end-to-end trainer
    row divides by a compiled row of the SAME program shape."""
    import optax

    from world_modelz_tpu.models.video import VqVideoDiffusionModel

    shape, b = (6, 8, 8), 64
    fwd = F.local3d_transformer_flops(b, shape, num_classes=M3_K, **M3)
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    model = VqVideoDiffusionModel(
        data_shape=shape, num_classes=M3_K, backend=backend,
        use_checkpointing=(backend == "xla"), **M3,
    )
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (b, *shape), 0, M3_K + 1)
    params = model.init(key, tokens)["params"]
    target = jax.random.randint(jax.random.PRNGKey(1), (b, 8, 8), 0, M3_K)
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)

    def train_step(carry):
        params, opt_state = carry

        def loss_fn(p):
            p = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32
                else x,
                p,
            )
            logits = model.apply({"params": p}, tokens).astype(jnp.float32)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, M3_K), target.reshape(-1)
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_opt)

    s = timed_chain(train_step, (params, opt_state), iters=(2, 8))
    led.record(
        f"train_step/m3_b64_g8/{backend}+bf16",
        s,
        F.train_step_flops(fwd, checkpointed=True),
        batch=b,
        grid="8x8",
        steps_per_sec=round(1 / s, 2),
        samples_per_sec=round(b / s, 1),
        **{k: v for k, v in M3.items() if k != "extents"},
    )


def sec_train_b64_g8_full(led: Ledger):
    """Compiled twin of the trainer's WHOLE dispatched program at the
    as-trained 8x8 b64 config — device compositing (as_frames), frozen
    f32-tokenizer encode, loss-aware corruption, denoiser train step,
    EMA and the NaN guard (cli/video_diffusion.py step_body, lines
    518-590) — so the train_e2e/m3/trainer row divides by a twin that
    computes the SAME work, not just the denoiser step. A second row
    re-times it with the tokenizer state cast to bf16 (the frozen-encoder
    inference dtype question: the tokenize/* ledger rows already bench
    bf16 states)."""
    import optax

    from world_modelz_tpu.data.device_composite import as_frames
    from world_modelz_tpu.diffusion import corrupt_tokens
    from world_modelz_tpu.models import VQAutoEncoder
    from world_modelz_tpu.models.video import VqVideoDiffusionModel
    from world_modelz_tpu.train import (
        ema_update,
        loss_aware_init,
        loss_aware_sample,
        loss_aware_update,
    )
    from world_modelz_tpu.train.guard import reject_nonfinite

    b, s, img = 64, 6, 64
    tok = VQAutoEncoder(in_channels=1, **TOK)
    tok_state = tok.init(jax.random.PRNGKey(0), jnp.zeros((1, img, img, 1)))
    grid = tok.token_grid_shape((img, img))  # (8, 8) at downscale 3
    shape = (s, *grid)
    K = TOK["num_embeddings"]

    fwd = F.local3d_transformer_flops(b, shape, num_classes=K, **M3)
    f_enc = b * s * F.vqae_encode_flops(
        (img, img), 1, TOK["embedding_dim"], TOK["hidden_planes"],
        TOK["downscale_steps"],
    ) + F.vq_search_flops(
        b * s * grid[0] * grid[1], K, TOK["embedding_dim"]
    )
    flops = F.train_step_flops(fwd, checkpointed=True) + f_enc

    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    model = VqVideoDiffusionModel(
        data_shape=shape, num_classes=K, backend=backend,
        use_checkpointing=(backend == "xla"), **M3,
    )
    key = jax.random.PRNGKey(2)
    params = model.init(key, jnp.zeros((1, *shape), jnp.int32))["params"]
    ema_params = params
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)
    sampler_state = loss_aware_init()
    ks, kp = jax.random.split(jax.random.PRNGKey(3))
    traj = {
        "sprites": jax.random.randint(
            ks, (b, 2, 24, 24), 0, 256, dtype=jnp.int32
        ).astype(jnp.uint8),
        "pos": jax.random.randint(kp, (b, 2, s, 2), 0, img - 24),
    }

    def make_step(t_state):
        def full_step(carry):
            params, ema_params, opt_state, sampler_state, key = carry
            key, k_r, k_corrupt, k_drop = jax.random.split(key, 4)
            frames = as_frames(traj, img)
            bb, ss, hh, ww, c = frames.shape
            tokens = tok.encode(t_state, frames.reshape(bb * ss, hh, ww, c))
            tokens = tokens.reshape(bb, ss, *tokens.shape[1:])
            target = tokens[:, -1]
            r = loss_aware_sample(sampler_state, k_r, bb)
            corrupted, _ = corrupt_tokens(
                k_corrupt, target.reshape(bb, -1), r,
                num_classes=K, mask_token=K, p_max_uniform=0.1,
            )
            batch_z = tokens.at[:, -1].set(corrupted.reshape(target.shape))

            def loss_fn(p):
                p = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32
                    else x,
                    p,
                )
                logits = model.apply(
                    {"params": p}, batch_z, train=True,
                    rngs={"dropout": k_drop},
                ).astype(jnp.float32)
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits.reshape(-1, K), target.reshape(-1)
                )
                return ce.mean(), ce.reshape(bb, -1).mean(axis=1)

            (loss, per_sample), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            gn = optax.global_norm(grads)
            old = (params, ema_params, opt_state, sampler_state)
            sampler_state = loss_aware_update(
                sampler_state, r, jnp.nan_to_num(per_sample)
            )
            grads = jax.tree_util.tree_map(jnp.nan_to_num, grads)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            ema_params = ema_update(ema_params, params, 0.999)
            ok = jnp.isfinite(loss) & jnp.isfinite(gn)
            params, ema_params, opt_state, sampler_state = reject_nonfinite(
                ok, old, (params, ema_params, opt_state, sampler_state)
            )
            return (params, ema_params, opt_state, sampler_state, key)

        return full_step

    carry = (params, ema_params, opt_state, sampler_state,
             jax.random.PRNGKey(4))
    for tag, t_state in (
        ("f32tok", tok_state),
        ("bf16tok", jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32
            else x,
            tok_state,
        )),
    ):
        sec = timed_chain(make_step(t_state), carry, iters=(2, 8))
        led.record(
            f"train_step/m3_b64_g8_full/{backend}+bf16+{tag}",
            sec,
            flops,
            batch=b,
            grid="8x8",
            steps_per_sec=round(1 / sec, 2),
            samples_per_sec=round(b / sec, 1),
            includes="composite+encode+corrupt+train+ema+guard",
            **{k: v for k, v in M3.items() if k != "extents"},
        )


def sec_serve(led: Ledger):
    """Serving path MFU: RolloutService end-to-end at model-#3 scale
    (as-trained 8x8 grid), honest wall-clock (results materialize to host
    numpy before futures resolve). Records clips/sec + MFU of the full
    encode -> T x iters unmask -> decode pipeline."""
    import time as _time

    from world_modelz_tpu.models.video import VqVideoDiffusionModel
    from world_modelz_tpu.serve import RolloutService
    from world_modelz_tpu.models import VQAutoEncoder

    S, IMG, T, ITERS, B, REQ = 6, 64, 8, 30, 8, 32
    tok = VQAutoEncoder(
        embedding_dim=64, num_embeddings=512, downscale_steps=3,
        hidden_planes=128, in_channels=1,
    )
    key = jax.random.PRNGKey(0)
    tok_state = tok.init(key, jnp.zeros((1, IMG, IMG, 1)))
    h = w = IMG // 8
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    model = VqVideoDiffusionModel(
        data_shape=(S, h, w), num_classes=512, backend=backend,
        use_checkpointing=False, **M3,
    )
    params = model.init(key, jnp.zeros((1, S, h, w), jnp.int32))["params"]
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    rng_np = np.random.default_rng(0)
    clips = rng_np.uniform(size=(REQ, S, IMG, IMG, 1)).astype(np.float32)
    svc = RolloutService(
        tok, tok_state, model, params,
        num_frames=T, num_iterations=ITERS, batch_size=B, max_wait_s=0.2,
    )
    try:
        # warm every program in the timed path: the full-batch rollout
        futs = [svc.submit(c) for c in clips[:B]]
        [f.result() for f in futs]
        t0 = _time.perf_counter()
        futs = [svc.submit(c) for c in clips]
        outs = [f.result() for f in futs]
        dt = _time.perf_counter() - t0
    finally:
        svc.close()
    assert all(o.shape[0] == T for o in outs)

    # FLOPs per request: encode S frames + T*ITERS denoiser fwd + decode T
    enc = S * F.vqae_encode_flops(
        (IMG, IMG), 1, 64, 128, 3
    ) + F.vq_search_flops(S * h * w, 512, 64)
    fwdf = F.local3d_transformer_flops(1, (S, h, w), num_classes=512, **M3)
    dec = T * F.vqae_decode_flops((IMG, IMG), 1, 64, 128, 3)
    per_req = enc + T * ITERS * fwdf + dec
    led.record(
        "serve/m3_g8/rollout",
        dt / REQ,
        per_req,
        requests=REQ,
        batch=B,
        frames=T,
        iterations=ITERS,
        clips_per_sec=round(REQ / dt, 2),
        frames_per_sec=round(REQ * T / dt, 1),
        occupancy_pct=100,
    )


def sec_serve_suite(led: Ledger):
    """Ingest the serving matrix (benchmarks/serve_bench.py --suite,
    artifacts/serve_suite.json) as ledger rows — occupancy ladder,
    sessions vs resubmit, swept-fast preset, ladder 16, overload with
    deadlines. MFU uses the same per-request pipeline FLOPs model as
    sec_serve, scaled by each row's iteration count (sessions skip the
    seed encode)."""
    path = os.path.join(os.path.dirname(OUT_DEFAULT), "serve_suite.json")
    if not os.path.exists(path):
        print(f"serve_suite: no {path} — run "
              "benchmarks/serve_bench.py --suite first; skipping")
        return
    with open(path) as f:
        rep = json.load(f)
    S, IMG = 6, 64
    h = w = IMG // 8
    T = rep["frames_per_clip"]
    enc = S * F.vqae_encode_flops(
        (IMG, IMG), 1, 64, 128, 3
    ) + F.vq_search_flops(S * h * w, 512, 64)
    fwdf = F.local3d_transformer_flops(1, (S, h, w), num_classes=512, **M3)
    dec = T * F.vqae_decode_flops((IMG, IMG), 1, 64, 128, 3)
    for r in rep["rows"]:
        iters = r.get("iterations", 30)
        per_req = (0 if r["name"] == "serve/session" else enc) \
            + T * iters * fwdf + dec
        n = r["requests"]
        led.record(
            r["name"],
            r["wall_s"] / max(n, 1),
            per_req,
            **{k: v for k, v in r.items()
               if k not in ("name", "wall_s", "stats")},
        )


def sec_denoise(led: Ledger):
    fwd = F.local3d_transformer_flops(M3_B, M3_SHAPE, num_classes=M3_K, **M3)
    backends = ["xla"] + (
        ["pallas", "fused"] if jax.default_backend() == "tpu" else []
    )
    for backend in backends:
        model, params, tokens = _m3(backend, use_ckpt=False)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params,
        )

        def denoise_step(tokens):
            logits = model.apply({"params": params}, tokens)
            draw = jnp.argmax(logits, axis=-1).astype(tokens.dtype)
            return tokens.at[:, -1].set(draw)

        s = timed_chain(denoise_step, tokens, iters=(3, 13))
        led.record(
            f"denoise_fwd/m3/{backend}",
            s,
            fwd,
            batch=M3_B,
            fwd_per_sec=round(1 / s, 1),
        )


def sec_tokenize_b512(led: Ledger):
    """Roundtrip at batch 512 — is the headline bench batch-bound?"""
    global TOK_BATCH
    prev = TOK_BATCH
    TOK_BATCH = prev * 2
    try:
        tok, state = _tokenizer()
        hw = (TOK_IMG, TOK_IMG)
        lat = tok.token_grid_shape(hw)
        f = TOK_BATCH * (
            F.vqae_encode_flops(hw, TOK_C, TOK["embedding_dim"],
                                TOK["hidden_planes"], TOK["downscale_steps"])
            + F.vqae_decode_flops(hw, TOK_C, TOK["embedding_dim"],
                                  TOK["hidden_planes"], TOK["downscale_steps"])
        ) + F.vq_search_flops(
            TOK_BATCH * lat[0] * lat[1], TOK["num_embeddings"],
            TOK["embedding_dim"],
        )
        frames = jax.random.uniform(
            jax.random.PRNGKey(2), (TOK_BATCH, TOK_IMG, TOK_IMG, TOK_C),
            jnp.bfloat16,
        )
        s = timed_chain(
            lambda x: tok.decode(state, tok.encode(state, x)), frames
        )
        led.record(
            f"tokenize/roundtrip_b{TOK_BATCH}", s, f, batch=TOK_BATCH,
            img=TOK_IMG, fps=round(TOK_BATCH / s, 1),
        )
    finally:
        TOK_BATCH = prev


def sec_dense_attn(led: Ledger):
    """Dense self-attention (sparse-diffusion backbone) at long contexts:
    XLA einsum vs the stock TPU flash-attention kernel
    (models/attention.py DenseAttention backend). fwd and train-step rows
    at 1k and 4k tokens — the full 16x16x16 minecraft volume is 4096."""
    import optax

    from world_modelz_tpu.models.attention import DenseAttention

    dim, heads, dh = 512, 8, 64
    b = 4
    on_tpu = jax.default_backend() == "tpu"
    backends = ["xla"] + (["flash"] if on_tpu else [])
    ns = [1024, 4096] if not QUICK else [256]
    for n in ns:
        x = jax.random.normal(
            jax.random.PRNGKey(0), (b, n, dim), jnp.bfloat16
        )
        inner = heads * dh
        fl = (
            2 * b * n * dim * 3 * inner
            + 2 * 2 * b * n * n * inner
            + 2 * b * n * inner * dim
        )
        for backend in backends:
            m = DenseAttention(heads=heads, dim_head=dh, backend=backend)
            params = jax.tree_util.tree_map(
                lambda t: t.astype(jnp.bfloat16),
                m.init(jax.random.PRNGKey(1), x)["params"],
            )
            s = timed_chain(
                lambda t: m.apply({"params": params}, t) + t, x,
                iters=ITERS if QUICK else (10, 60),
            )
            led.record(
                f"dense_attn/n{n}/{backend}", s, fl, b=b, n=n, dim=dim,
                heads=heads, dim_head=dh,
            )

            # train step: grad of sum-of-squares through the block
            opt = optax.adamw(1e-4)
            opt_state = opt.init(params)

            def train_step(carry):
                params, opt_state = carry

                def loss_fn(p):
                    return jnp.mean(
                        m.apply({"params": p}, x).astype(jnp.float32) ** 2
                    )

                _, grads = jax.value_and_grad(loss_fn)(params)
                updates, new_opt = opt.update(grads, opt_state, params)
                return (
                    optax.apply_updates(params, updates), new_opt
                )

            s = timed_chain(
                lambda c: train_step(c), (params, opt_state),
                iters=ITERS if QUICK else (5, 25),
            )
            led.record(
                f"dense_attn_train/n{n}/{backend}", s, 3 * fl, b=b, n=n,
                dim=dim, heads=heads, dim_head=dh,
            )


def _cost_flops(fn, *args) -> int:
    """Analytic-free flop count: XLA's own cost analysis of the program
    lowered for CPU (flop counts are backend-independent; the CPU compile
    avoids a remote relay compile just to read metadata)."""
    try:
        lowered = jax.jit(fn, backend="cpu").lower(*args)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return int(cost.get("flops", 0))
    except Exception as e:  # pragma: no cover - metadata-only fallback
        print("cost_analysis unavailable:", e)
        return 0


def sec_train_som_step(led: Ledger):
    """Compiled SOM-DDPM (UNet over 2ch SOM latents) train step at the
    round-4 pipeline configuration — gives the SOM family a steps/sec +
    MFU regression row (VERDICT r4 #7). Reference:
    som-diffusion/train_diffusion.py."""
    import optax

    from world_modelz_tpu.diffusion.ddpm import ddpm_corrupt
    from world_modelz_tpu.models.unet import UNetDiffusionModel

    b, latent = 128, (16, 16, 2)
    model = UNetDiffusionModel(
        in_channels=2, out_channels=2, model_channels=128,
        num_res_blocks=3, channel_mult=(1, 2, 3), dropout=0.0,
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, *latent))
    params = model.init(key, x[:1], jnp.zeros((1, 1)))["params"]
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)

    def train_step(carry):
        params, opt_state, x = carry
        k = jax.random.PRNGKey(1)
        t = jax.random.uniform(k, (b, 1))
        xt, eps = ddpm_corrupt(k, x, t)

        def loss(p):
            pred = model.apply({"params": p}, xt, t)
            return jnp.mean((pred - eps) ** 2)

        l, grads = jax.value_and_grad(loss)(params)
        updates, new_opt = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return (new_params, new_opt, x * 0.999 + l * 1e-6)

    fl = _cost_flops(lambda c: train_step(c)[2], (params, opt_state, x))
    s = timed_chain(train_step, (params, opt_state, x), iters=(3, 13))
    led.record(
        "train_step/som_ddpm/unet", s, fl, batch=b,
        latent="16x16x2", model_channels=128,
        steps_per_sec=round(1 / s, 2), samples_per_sec=round(b / s, 1),
        flops_note="XLA cost_analysis of the compiled step",
    )


def sec_train_masked_step(led: Ledger):
    """Compiled masked-denoise (gMLP) train step at the round-4 run's
    configuration — steps/sec + MFU regression row (VERDICT r4 #7).
    Reference: vq-video-diffusion/masked_denoise_prototype/main.py."""
    import optax

    from world_modelz_tpu.models.gmlp import GMLP

    b, seq_len, num_tokens, d_patch = 32, 64, 512, 192
    model = GMLP(
        num_tokens_in=num_tokens + 1, num_tokens_out=num_tokens,
        dim=512, depth=8, seq_len=seq_len, vq_embedding_dim=d_patch,
    )
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (b, seq_len), 0, num_tokens + 1)
    emb = jax.random.normal(key, (b, seq_len, d_patch))
    target = jax.random.randint(key, (b, seq_len), 0, num_tokens)
    params = model.init(key, tokens, emb)["params"]
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)

    def train_step(carry):
        params, opt_state, emb = carry

        def loss(p):
            logits = model.apply({"params": p}, tokens, emb)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, num_tokens), target.reshape(-1)
            ).mean()

        l, grads = jax.value_and_grad(loss)(params)
        updates, new_opt = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return (new_params, new_opt, emb * 0.999 + l * 1e-6)

    fl = _cost_flops(lambda c: train_step(c)[2], (params, opt_state, emb))
    s = timed_chain(train_step, (params, opt_state, emb), iters=(3, 13))
    led.record(
        "train_step/masked_denoise/gmlp", s, fl, batch=b,
        seq_len=seq_len, dim=512, depth=8,
        steps_per_sec=round(1 / s, 2), samples_per_sec=round(b / s, 1),
        flops_note="XLA cost_analysis of the compiled step",
    )


SECTIONS = {
    "tokenize": sec_tokenize,
    "tokenize512": sec_tokenize_b512,
    "vq": sec_vq,
    "attn": sec_attn,
    "attn_bwd": sec_attn_bwd,
    "attn_block": sec_attn_block,
    "dense_attn": sec_dense_attn,
    "train": sec_train,
    "train_b64": sec_train_b64,
    "train_b64_g8": sec_train_b64_g8,
    "train_b64_g8_full": sec_train_b64_g8_full,
    "train_e2e": sec_train_e2e,
    "train_e2e_sparse": sec_train_e2e_sparse,
    "train_sparse": sec_train_sparse_step,
    "serve": sec_serve,
    "serve_suite": sec_serve_suite,
    "denoise": sec_denoise,
    "train_som": sec_train_som_step,
    "train_masked": sec_train_masked_step,
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("sections", nargs="*", default=[])
    p.add_argument("--platform", default="")
    p.add_argument("--out", default=OUT_DEFAULT)
    p.add_argument(
        "--quick",
        action="store_true",
        help="tiny shapes / short chains — CPU smoke only, numbers meaningless",
    )
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from world_modelz_tpu.utils import compcache

    compcache.enable()  # skip repeat relay compiles between ledger runs
    if args.quick:
        global TOK_BATCH, TOK_IMG, ITERS, TRIALS, M3, M3_B, QUICK
        QUICK = True
        TOK_BATCH, TOK_IMG, ITERS, TRIALS = 8, 32, (2, 4), 1
        M3 = dict(M3, dim=64, depth=2, dim_head=32, mlp_dim=64)
        M3_B = 2
    sections = args.sections or list(SECTIONS)
    print("backend:", jax.default_backend())
    led = Ledger(args.out)
    for name in sections:
        SECTIONS[name](led)
        led.save()  # incremental: survive relay kills mid-suite


if __name__ == "__main__":
    main()
