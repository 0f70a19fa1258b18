"""Isolate relay dispatch latency from device compute (VERDICT r4 #5).

The round-4 flagship timing report left a gap unexplained: the in-run
fenced probe measured 33.5 ms/step for a 10-step dispatch while the
ledger's compiled twin (`train_step/m3_b64_g8`, chained-scan differenced)
measured 22.3 ms/step. The probe's protocol is
``fence; dispatch(k steps); value-fence`` — i.e. it contains exactly ONE
relay round-trip on top of k compiled steps — so

    t_probe(k) = roundtrip + k * t_device

This script measures the same compiled m3 train step three ways on the
live backend and solves for the round-trip:

1. ``chained``: differenced scan lengths (2, 8) — pure device ms/step,
   the ledger methodology (RPC cancels in the difference).
2. ``single(k)`` for k in (1, 10): one fenced dispatch of a k-step scan,
   best of N trials — the in-run probe's methodology.
   roundtrip = single(1) - device; device = (single(10) - single(1)) / 9.
3. A trivial jitted (8,128) add, single fenced dispatch — the floor any
   dispatch pays regardless of program size.

Writes artifacts/relay_latency.json. Run on an idle host: concurrent CPU
work inflates relay measurements ~2x (CLAUDE.md).
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "artifacts", "relay_latency.json")

M3 = dict(dim=384, depth=20, dim_head=128, mlp_dim=512, heads=1)
M3_K = 512


def build_step():
    import optax

    from world_modelz_tpu.models.video import VqVideoDiffusionModel

    shape, b = (6, 8, 8), 64
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    model = VqVideoDiffusionModel(
        data_shape=shape, num_classes=M3_K, extents=(3, 1, 1),
        backend=backend, use_checkpointing=(backend == "xla"), **M3,
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
                if x.dtype == jnp.float32 else x,
                p,
            )
            import optax as _o

            logits = model.apply({"params": p}, tokens).astype(jnp.float32)
            return _o.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, M3_K), target.reshape(-1)
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        import optax as _o

        updates, new_opt = opt.update(grads, opt_state, params)
        return (_o.apply_updates(params, updates), new_opt)

    return train_step, (params, opt_state)


def main():
    from world_modelz_tpu.utils import compcache

    compcache.enable()
    print("backend:", jax.default_backend())

    # ---- trivial dispatch floor ----------------------------------------
    @jax.jit
    def triv(x):
        return x + 1.0

    x = jnp.zeros((8, 128))
    float(jnp.sum(triv(x)))  # warm
    best_triv = min(
        _timed(lambda: float(jnp.sum(triv(x)))) for _ in range(20)
    )

    # ---- m3 train step: chained vs single-dispatch ----------------------
    step, carry = build_step()

    @functools.partial(jax.jit, static_argnames="n")
    def chained(c, n):
        def body(c, _):
            return step(c), ()

        final, _ = jax.lax.scan(body, c, None, length=n)
        leaves = jax.tree_util.tree_leaves(final)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    times = {}
    for n in (1, 2, 8, 10):
        float(chained(carry, n))  # compile + warm
        times[n] = min(
            _timed(lambda: float(chained(carry, n))) for _ in range(5)
        )
        print(f"single fenced dispatch of {n} steps: {times[n]*1e3:.1f} ms")

    device_diff = (times[8] - times[2]) / 6  # ledger methodology
    device_fit = (times[10] - times[1]) / 9  # probe methodology, fitted
    rt_fit = times[1] - device_fit

    out = {
        "about": __doc__.split("\n")[0],
        "device": jax.devices()[0].device_kind,
        "trivial_dispatch_ms": round(best_triv * 1e3, 2),
        "single_dispatch_ms": {
            str(k): round(v * 1e3, 2) for k, v in times.items()
        },
        "device_ms_per_step_differenced": round(device_diff * 1e3, 2),
        "device_ms_per_step_fit": round(device_fit * 1e3, 2),
        "relay_roundtrip_ms_fit": round(rt_fit * 1e3, 2),
        "probe_model": (
            "t_probe(k) = roundtrip + k*t_device; at steps_per_dispatch "
            "k the in-run probe therefore reads t_device + roundtrip/k "
            "per step. The flagship's probed-vs-compiled per-step gap is "
            "the roundtrip amortized over its dispatch length."
        ),
        "implied_probe_ms_per_step_at_k10": round(
            (rt_fit / 10 + device_fit) * 1e3, 2
        ),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print("->", OUT)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
