"""Audit the XLA collectives each parallel config emits per training step.

VERDICT r3: the parallel layer was correctness-proven but communication-
blind — nothing counted the collectives, so SCALING.md's rules of thumb
carried no numbers and an accidental all-gather-per-step regression would
be invisible until real multi-chip hardware arrived. This harness compiles
the REAL model's training step under each parallel config on the virtual
8-device CPU mesh, parses the optimized HLO, and records per-step
collective op counts and byte volumes:

    python benchmarks/collective_audit.py          # -> artifacts/collective_audit.json

The same audit functions back a regression test
(tests/test_collective_audit.py) that pins the expected communication
pattern per config — e.g. plain DP must stay all-reduce-only (a param
all-gather appearing there is a sharding bug), FSDP must gather params and
reduce-scatter grads rather than all-reduce them.

Bytes are the HLO result-shape sizes of the collective ops — the payload a
chip RECEIVES per step (all-gather counts the gathered output, all-reduce
the reduced buffer), the standard first-order proxy for ICI time
(jax-ml.github.io/scaling-book collective cost model).
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np

OUT_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts",
    "collective_audit.json",
)

COLLECTIVES = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
}

_SHAPE_RE = re.compile(r"([a-z]+\d*)\[([\d,]*)\]")


def _shape_bytes(shape_text: str) -> int:
    """Total bytes of an HLO result type (handles tuples)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_text):
        size = _DTYPE_BYTES.get(dtype)
        if size is None:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * size
    return total


def collective_stats(hlo_text: str) -> dict:
    """Count collective ops + result bytes in optimized HLO text.

    Matches computation-root and nested instructions of the form
    `%name = <shape> all-reduce(...)`; `-start`/`-done` async pairs are
    counted once (on the -start, which carries the shape)."""
    stats = {c: {"count": 0, "bytes": 0} for c in COLLECTIVES}
    line_re = re.compile(
        r"=\s+((?:\([^)]*\)|\S+?))\s+("
        + "|".join(COLLECTIVES)
        + r")(-start)?\("
    )
    for line in hlo_text.splitlines():
        m = line_re.search(line)
        if not m:
            continue
        shape_text, op = m.group(1), m.group(2)
        stats[op]["count"] += 1
        stats[op]["bytes"] += _shape_bytes(shape_text)
    stats["total_bytes"] = sum(
        s["bytes"] for c, s in stats.items() if c in COLLECTIVES
    )
    return stats


# ---------------------------------------------------------------------------
# Config builders: each returns (jitted_fn, example_args) for the REAL
# model's train step under one parallel config (mirrors
# __graft_entry__.dryrun_multichip's legs at the same tiny scale).
# ---------------------------------------------------------------------------


def _model_and_state(mesh, fsdp=False):
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from world_modelz_tpu.models.video import VqVideoDiffusionModel
    from world_modelz_tpu.parallel import DEFAULT_TP_RULES, shard_params
    from world_modelz_tpu.train import (
        ema_init,
        loss_aware_init,
        make_optimizer,
        warmup_cosine_schedule,
    )

    K, S, H, W = 32, 3, 4, 4
    model = VqVideoDiffusionModel(
        data_shape=(S, H, W), dim=16, num_classes=K, extents=(1, 1, 1),
        depth=2, dim_head=8, mlp_dim=32, heads=2, backend="xla",
    )
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, S, H, W), jnp.int32))["params"]
    opt = make_optimizer("adamw", warmup_cosine_schedule(1e-3, 5, 100), 1e-4)
    opt_state = opt.init(params)

    if fsdp:
        from world_modelz_tpu.parallel import (
            fsdp_shardings,
            opt_state_shardings,
        )

        p_shard = fsdp_shardings(params, mesh, DEFAULT_TP_RULES, min_size=64)
        opt_shard = opt_state_shardings(opt_state, params, p_shard, mesh)
    else:
        p_shard = shard_params(params, mesh, DEFAULT_TP_RULES)
        opt_shard = NamedSharding(mesh, P())

    state = dict(
        model=model, opt=opt, K=K, S=S, H=H, W=W, key=key,
        params=jax.device_put(params, p_shard),
        ema=jax.device_put(ema_init(params), p_shard),
        opt_state=jax.device_put(opt_state, opt_shard),
        sampler=jax.device_put(
            loss_aware_init(), NamedSharding(mesh, P())
        ),
    )
    return state


def _train_step_fn(state):
    import jax
    import jax.numpy as jnp
    import optax

    from world_modelz_tpu.diffusion import corrupt_tokens
    from world_modelz_tpu.train import (
        ema_update,
        loss_aware_sample,
        loss_aware_update,
    )

    model, opt, K = state["model"], state["opt"], state["K"]

    def train_step(params, ema, opt_state, sampler, tokens, key):
        b = tokens.shape[0]
        k_r, k_corrupt = jax.random.split(key)
        target = tokens[:, -1]
        r = loss_aware_sample(sampler, k_r, b)
        corrupted, _ = corrupt_tokens(
            k_corrupt, target.reshape(b, -1), r, num_classes=K, mask_token=K
        )
        batch_z = tokens.at[:, -1].set(corrupted.reshape(target.shape))

        def loss_fn(p):
            logits = model.apply({"params": p}, batch_z)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, K), target.reshape(-1)
            )
            return ce.mean(), ce.reshape(b, -1).mean(axis=1)

        (loss, per_sample), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        sampler = loss_aware_update(sampler, r, per_sample)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(ema, params, 0.99)
        return params, ema, opt_state, sampler, loss

    return train_step


def _mesh(n_data, n_model, devices):
    from jax.sharding import Mesh

    return Mesh(
        np.array(devices[: n_data * n_model]).reshape(n_data, n_model),
        ("data", "model"),
    )


def audit_config(name: str, n_devices: int = 8) -> dict:
    """Compile one config's train step and return its collective stats."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    devices = jax.devices("cpu")[:n_devices]

    if name in ("dp8", "fsdp8", "dp4tp2", "fsdp4tp2"):
        tp = 2 if "tp2" in name else 1
        mesh = _mesh(n_devices // tp, tp, devices)
        state = _model_and_state(mesh, fsdp=name.startswith("fsdp"))
        step = _train_step_fn(state)
        b = 2 * mesh.shape["data"]
        tokens = jax.device_put(
            jax.random.randint(
                state["key"], (b, state["S"], state["H"], state["W"]),
                0, state["K"],
            ),
            NamedSharding(mesh, P("data")),
        )
        args = (
            state["params"], state["ema"], state["opt_state"],
            state["sampler"], tokens, state["key"],
        )
        lowered = jax.jit(step).lower(*args)
    elif name == "sp2":
        # sequence-parallel attention grads (halo exchange over the frame
        # axis — mirrors __graft_entry__'s sequence-parallel leg)
        import jax.numpy as jnp
        from jax.sharding import Mesh

        from world_modelz_tpu.parallel.sequence import (
            make_seq_sharded_attention,
        )

        seq_mesh = Mesh(np.array(devices[:2]), ("data",))
        s_glob = 4  # 2 frames per shard
        fn = make_seq_sharded_attention(
            seq_mesh, extents=(1, 1, 1), heads=2, global_seq=s_glob
        )

        def loss(q, k, v):
            return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, s_glob, 4, 4, 16))
        x = jax.device_put(x, NamedSharding(seq_mesh, P(None, "data")))
        lowered = jax.jit(jax.grad(loss, argnums=(0, 1, 2))).lower(x, x, x)
    elif name == "pp2":
        # GPipe-over-ppermute pipeline grads (2 stages — mirrors
        # __graft_entry__'s pipeline leg)
        import jax.numpy as jnp
        from jax.sharding import Mesh

        from world_modelz_tpu.parallel.pipeline import (
            microbatch,
            pipeline_apply,
            stack_stage_params,
            unmicrobatch,
        )

        n_pipe, n_d = 2, n_devices // 2
        mesh = Mesh(
            np.array(devices).reshape(n_pipe, n_d), ("pipe", "data")
        )
        dim = 16
        rng = np.random.default_rng(0)

        def block(p, x):
            return x + jnp.tanh(x @ p["w1"] + p["b1"]) @ p["w2"]

        stacked = stack_stage_params([
            {
                "w1": jnp.asarray(rng.normal(size=(dim, 32)) * 0.3),
                "b1": jnp.zeros((32,)),
                "w2": jnp.asarray(rng.normal(size=(32, dim)) * 0.3),
            }
            for _ in range(n_pipe)
        ])
        xb = jnp.asarray(
            rng.normal(size=(4 * n_d, dim)).astype(np.float32)
        )

        def loss(stacked, x):
            y = unmicrobatch(
                pipeline_apply(
                    block, stacked, microbatch(x, 4), mesh,
                    data_axis="data",
                )
            )
            return jnp.mean(y**2)

        lowered = jax.jit(jax.grad(loss)).lower(stacked, xb)
    elif name == "ep8":
        # expert-parallel MoE FFN grads (8 experts over 8 devices — the
        # dispatch/combine einsums lower to all-to-alls)
        import jax.numpy as jnp
        from jax.sharding import Mesh

        from world_modelz_tpu.parallel.moe import (
            expert_shardings,
            moe_ffn,
            moe_init,
        )

        mesh = Mesh(np.array(devices), ("expert",))
        mp = moe_init(
            jax.random.PRNGKey(7), dim=16, hidden=32,
            num_experts=n_devices,
        )
        xe = jax.random.normal(jax.random.PRNGKey(8), (2, 16, 16))
        mp_s = jax.device_put(mp, expert_shardings(mesh))

        def loss(p, x):
            y, _ = moe_ffn(p, x, capacity=16)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        lowered = jax.jit(jax.grad(loss)).lower(mp_s, xe)
    else:
        raise ValueError(f"unknown config {name!r}")

    hlo = lowered.compile().as_text()
    stats = collective_stats(hlo)
    stats["config"] = name
    return stats


CONFIGS = ("dp8", "fsdp8", "dp4tp2", "fsdp4tp2", "sp2", "pp2", "ep8")


def main(argv=None):
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass
    if len(jax.devices("cpu")) < 8:
        sys.exit(
            "need 8 CPU devices: set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8"
        )
    results = []
    for name in CONFIGS:
        stats = audit_config(name)
        print(json.dumps(stats))
        results.append(stats)
    out = {
        "about": (
            "collective ops + result bytes per compiled training step, "
            "virtual 8-device CPU mesh (same SPMD partitioner as TPU); "
            "bytes = HLO result shapes of the collective ops"
        ),
        "configs": results,
    }
    os.makedirs(os.path.dirname(OUT_DEFAULT), exist_ok=True)
    with open(OUT_DEFAULT, "w") as f:
        json.dump(out, f, indent=1)
    print("->", OUT_DEFAULT)


if __name__ == "__main__":
    main()
