"""Serving throughput: RolloutService end-to-end clips/sec.

Measures the production serve path (world_modelz_tpu/serve.py): N concurrent
clients submit seed clips; the service coalesces them into fixed-batch
compiled encode -> 30-iteration-unmask rollout -> decode programs. Timing is
honest on relayed TPU backends because every batch's result is materialized
to host numpy (`np.asarray`) before its futures resolve — wall-clock spans
real device work + readback, amortized over requests.

Run: python benchmarks/serve_bench.py [--requests 32] [--batch 8]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=32)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--iterations", type=int, default=30)
    p.add_argument("--platform", default="")
    p.add_argument("--mode", default="submit", choices=["submit", "session"])
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from world_modelz_tpu.utils import compcache

    compcache.enable()

    from world_modelz_tpu.models import VQAutoEncoder
    from world_modelz_tpu.models.video import VqVideoDiffusionModel
    from world_modelz_tpu.serve import RolloutService

    S, IMG = 6, 64
    tok = VQAutoEncoder(
        embedding_dim=64, num_embeddings=512, downscale_steps=3,
        hidden_planes=128, in_channels=1,
    )
    key = jax.random.PRNGKey(0)
    tok_state = tok.init(key, jnp.zeros((1, IMG, IMG, 1)))
    h = w = IMG // 8
    model = VqVideoDiffusionModel(
        data_shape=(S, h, w), dim=384, num_classes=512, extents=(3, 1, 1),
        depth=20, dim_head=128, mlp_dim=512, heads=1,
        use_checkpointing=False,
    )
    params = model.init(key, jnp.zeros((1, S, h, w), jnp.int32))["params"]
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )

    rng = np.random.default_rng(0)
    clips = rng.uniform(size=(args.requests, S, IMG, IMG, 1)).astype(
        np.float32
    )

    svc = RolloutService(
        tok, tok_state, model, params,
        num_frames=args.frames, num_iterations=args.iterations,
        batch_size=args.batch, max_wait_s=0.2,
    )
    try:
        # warm (compile) the FULL-batch rollout outside the timed window —
        # the compiled-size ladder means a single warm request would only
        # compile the size-1 program
        futs = [svc.submit(c) for c in clips[: args.batch]]
        [f.result() for f in futs]

        if args.mode == "session":
            # streaming: one session per stream, seed encoded once, each
            # generate() continues from the device-rolled token context
            sessions = [
                svc.open_session(clips[i % len(clips)])
                for i in range(args.batch)
            ]
            # at least one segment: --requests < --batch would otherwise
            # run zero generates and divide by ~0 wall-clock below
            segs = max(1, args.requests // args.batch)
            t0 = time.perf_counter()
            for _ in range(segs):
                futs = [s.generate_async() for s in sessions]
                outs = [f.result() for f in futs]
            dt = time.perf_counter() - t0
            n_done = segs * args.batch
        else:
            t0 = time.perf_counter()
            futs = [svc.submit(c) for c in clips]
            outs = [f.result() for f in futs]
            dt = time.perf_counter() - t0
            n_done = args.requests
    finally:
        svc.close()

    assert all(o.shape[0] == args.frames for o in outs)
    occ = svc.stats["requests"] / max(svc.stats["batched_rows"], 1)
    print(
        f"serve[{args.mode}] [{jax.default_backend()}]: {n_done} requests "
        f"({args.frames} frames, {args.iterations} iters each) in {dt:.2f}s "
        f"-> {n_done / dt:.2f} clips/sec, "
        f"{n_done * args.frames / dt:.1f} frames/sec, "
        f"batch occupancy {occ:.0%}, stats {svc.stats}"
    )


if __name__ == "__main__":
    main()
