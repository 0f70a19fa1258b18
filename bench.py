"""Headline benchmark: VQ-VAE tokenization throughput (encode + decode).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 10,000 frames/sec/chip on TPU for the
reference-scale tokenizer (embedding_dim 64, 512 codes, 3 downscale steps,
hidden 128 — minecraft/train_vqae.py:83-86 defaults) on 64x64 RGB frames.

Methodology (important on relayed/remote TPU backends, where
`block_until_ready` can return at enqueue time and naive timing measures RPC
dispatch, not compute): each measurement is a single jitted program running a
`lax.scan` of chained encode+decode roundtrips (serial data dependence) that
ends in a scalar reduction whose VALUE is read back to the host — the bytes
cannot arrive before the compute finishes. Two scan lengths are timed and
differenced, cancelling the constant RPC/readback overhead. Compute runs in
bfloat16 (MXU-native).
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

BATCH = 256
IMG = 64
ITERS_SHORT = 10
ITERS_LONG = 40
TRIALS = 3


def main():
    from world_modelz_tpu.models import VQAutoEncoder

    backend = jax.default_backend()
    tok = VQAutoEncoder(
        embedding_dim=64,
        num_embeddings=512,
        downscale_steps=3,
        hidden_planes=128,
        in_channels=3,
    )
    key = jax.random.PRNGKey(0)
    state = tok.init(key, jnp.zeros((1, IMG, IMG, 3)))
    state = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32
        else x,
        state,
    )

    @functools.partial(jax.jit, static_argnames="iters")
    def chained_sum(state, frames, iters):
        def body(x, _):
            return tok.decode(state, tok.encode(state, x)), ()

        final, _ = jax.lax.scan(body, frames, None, length=iters)
        return jnp.sum(final.astype(jnp.float32))

    def measure(iters):
        nonlocal key
        key, k = jax.random.split(key)
        frames = jax.device_put(
            jax.random.uniform(k, (BATCH, IMG, IMG, 3), jnp.bfloat16)
        )
        float(chained_sum(state, frames, iters))  # compile + warm
        best = float("inf")
        for _ in range(TRIALS):
            key, k = jax.random.split(key)
            frames = jax.device_put(
                jax.random.uniform(k, (BATCH, IMG, IMG, 3), jnp.bfloat16)
            )
            t0 = time.perf_counter()
            float(chained_sum(state, frames, iters))  # value readback
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = measure(ITERS_SHORT)
    t_long = measure(ITERS_LONG)
    per_iter = (t_long - t_short) / (ITERS_LONG - ITERS_SHORT)

    fps = BATCH / per_iter
    result = {
        "metric": "vqae_tokenize_frames_per_sec",
        "value": round(fps, 1),
        "unit": f"frames/sec/chip ({backend})",
        "vs_baseline": round(fps / 10_000.0, 4),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
