"""Headline benchmark: VQ-VAE tokenization throughput (encode + decode).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 10,000 frames/sec/chip on TPU for the
reference-scale tokenizer (embedding_dim 64, 512 codes, 3 downscale steps,
hidden 128 — minecraft/train_vqae.py:83-86 defaults) on 64x64 RGB frames.

The hot path runs in bfloat16 (MXU-native) with the batch resident on
device; throughput counts a full encode (image -> int tokens) plus decode
(tokens -> image) per frame.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from world_modelz_tpu.models import VQAutoEncoder

    backend = jax.default_backend()
    batch = 256
    img = 64
    iters = 20

    tok = VQAutoEncoder(
        embedding_dim=64,
        num_embeddings=512,
        downscale_steps=3,
        hidden_planes=128,
        in_channels=3,
    )
    key = jax.random.PRNGKey(0)
    state = tok.init(key, jnp.zeros((1, img, img, 3)))

    # bfloat16 compute for the conv stacks: cast params + inputs; the VQ
    # argmin runs in f32 (distances accumulate in f32 either way)
    state = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32
        else x,
        state,
    )

    @jax.jit
    def tokenize_roundtrip(state, frames):
        tokens = tok.encode(state, frames)
        recon = tok.decode(state, tokens)
        return tokens, recon

    frames = jax.device_put(
        jax.random.uniform(key, (batch, img, img, 3), jnp.bfloat16)
    )

    # warmup / compile
    tokens, recon = tokenize_roundtrip(state, frames)
    jax.block_until_ready((tokens, recon))

    t0 = time.perf_counter()
    for _ in range(iters):
        tokens, recon = tokenize_roundtrip(state, frames)
    jax.block_until_ready((tokens, recon))
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
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
