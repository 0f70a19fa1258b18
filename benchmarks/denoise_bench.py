"""Diffusion denoise throughput: model forwards/sec for the flagship
denoiser (the BASELINE.json 'diffusion denoise steps/sec' metric).

One denoise step = a full VqVideoDiffusionModel forward over a
(B, S, H, W) token clip — the unit of work of the 30-iteration unmask
sampler (main2.py:81) and of the sparse sweep. Timed with the chained-scan +
value-readback methodology (see bench.py docstring). Compares the XLA and
Pallas attention backends.

Run: python benchmarks/denoise_bench.py [xla|pallas|both]
"""

import sys
import time

import jax
import jax.numpy as jnp

from world_modelz_tpu.models.video import VqVideoDiffusionModel
from world_modelz_tpu.utils.profiling import benchmark_chained

# reference model #3 scale (results/README.md:13-24): dim 384, depth 20,
# extents (3,1,1), heads 1, dim_head 128 over 6x16x16 volumes
B, S, H, W = 8, 6, 16, 16
K = 512


def bench(backend: str):
    model = VqVideoDiffusionModel(
        data_shape=(S, H, W),
        dim=384,
        num_classes=K,
        extents=(3, 1, 1),
        depth=20,
        dim_head=128,
        mlp_dim=512,
        heads=1,
        backend=backend,
    )
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (B, S, H, W), 0, K + 1)
    params = model.init(key, tokens)["params"]
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32
        else x,
        params,
    )

    def denoise_step(tokens):
        logits = model.apply({"params": params}, tokens)
        draw = jnp.argmax(logits, axis=-1).astype(tokens.dtype)
        return tokens.at[:, -1].set(draw)

    per_iter = benchmark_chained(denoise_step, tokens, 3, 13)
    print(
        f"denoise fwd [{backend:6s}] dim=384 depth=20 b={B} s={S} "
        f"{H}x{W}: {per_iter*1e3:.2f} ms/step -> "
        f"{1/per_iter:,.1f} steps/sec ({B/per_iter:,.1f} clip-steps/sec)"
    )
    return per_iter


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    print("backend:", jax.default_backend())
    if which in ("xla", "both"):
        bench("xla")
    if which in ("pallas", "both"):
        bench("pallas")
