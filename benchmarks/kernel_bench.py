"""Kernel benchmark: Pallas vs XLA reference on the current backend.

Model of the reference's Triton harness
(local_3d_attention_triton1.py:276-319): correctness diff + timed loops.
Run on TPU: `python benchmarks/kernel_bench.py`.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from world_modelz_tpu.kernels.local3d import local3d_attention_pallas
from world_modelz_tpu.kernels.vq_kernels import vq_encode_pallas
from world_modelz_tpu.models.attention import local3d_attention
from world_modelz_tpu.ops.vq import VQState, vq_encode


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def bench_vq():
    n, d, k = 16384, 64, 512
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, d))
    codebook = jax.random.normal(key, (1, k, d))
    state = VQState(
        codebook=codebook,
        cluster_size=jnp.ones((1, k)),
        activation_count=jnp.zeros((1, k)),
        accumulated_error=jnp.zeros((1, k)),
    )

    xla_fn = jax.jit(lambda x: vq_encode(state, x[:, None, :]).reshape(-1))
    pal_fn = jax.jit(
        lambda x: vq_encode_pallas(
            x, codebook[0], return_quantized=False
        )[0]
    )

    t_xla, idx_xla = timed(xla_fn, x)
    t_pal, idx_pal = timed(pal_fn, x)
    match = int(jnp.sum(idx_xla == idx_pal))
    print(
        f"vq_encode      n={n} k={k} d={d}: "
        f"xla {t_xla*1e3:.3f} ms | pallas {t_pal*1e3:.3f} ms | "
        f"speedup {t_xla/t_pal:.2f}x | match {match}/{n}"
    )


def bench_local3d():
    # reference model #3 scale (results/README.md:13-24): extents (3,1,1),
    # 16x16 grids, dim_head 128, heads 1
    b, s, h, w, inner = 8, 6, 16, 16, 128
    extents, heads = (3, 1, 1), 1
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, s, h, w, inner))
    k = jax.random.normal(key, (b, s, h, w, inner))
    v = jax.random.normal(key, (b, s, h, w, inner))

    xla_fn = jax.jit(lambda q, k, v: local3d_attention(q, k, v, extents, heads))
    pal_fn = jax.jit(
        lambda q, k, v: local3d_attention_pallas(q, k, v, extents, heads)
    )

    t_xla, o_xla = timed(xla_fn, q, k, v)
    t_pal, o_pal = timed(pal_fn, q, k, v)
    diff = float(jnp.abs(o_xla - o_pal).max())
    print(
        f"local3d_attn   b={b} s={s} hw={h}x{w} dh={inner}: "
        f"xla {t_xla*1e3:.3f} ms | pallas {t_pal*1e3:.3f} ms | "
        f"speedup {t_xla/t_pal:.2f}x | maxdiff {diff:.2e}"
    )

    # minecraft/sparse scale: S=32 frames
    b2, s2 = 2, 32
    q2 = jax.random.normal(key, (b2, s2, h, w, inner))
    k2 = jax.random.normal(key, (b2, s2, h, w, inner))
    v2 = jax.random.normal(key, (b2, s2, h, w, inner))
    t_xla2, _ = timed(xla_fn, q2, k2, v2, iters=10)
    t_pal2, _ = timed(pal_fn, q2, k2, v2, iters=10)
    print(
        f"local3d_attn   b={b2} s={s2} hw={h}x{w} dh={inner}: "
        f"xla {t_xla2*1e3:.3f} ms | pallas {t_pal2*1e3:.3f} ms | "
        f"speedup {t_xla2/t_pal2:.2f}x"
    )


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    bench_vq()
    bench_local3d()
