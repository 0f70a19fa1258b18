"""Kernel benchmark: Pallas vs XLA reference on the current backend.

Model of the reference's Triton harness
(local_3d_attention_triton1.py:276-319): correctness diff + timed loops.

Timing methodology: each measurement is one jitted program containing a
`lax.scan` of chained kernel applications (the output feeds the next input,
forcing serial execution) ending in a scalar reduction whose value is read
back — on relayed TPU backends `block_until_ready` can return at enqueue
time, so only a value readback is an honest clock. Two scan lengths are
differenced to cancel RPC overhead. Run: `python benchmarks/kernel_bench.py`.
"""

import time

import jax
import jax.numpy as jnp

from world_modelz_tpu.kernels.local3d import local3d_attention_pallas
from world_modelz_tpu.kernels.vq_kernels import vq_encode_pallas
from world_modelz_tpu.models.attention import local3d_attention
from world_modelz_tpu.ops.vq import VQState, vq_decode, vq_encode

ITERS_SHORT = 5
ITERS_LONG = 25


def timed_scan(step_fn, x0):
    """Seconds per iteration: differenced chained scans with value readback."""
    import functools

    @functools.partial(jax.jit, static_argnames="iters")
    def chained(x, iters):
        def body(x, _):
            return step_fn(x), ()

        final, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(final.astype(jnp.float32))

    times = {}
    for iters in (ITERS_SHORT, ITERS_LONG):
        float(chained(x0, iters))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(x0, iters))
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    per_iter = (times[ITERS_LONG] - times[ITERS_SHORT]) / (
        ITERS_LONG - ITERS_SHORT
    )
    return per_iter, None


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

    # chain: x -> quantized(x) + tiny epsilon so the chain can't collapse
    def xla_step(x):
        idx = vq_encode(state, x[:, None, :]).reshape(-1)
        return vq_decode(state, idx[:, None]).reshape(n, d) * 0.999 + x * 0.001

    def pal_step(x):
        _, q = vq_encode_pallas(x, codebook[0])
        return q * 0.999 + x * 0.001

    # correctness first
    idx_xla = vq_encode(state, x[:, None, :]).reshape(-1)
    idx_pal, _ = vq_encode_pallas(x, codebook[0])
    match = int(jnp.sum(idx_xla == idx_pal))

    t_xla, _ = timed_scan(xla_step, x)
    t_pal, _ = timed_scan(pal_step, x)
    print(
        f"vq_encode      n={n} k={k} d={d}: "
        f"xla {t_xla*1e3:.3f} ms | pallas {t_pal*1e3:.3f} ms | "
        f"speedup {t_xla/t_pal:.2f}x | match {match}/{n}"
    )


def bench_local3d(b, s, h, w, inner, extents, heads):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, s, h, w, inner))
    k = jax.random.normal(key, (b, s, h, w, inner))
    v = jax.random.normal(key, (b, s, h, w, inner))

    diff = float(
        jnp.abs(
            local3d_attention(q, k, v, extents, heads)
            - local3d_attention_pallas(q, k, v, extents, heads)
        ).max()
    )

    def xla_step(q):
        return local3d_attention(q, k, v, extents, heads)

    def pal_step(q):
        return local3d_attention_pallas(q, k, v, extents, heads)

    t_xla, _ = timed_scan(xla_step, q)
    t_pal, _ = timed_scan(pal_step, q)
    print(
        f"local3d_attn   b={b} s={s} hw={h}x{w} dh={inner} e={extents}: "
        f"xla {t_xla*1e3:.3f} ms | pallas {t_pal*1e3:.3f} ms | "
        f"speedup {t_xla/t_pal:.2f}x | maxdiff {diff:.2e}"
    )


if __name__ == "__main__":
    import sys

    print("backend:", jax.default_backend())
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "vq"):
        bench_vq()
    if which in ("all", "attn"):
        # minecraft/sparse volume scale (the production shape)
        bench_local3d(2, 32, 16, 16, 128, (3, 1, 1), 1)
    if which == "attn-small":
        # reference model #3 scale (results/README.md:13-24)
        bench_local3d(8, 6, 16, 16, 128, (3, 1, 1), 1)
