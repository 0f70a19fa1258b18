"""Full training-step throughput: XLA vs Pallas attention backend.

Measures fwd+bwd+AdamW of the video-diffusion denoiser at reference model #3
scale — the end-to-end number a training run actually sees. Chained-scan +
value-readback methodology (see bench.py docstring).

Run: python benchmarks/train_step_bench.py [xla|pallas|both]
"""

import sys

import jax
import jax.numpy as jnp
import optax

from world_modelz_tpu.models.video import VqVideoDiffusionModel
from world_modelz_tpu.utils.profiling import benchmark_chained

B, S, H, W = 8, 6, 16, 16
K = 512


def bench(backend: str, bf16: bool = False):
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
        # pallas custom_vjp already rematerializes; avoid double remat on xla
        use_checkpointing=(backend == "xla"),
    )
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (B, S, H, W), 0, K + 1)
    target = jax.random.randint(key, (B, H, W), 0, K)
    params = model.init(key, tokens)["params"]
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)

    def train_step(carry):
        params, opt_state = carry

        def loss_fn(p):
            if bf16:
                p = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32
                    else x,
                    p,
                )
            logits = model.apply({"params": p}, tokens).astype(jnp.float32)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, K), target.reshape(-1)
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_opt)

    per_iter = benchmark_chained(train_step, (params, opt_state), 2, 8)
    tag = backend + ("+bf16" if bf16 else "")
    print(
        f"train step [{tag:11s}] dim=384 depth=20 b={B}: "
        f"{per_iter*1e3:.2f} ms/step -> {1/per_iter:.1f} steps/sec"
    )
    return per_iter


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    print("backend:", jax.default_backend())
    if which in ("xla", "both"):
        bench("xla")
    if which in ("pallas", "both"):
        bench("pallas")
    if which in ("bf16", "both"):
        bench("pallas", bf16=True)
