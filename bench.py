"""Headline benchmark: VQ-VAE tokenization throughput (encode + decode).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 10,000 frames/sec/chip on TPU for the
reference-scale tokenizer (embedding_dim 64, 512 codes, 3 downscale steps,
hidden 128 — minecraft/train_vqae.py:83-86 defaults) on 64x64 RGB frames.

Methodology (important on relayed/remote TPU backends, where
`block_until_ready` can return at enqueue time and naive timing measures RPC
dispatch, not compute): ONE jitted program runs a `lax.scan` of CHAIN
encode+decode roundtrips (serial data dependence) and returns
(frames, checksum). A measurement dispatches k invocations feeding frames
output->input (compute serializes on-device; dispatch overhead overlaps),
then reads back only the LAST checksum's value — the bytes cannot arrive
before all k*CHAIN roundtrips finish. Two k values are timed and differenced,
cancelling the constant dispatch/readback overhead. Compute is bfloat16
(MXU-native).

Robustness (round-2 lesson: the driver artifact timed out on cold relay
compiles while the capability itself was fine — VERDICT.md "Missing #1"):
  * persistent compilation cache (utils/compcache) — reruns skip the
    1-4 minute relay compile entirely;
  * a single compiled program (round 1-2 compiled two);
  * a soft wall-clock budget that stops extra trials but still prints the
    JSON line from completed ones;
  * a hard watchdog that, if the process is about to blow the external
    timeout, prints the last successful result (clearly marked "stale")
    or a zero-value line — never silence.
"""

import functools
import json
import os
import sys
import threading
import time

T0 = time.monotonic()
BUDGET_SOFT = float(os.environ.get("WMZ_BENCH_BUDGET_S", "300"))
BUDGET_HARD = float(os.environ.get("WMZ_BENCH_BUDGET_HARD_S", "420"))
_HERE = os.path.dirname(os.path.abspath(__file__))
LAST_PATH = os.path.join(_HERE, "artifacts", "bench_last.json")

BATCH = 256
IMG = 64
CHAIN = 10  # roundtrips inside the one compiled program
K_LO, K_HI = 1, 5  # invocation counts differenced per trial
TRIALS = 3

_emit_lock = threading.Lock()
_emitted = False


def _emit(result: dict) -> None:
    """Print the one JSON line exactly once (main path or watchdog)."""
    global _emitted
    with _emit_lock:
        if _emitted:
            return
        _emitted = True
        print(json.dumps(result), flush=True)


def _watchdog_fire() -> None:
    try:
        with open(LAST_PATH) as f:
            r = json.load(f)
        r["unit"] = str(r.get("unit", "")) + " [stale: live bench hit hard budget]"
        r["stale"] = True
        _emit(r)
    except Exception:
        _emit(
            {
                "metric": "vqae_tokenize_frames_per_sec",
                "value": 0.0,
                "unit": "frames/sec/chip (hard budget hit before first result)",
                "vs_baseline": 0.0,
            }
        )
    os._exit(0)


def elapsed() -> float:
    return time.monotonic() - T0


def main():
    watchdog = threading.Timer(BUDGET_HARD, _watchdog_fire)
    watchdog.daemon = True
    watchdog.start()

    from world_modelz_tpu.utils import compcache

    compcache.enable()

    import jax
    import jax.numpy as jnp

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
    state = jax.device_put(state)

    @jax.jit
    def roundtrips(frames):
        def body(x, _):
            return tok.decode(state, tok.encode(state, x)), ()

        final, _ = jax.lax.scan(body, frames, None, length=CHAIN)
        return final, jnp.sum(final.astype(jnp.float32))

    key, k = jax.random.split(key)
    frames0 = jax.device_put(jax.random.uniform(k, (BATCH, IMG, IMG, 3), jnp.bfloat16))

    # Compile + warm the ONE program (cached across runs by compcache).
    _, chk = roundtrips(frames0)
    float(chk)

    def measure(k_calls: int) -> float:
        frames = frames0
        chk = None
        t0 = time.perf_counter()
        for _ in range(k_calls):
            frames, chk = roundtrips(frames)  # async dispatch, device-chained
        float(chk)  # single value readback fences ALL k*CHAIN roundtrips
        return time.perf_counter() - t0

    best = {K_LO: float("inf"), K_HI: float("inf")}
    trials_done = 0
    for t in range(TRIALS):
        best[K_LO] = min(best[K_LO], measure(K_LO))
        best[K_HI] = min(best[K_HI], measure(K_HI))
        trials_done += 1
        if elapsed() > BUDGET_SOFT:
            break  # soft budget: report what we have (>=1 full trial)

    per_iter = (best[K_HI] - best[K_LO]) / ((K_HI - K_LO) * CHAIN)
    fps = BATCH / per_iter
    result = {
        "metric": "vqae_tokenize_frames_per_sec",
        "value": round(fps, 1),
        "unit": f"frames/sec/chip ({backend})",
        "vs_baseline": round(fps / 10_000.0, 4),
    }
    try:
        os.makedirs(os.path.dirname(LAST_PATH), exist_ok=True)
        with open(LAST_PATH, "w") as f:
            json.dump(
                dict(result, trials=trials_done, wall_s=round(elapsed(), 1)), f
            )
    except OSError:
        pass
    _emit(result)
    watchdog.cancel()
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
