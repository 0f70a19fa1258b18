"""Learning-rate schedules as optax schedule functions.

Parity with the reference's scheduler usage:
- linear warmup then cosine annealing (GradualWarmupScheduler wrapping
  CosineAnnealingLR, minecraft/warmup_scheduler.py:7-66 as configured at
  minecraft/main2.py:457-458)
- per-epoch step decay (StepLR(step_size=3, gamma=0.5),
  minecraft/train_vqae.py:304)
"""

from __future__ import annotations

import jax
import optax


def host_schedule(schedule: optax.Schedule):
    """Wrap a schedule so reading the current lr never touches the device.

    Calling an optax schedule eagerly dispatches its jnp ops to the
    default backend — on a relayed TPU that is a full RPC roundtrip per
    call (measured ~166 ms per log point at log_interval=10, 37% of the
    m3 trainer's wall clock). Jitting the schedule onto the host CPU
    makes log-point lr reads microsecond-scale and device-free. The
    optimizer's in-step schedule is unaffected (it is traced into the
    jitted update); this is only for host-side logging.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        jitted = jax.jit(schedule)

    def read(step) -> float:
        with jax.default_device(cpu):
            return float(jitted(step))

    return read


def warmup_cosine_schedule(
    base_lr: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    """lr ramps 0 -> base_lr over `warmup_steps`, then cosine-anneals to 0.

    The cosine phase spans `total_steps` of its own (the reference's
    CosineAnnealingLR keeps an independent step counter that starts when the
    warmup finishes, warmup_scheduler.py:59-61).
    """
    if warmup_steps <= 0:
        return optax.cosine_decay_schedule(base_lr, decay_steps=total_steps)
    warmup = optax.linear_schedule(
        init_value=0.0, end_value=base_lr, transition_steps=warmup_steps
    )
    cosine = optax.cosine_decay_schedule(base_lr, decay_steps=total_steps)
    return optax.join_schedules([warmup, cosine], boundaries=[warmup_steps])


def step_decay_schedule(
    base_lr: float, steps_per_epoch: int, epoch_step_size: int = 3, gamma: float = 0.5
) -> optax.Schedule:
    """Halve the lr every `epoch_step_size` epochs (train_vqae.py:304)."""
    return optax.exponential_decay(
        init_value=base_lr,
        transition_steps=epoch_step_size * steps_per_epoch,
        decay_rate=gamma,
        staircase=True,
    )
