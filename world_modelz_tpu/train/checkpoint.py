"""Orbax checkpointing with the reference's embedded-config contract.

The reference bundles the full argparse namespace inside every checkpoint so
models can be rehydrated from the file alone (minecraft/main2.py:302-314,
resume at main.py:366-380). Here checkpoints are Orbax pytrees of
``{step, state..., config}`` where `config` is a JSON-able dict; `restore`
returns both, and trainers rebuild models from the embedded config exactly
like the reference.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def save_checkpoint(
    directory: str,
    step: int,
    state: Any,
    config: Optional[Dict[str, Any]] = None,
    keep: int = 0,
) -> str:
    """Write `state` (any pytree) + `config` under `directory/step_XXXXXXX`.

    With `keep` > 0, older step directories beyond the newest `keep` are
    deleted after a successful save (retention the reference lacked — its
    runs accumulated every 25k-step .pth file).
    """
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step:07d}")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    with open(os.path.join(path, "wmz_config.json"), "w") as f:
        json.dump({"step": step, "config": config or {}}, f, indent=2)
    if keep > 0:
        import shutil

        steps = sorted(
            d for d in os.listdir(directory) if d.startswith("step_")
        )
        for old in steps[:-keep]:
            shutil.rmtree(os.path.join(directory, old), ignore_errors=True)
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    steps = sorted(
        d for d in os.listdir(directory) if d.startswith("step_")
    )
    return os.path.join(directory, steps[-1]) if steps else None


def restore_checkpoint(
    path: str, target: Any = None
) -> Tuple[Any, int, Dict[str, Any]]:
    """Restore (state, step, config) from a checkpoint path.

    `target` (optional) gives the pytree structure/dtypes to restore into —
    pass the abstract state from a fresh init for sharded restores.
    """
    path = os.path.abspath(path)  # orbax/tensorstore requires absolute
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        state = ckptr.restore(path, item=jax.device_get(target))
    else:
        state = ckptr.restore(path)
    meta_path = os.path.join(path, "wmz_config.json")
    step, config = 0, {}
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        step, config = meta.get("step", 0), meta.get("config", {})
    return state, step, config
