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
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def save_checkpoint(
    directory: str,
    step: int,
    state: Any,
    config: Optional[Dict[str, Any]] = None,
    keep: int = 0,
    extra_files: Optional[Dict[str, bytes]] = None,
) -> str:
    """Write `state` (any pytree) + `config` under `directory/step_XXXXXXX`.

    With `keep` > 0, older step directories beyond the newest `keep` are
    deleted after a successful save (retention the reference lacked — its
    runs accumulated every 25k-step .pth file). `extra_files` (name ->
    bytes, e.g. the Grain input-pipeline position sidecar) land inside the
    checkpoint dir BEFORE `wmz_config.json`: the config file is the
    completeness marker `latest_checkpoint` keys on, so a complete
    checkpoint always has its sidecars.
    """
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step:07d}")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    for name, payload in (extra_files or {}).items():
        with open(os.path.join(path, name), "wb") as f:
            f.write(payload)
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
    """Newest COMPLETE checkpoint under `directory` (or None).

    Orbax writes to `step_N.orbax-checkpoint-tmp` and renames on success;
    the embedded config lands right after the rename. A segment killed
    mid-save (the chained-resume protocol kills trainers on a timeout)
    must therefore never surface the tmp dir, nor a renamed dir whose
    `wmz_config.json` did not land — both restore-breaking.
    """
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    steps = sorted(
        d
        for d in os.listdir(directory)
        if d.startswith("step_")
        and ".orbax-checkpoint-tmp" not in d
        and os.path.isfile(os.path.join(directory, d, "wmz_config.json"))
    )
    return os.path.join(directory, steps[-1]) if steps else None


class AsyncCheckpointSaver:
    """Overlap checkpoint writes with training.

    `save_checkpoint` blocks the train loop on a device->host pull of the
    whole state (hundreds of MB over the TPU relay) plus the disk write.
    This saver instead snapshots the state into FRESH device buffers (an
    on-device copy, so the trainers' donated input buffers can be
    invalidated by the next dispatch without racing the save) and runs the
    device_get + orbax write on a background thread.

    At most one save is in flight: a new `save()` (and `wait()`) joins the
    previous one first and re-raises any error it hit. Call `wait()` before
    reading `latest_checkpoint` (e.g. the NaN-guard restore path) and on
    trainer exit.
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None
        self._copy = jax.jit(
            lambda s: jax.tree_util.tree_map(jnp_copy, s)
        )

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def save(
        self,
        directory: str,
        step: int,
        state: Any,
        config: Optional[Dict[str, Any]] = None,
        keep: int = 0,
        extra_files: Optional[Dict[str, bytes]] = None,
    ) -> str:
        self.wait()
        snapshot = self._copy(state)  # fresh buffers: donation-safe
        path = os.path.join(
            os.path.abspath(directory), f"step_{step:07d}"
        )

        def _write():
            try:
                save_checkpoint(
                    directory, step, snapshot, config, keep, extra_files
                )
            except BaseException as e:  # surface on the next save/wait
                self._error = e

        self._thread = threading.Thread(target=_write, daemon=True)
        self._thread.start()
        return path


def jnp_copy(x):
    import jax.numpy as jnp

    return jnp.asarray(x).copy() if hasattr(x, "dtype") else x


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
