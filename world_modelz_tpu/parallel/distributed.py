"""Multi-host (multi-slice) initialization.

Single-program multi-host training over DCN (SURVEY.md §5 'distributed
communication backend'): each host process runs the same trainer; JAX wires
the slice topology via `jax.distributed.initialize`, after which
`jax.devices()` spans all hosts and the global-view pjit programs in this
package work unchanged — the mesh in `parallel.mesh.make_mesh` simply covers
more devices. Host data loading follows the reference's
buffer-per-process design (buffered_traj_sampler.py): each process feeds its
local devices (`jax.local_devices()`) and shards its batch slice with
`jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX; no-op for single-process runs.

    With no arguments, relies on the cluster environment (TPU pod metadata /
    `JAX_COORDINATOR_ADDRESS` etc.); arguments override for manual setups.
    Call once, before any backend use, in every process.

    On a CPU backend (the DCN-simulation path: N processes x M virtual
    devices on one machine, tests/test_distributed.py), cross-process
    collectives need an explicit implementation; gloo ships with jaxlib.
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        # only when CPU is the SELECTED platform (list head), not merely
        # present in the priority list — e.g. "axon,cpu" TPU-relay runs must
        # not have their CPU fallback collectives reconfigured
        head = str(jax.config.jax_platforms or "").split(",")[0].strip()
        if head == "cpu":
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older jaxlib without the option; TPU paths never need it
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    print(
        f"distributed: process {jax.process_index()}/{jax.process_count()}, "
        f"{len(jax.local_devices())} local of {len(jax.devices())} devices"
    )


def shard_host_batch(batch, mesh, spec=None):
    """Assemble a process-local host batch into a globally sharded array.

    Each process passes its local slice (global_batch / process_count rows);
    the result is a global jax.Array sharded over the mesh's 'data' axis.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, spec if spec is not None else P("data"))
    return jax.make_array_from_process_local_data(sharding, batch)
