"""Multi-host (DCN) simulation: 2 real processes x 4 virtual CPU devices.

The reference has no distributed code at all (SURVEY.md §2.2); this layer is
new design. `parallel/distributed.py` claims the global-view pjit programs
work unchanged once `jax.distributed.initialize` wires the processes — this
test actually runs that path: two OS processes form one 8-device JAX job
(gloo CPU collectives standing in for DCN), each feeds its process-local
half of a batch via `shard_host_batch`, and a data-parallel VQ-EMA training
step (whose codebook update is a cross-device psum) must produce the exact
single-process result in both processes.

Marked slow: spawns subprocesses, each paying JAX startup (~20 s).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

WORKER = """
import sys

import jax

jax.config.update("jax_platforms", "cpu")

pid, nprocs, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)

from world_modelz_tpu.parallel.distributed import (
    initialize_distributed,
    shard_host_batch,
)

initialize_distributed(f"localhost:{port}", num_processes=nprocs, process_id=pid)
assert jax.process_count() == nprocs
assert len(jax.devices()) == nprocs * 4, len(jax.devices())

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from world_modelz_tpu.ops.vq import vq_apply, vq_init

mesh = Mesh(np.array(jax.devices()), ("data",))
state = vq_init(
    jax.random.PRNGKey(1), num_latents=1, num_embeddings=8, embedding_dim=8
)

x_global = np.random.default_rng(0).normal(size=(16, 1, 8)).astype(np.float32)
rows = 16 // nprocs
local = x_global[pid * rows : (pid + 1) * rows]
x = shard_host_batch(local, mesh)

rep = NamedSharding(mesh, P())

def step(state, x):
    out, new_state = vq_apply(state, x, train=True)
    return new_state.codebook, out.perplexity

codebook, ppl = jax.jit(step, out_shardings=(rep, rep))(state, x)
np.save(f"{outdir}/codebook_{pid}.npy", np.asarray(codebook))
np.save(f"{outdir}/ppl_{pid}.npy", np.asarray(ppl))
print(f"worker {pid} done", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_vq_matches_single_process(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port),
             str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    # single-process reference on the full batch
    import jax

    from world_modelz_tpu.ops.vq import vq_apply, vq_init

    state = vq_init(
        jax.random.PRNGKey(1), num_latents=1, num_embeddings=8,
        embedding_dim=8,
    )
    x_global = np.random.default_rng(0).normal(size=(16, 1, 8)).astype(
        np.float32
    )
    out, ref_state = vq_apply(state, x_global, train=True)

    cb0 = np.load(tmp_path / "codebook_0.npy")
    cb1 = np.load(tmp_path / "codebook_1.npy")
    np.testing.assert_allclose(cb0, cb1, rtol=0, atol=0)  # replicated agree
    np.testing.assert_allclose(
        cb0, np.asarray(ref_state.codebook), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.load(tmp_path / "ppl_0.npy"), float(out.perplexity), rtol=1e-5
    )
