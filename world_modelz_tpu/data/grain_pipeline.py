"""Grain-backed input pipeline: deterministic, checkpointable batching.

The reference's loaders are torch `DataLoader`s (minecraft/train_vqae.py:283,
num_workers=4) whose shuffle state dies with the process — resuming a run
re-shuffles from scratch. This module wraps any random-access clip dataset
(``__len__`` + ``__getitem__``, e.g. `data.moving_mnist.MovingMNIST` or
`data.images.FileListImageDataset`) in a Grain ``DataLoader``:

- **Determinism**: the `IndexSampler` derives every record index from
  (seed, step), so two runs with the same seed see the identical record
  stream — across restarts, worker counts, and host counts.
- **Checkpointability**: `get_state()`/`set_state()` round-trip the
  iterator position (bytes), so the *input pipeline* resumes exactly where
  the model checkpoint left it — no repeated or skipped examples after a
  preemption (the chained-resume TPU driver restarts segments ~every 40
  min; see scripts/chain_train.sh).
- **Multi-host sharding**: `shard_index/shard_count` map to Grain's
  `ShardOptions`, giving each DCN process a disjoint record slice — the
  per-host half of data parallelism (`parallel/distributed.py` owns the
  device half).
- **Process-parallel decode**: `worker_count > 0` moves dataset
  ``__getitem__`` into Grain worker processes (the torch-`num_workers`
  analog; our procedural datasets are cheap enough that 0 is the default).

Batches come out as stacked numpy arrays, ready for `PrefetchIterator`
(which owns device placement / sharding).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np


class GrainClipPipeline:
    """Deterministic batch stream over a random-access dataset.

    Args:
      dataset: random-access source (``__len__``/``__getitem__``). Items
        must be numpy arrays of one shape.
      batch_size: batch size (drop-remainder).
      seed: sampler seed; with ``shuffle`` this fixes the whole epoch
        permutation sequence.
      shuffle: reshuffled-every-epoch random order (seeded) vs sequential.
      num_epochs: None = stream forever.
      shard_index/shard_count: this host's slice for multi-host training.
      worker_count: Grain worker processes (0 = in-process).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        seed: int = 0,
        shuffle: bool = True,
        num_epochs: Optional[int] = None,
        shard_index: int = 0,
        shard_count: int = 1,
        worker_count: int = 0,
    ):
        import grain

        self.batch_size = batch_size
        self._shard = grain.sharding.ShardOptions(
            shard_index=shard_index,
            shard_count=shard_count,
            drop_remainder=True,
        )
        sampler = grain.samplers.IndexSampler(
            num_records=len(dataset),
            shard_options=self._shard,
            shuffle=shuffle,
            num_epochs=num_epochs,
            seed=seed,
        )
        # record-level iteration (batching happens in sample_batch): the
        # trainers pull train batches AND differently-sized eval batches
        # from one stream, and a record-granular iterator keeps the
        # checkpoint state exact at any batch size
        self._loader = grain.DataLoader(
            data_source=dataset,
            sampler=sampler,
            worker_count=worker_count,
        )
        self._it = iter(self._loader)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        return self.sample_batch(self.batch_size)

    # the trainers' clip_fn protocol: (b) -> (b, ...) stacked records
    def sample_batch(self, batch_size: Optional[int] = None) -> np.ndarray:
        n = self.batch_size if batch_size is None else batch_size
        return np.stack([next(self._it) for _ in range(n)], axis=0)

    # -- input-pipeline checkpointing -----------------------------------
    def get_state(self) -> bytes:
        return self._it.get_state()

    def set_state(self, state: bytes) -> None:
        self._it.set_state(state)

    def close(self) -> None:
        """Trainer-sampler protocol hook (BufferedTrajectorySampler has
        worker threads to join; Grain workers are owned by the iterator
        and shut down with it)."""
        it, self._it = self._it, iter(())
        del it
