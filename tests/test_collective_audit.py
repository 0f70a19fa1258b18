"""Collective-pattern regression tests (benchmarks/collective_audit.py).

Pins the communication pattern each parallel config compiles to on the
virtual 8-device mesh (same SPMD partitioner as TPU), so a sharding
regression that silently inserts a per-step param all-gather (or turns
the halo exchange into all-gathers) fails CI instead of surfacing as a
mystery slowdown on real multi-chip hardware. Reference values:
artifacts/collective_audit.json.
"""

import numpy as np
import pytest

from benchmarks.collective_audit import audit_config, collective_stats


def test_hlo_collective_parser():
    hlo = """
  %ar = f32[16,32]{1,0} all-reduce(f32[16,32]{1,0} %x), replica_groups={}
  %ag.1 = (f32[8]{0}, f32[8]{0}) all-gather-start(f32[1]{0} %y), dim=0
  %cp = bf16[4,2]{1,0} collective-permute(bf16[4,2]{1,0} %z)
  %other = f32[2]{0} add(f32[2]{0} %a, f32[2]{0} %b)
"""
    s = collective_stats(hlo)
    assert s["all-reduce"] == {"count": 1, "bytes": 16 * 32 * 4}
    assert s["all-gather"] == {"count": 1, "bytes": 2 * 8 * 4}
    assert s["collective-permute"] == {"count": 1, "bytes": 4 * 2 * 2}
    assert s["reduce-scatter"]["count"] == 0


def test_dp_is_allreduce_only():
    """Plain DP must stay all-reduce-only: gradients are the ONLY
    per-step communication. A parameter all-gather appearing here is a
    sharding bug (params are replicated)."""
    s = audit_config("dp8")
    assert s["all-reduce"]["count"] >= 1
    assert s["all-reduce"]["bytes"] >= 20_000  # the grad payload
    # tiny scalar gathers (sampler/loss bookkeeping) are fine; a param
    # gather would add tens of kilobytes
    assert s["all-gather"]["bytes"] < 2_000
    assert s["reduce-scatter"]["count"] == 0
    assert s["collective-permute"]["count"] == 0


def test_fsdp_gathers_params():
    """FSDP/ZeRO must gather the sharded params per step (that is the
    scheme's defining traffic) — substantially more gather bytes than
    plain DP."""
    s = audit_config("fsdp8")
    assert s["all-gather"]["bytes"] > 10_000
    assert s["all-gather"]["count"] >= 4


def test_seq_parallel_is_pure_halo():
    """Sequence parallelism must communicate ONLY via halo exchanges
    (collective-permute of the +-es boundary frames) — an all-gather of
    the full sequence would defeat the sharding."""
    s = audit_config("sp2")
    assert s["collective-permute"]["count"] >= 2
    assert s["all-gather"]["count"] == 0
    assert s["all-reduce"]["count"] == 0


def test_pipeline_uses_permutes():
    """The GPipe schedule moves microbatch activations between stages
    with collective-permutes."""
    s = audit_config("pp2")
    assert s["collective-permute"]["count"] >= 2
