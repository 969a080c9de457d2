"""Multi-process eval aggregation.

TPU-native parity for the reference's DDP eval gather (pl/model.py:194-197:
each rank evaluates alternating batches independently, then
`all_gather_object` merges the per-query result lists). The SPMD
equivalent here:

  1. each process takes the strided shard `rank::nprocs` of the test set
     (`process_shard_indices`) and evaluates it on its process-local mesh
     — no cross-process collectives inside the eval step;
  2. per-query metric arrays are padded to the common shard capacity and
     `jax.experimental.multihost_utils.process_allgather`'d (gloo on CPU,
     ICI/DCN collectives on TPU);
  3. every process trims the padding, restores test-set order, and runs
     the identical per-scene reduction.

Exercised end-to-end by tests/test_multihost.py with two coordinated CPU
processes (`jax.distributed.initialize` on localhost).
"""
from __future__ import annotations

from typing import Dict, List

import jax
import numpy as np

Array = np.ndarray


def process_shard_indices(n_items: int,
                          rank: int | None = None,
                          nprocs: int | None = None) -> List[int]:
    """Strided shard of [0, n_items) owned by this process (reference DDP
    assigns alternating batches the same way)."""
    rank = jax.process_index() if rank is None else rank
    nprocs = jax.process_count() if nprocs is None else nprocs
    return list(range(n_items))[rank::nprocs]


def allgather_metrics(local: Dict[str, Array], indices: List[int],
                      n_items: int) -> Dict[str, Array]:
    """All-gather per-query metric arrays evaluated on strided shards.

    Args:
      local: name -> [len(indices), ...] arrays for this process's shard;
      indices: the test-set indices this process evaluated (ascending);
      n_items: global test-set size.
    Returns: name -> [n_items, ...] arrays in test-set order, identical on
      every process. Shards are padded to the max shard length with the
      first row (dropped after the gather), so uneven splits are fine.
    """
    from jax.experimental import multihost_utils

    nprocs = jax.process_count()
    cap = (n_items + nprocs - 1) // nprocs
    k = len(indices)

    def pad(x):
        x = np.asarray(x)
        if x.shape[0] != k:
            raise ValueError(f"metric rows {x.shape[0]} != shard size {k}")
        if k == cap:
            return x
        fill = np.repeat(x[:1], cap - k, axis=0) if k else np.zeros(
            (cap,) + x.shape[1:], x.dtype)
        return np.concatenate([x, fill], axis=0)

    idx = pad(np.asarray(indices, np.int64))
    payload = {"__idx": idx, **{name: pad(v) for name, v in local.items()}}
    gathered = multihost_utils.process_allgather(payload)  # [P, cap, ...]

    gidx = np.asarray(gathered["__idx"]).reshape(-1)
    out: Dict[str, Array] = {}
    order = None
    # keep each process's first `len(shard_p)` rows, then sort by index
    keep = np.concatenate([
        np.arange(cap) < len(process_shard_indices(n_items, p, nprocs))
        for p in range(nprocs)])
    gidx = gidx[keep]
    order = np.argsort(gidx, kind="stable")
    for name, v in gathered.items():
        if name == "__idx":
            continue
        flat = np.asarray(v).reshape((-1,) + np.asarray(v).shape[2:])
        out[name] = flat[keep][order]
    return out
