"""Device-mesh construction and sharding helpers.

TPU-native replacement for the reference's entire parallelism surface
(SURVEY.md §2.5): PyTorch-Lightning DDP over NCCL (reference: pl/train.py:
103-105) becomes a single SPMD program over a `jax.sharding.Mesh` with two
logical axes:

  data — data parallelism over localization queries (the reference's only
         strategy: one query frame per GPU, pl/train.py:47-48). Gradient
         all-reduce is inserted by XLA from the sharding annotations; it rides
         ICI within a slice and DCN across hosts automatically.
  ray  — intra-query ray parallelism for rendering (something the reference
         never does; its render loop is serially chunked,
         conditional_nerf/model.py:616-635). Rays of one image are sharded
         across the `ray` axis and gathered at the end.

The eval all_gather_object (reference pl/model.py:194-197) is unnecessary on
a single host: the jitted eval step already returns globally-addressable
outputs, and train/evaluate.py reduces them in one process. Multi-process
eval shards the test set per process (strided, reference-DDP style) and
`multihost_utils.process_allgather`s the per-query metric arrays before
aggregate_per_scene — see parallel/multihost.py; exercised by
tests/test_multihost.py with two coordinated CPU processes.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshSpec:
    data: int = 1
    ray: int = 1

    @property
    def n_devices(self) -> int:
        return self.data * self.ray


def make_mesh(spec: Optional[MeshSpec] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, ray) mesh. With no spec, all devices go to `data`."""
    devices = list(devices if devices is not None else jax.devices())
    if spec is None:
        spec = MeshSpec(data=len(devices), ray=1)
    if spec.n_devices > len(devices):
        raise ValueError(
            f"mesh {spec} needs {spec.n_devices} devices, have {len(devices)}")
    arr = np.asarray(devices[: spec.n_devices]).reshape(spec.data, spec.ray)
    return Mesh(arr, axis_names=("data", "ray"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (query-batch) axis over `data`."""
    return NamedSharding(mesh, P("data"))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis over `ray`."""
    return NamedSharding(mesh, P("ray"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host pytree batch with the leading axis sharded over `data`.
    Scalars / sub-batch-rank leaves are replicated."""
    data = mesh.shape["data"]
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % data == 0 and x.shape[0] >= data:
            return jax.device_put(x, bs)
        return jax.device_put(x, rep)

    return jax.tree.map(put, batch)
