"""Device-mesh data parallelism.

The reference's only parallelism is single-process torch DataParallel
(code/train.py:205-208).  Here the same strategy is expressed the TPU way:
a 1-D `jax.sharding.Mesh` over the 'data' axis; the batch is sharded, the
params/optimizer state replicated, and the jitted train step runs SPMD —
XLA inserts the gradient psum and the batch-stat reductions over ICI.

BN semantics note (SURVEY.md §2.3): because the train step computes batch
statistics with *global* reductions under jit, sharded training matches the
reference's single-GPU global-batch BN numerics exactly (sync-BN for free),
rather than DataParallel's per-replica stats.

Multi-host: the same annotations scale over DCN via
`jax.distributed.initialize()` — nothing else changes.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place host arrays with the batch dim split over the data axis."""
    sharding = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        arr = np.asarray(v)
        spec = NamedSharding(mesh, P(DATA_AXIS, *([None] * (arr.ndim - 1))))
        out[k] = jax.device_put(arr, spec)
    return out


def replicate_state(state, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)
