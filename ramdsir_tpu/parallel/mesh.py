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


def pad_batch(batch: Dict[str, Any], multiple: int) -> Dict[str, Any]:
    """Zero-pad every array's batch dim up to the next multiple.

    `device_put` requires the sharded dim to divide evenly over the mesh
    (GSPMD's uneven-shard tolerance only applies inside jit).  The train
    step excludes the padded rows from all BN statistics and losses via a
    static n_valid slice (see train.steps.make_train_step), so padding is
    numerics-exact.  Reference analogue: DataParallel's uneven scatter
    (train.py:205-208) — there the last GPUs just get smaller chunks.
    """
    sizes = {np.asarray(v).shape[0] for v in batch.values()}
    assert len(sizes) == 1, f"inconsistent batch dims {sizes}"
    b = sizes.pop()
    pad = (-b) % multiple
    if pad == 0:
        return batch
    out = {}
    for k, v in batch.items():
        arr = np.asarray(v)
        out[k] = np.concatenate(
            [arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)], axis=0
        )
    return out


def shard_batch(
    batch: Dict[str, Any], mesh: Mesh, pad_to_multiple: bool = False
) -> Dict[str, Any]:
    """Place host arrays with the batch dim split over the data axis.

    Single-host: `batch` holds the full global batch (device_put splits it
    over the local devices).  Multi-host: `batch` holds only THIS process's
    rows of the global domain-major batch (see
    parallel.distributed.local_batch_slice and the loader's `rows=`);
    `make_array_from_process_local_data` assembles the global jax.Array
    without any cross-host copy of pixel data.
    """
    n_proc = jax.process_count()
    if pad_to_multiple:
        sizes = {np.asarray(v).shape[0] for v in batch.values()}
        b = sizes.pop()
        if n_proc > 1:
            if (b * n_proc) % mesh.devices.size:
                raise ValueError(
                    "multi-host training needs the global batch divisible by "
                    f"the mesh ({b * n_proc} rows over {mesh.devices.size} devices); "
                    "zero-pad masking is single-host only (padding would land "
                    "mid-batch in the global domain-major layout)"
                )
        else:
            batch = pad_batch(batch, mesh.devices.size)
    out = {}
    for k, v in batch.items():
        arr = np.asarray(v)
        spec = NamedSharding(mesh, P(DATA_AXIS, *([None] * (arr.ndim - 1))))
        if n_proc > 1:
            out[k] = jax.make_array_from_process_local_data(spec, arr)
        else:
            out[k] = jax.device_put(arr, spec)
    return out


def replicate_state(state, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)
