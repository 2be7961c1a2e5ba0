"""Multi-host bring-up.

The reference has no multi-node path (its torch.distributed wrappers are
never called — nn_utils.py:246-258).  Here multi-host is the same code as
single-host: initialize the JAX distributed runtime, build the global mesh
over all devices, and the jit sharding annotations from
ramdsir_tpu.parallel.mesh scale across DCN unchanged (each host feeds its
addressable shard of the batch).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from ramdsir_tpu.parallel.mesh import DATA_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize passthrough (env-autodetected on TPU pods)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def global_data_mesh() -> Mesh:
    """1-D data mesh over every device in the job (all hosts)."""
    return Mesh(np.array(jax.devices()), (DATA_AXIS,))


def local_batch_slice(global_batch: int) -> slice:
    """The rows of the global batch this host should materialize."""
    n_proc = jax.process_count()
    if global_batch % n_proc:
        raise ValueError(f"global batch {global_batch} not divisible by {n_proc} hosts")
    per = global_batch // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
