from ramdsir_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    replicate_state,
    shard_batch,
)
