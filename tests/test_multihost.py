"""Multi-host data parallelism, actually executed.

Two REAL processes (jax.distributed.initialize with a local coordinator,
4 virtual CPU devices each -> one global 8-device mesh) drive fit()
through the full multi-host path: `parallel.distributed.local_batch_slice`,
the loaders' `rows=` slicing, and `make_array_from_process_local_data` in
`shard_batch` (parallel/mesh.py).  Loss parity is asserted against a
single-process 8-device run of the SAME config/seed — the host loader's
counter-seeded per-sample RNG makes the global batch identical whether it
is materialized by one process or split across two.

Requires jax's cross-process CPU collectives (gloo); skipped if the
distributed runtime can't start in this environment.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

CHILD = r"""
import json, os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]
data_root = sys.argv[3]; out_dir = sys.argv[4]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc_id
)
assert jax.process_count() == 2
assert jax.device_count() == 8 and jax.local_device_count() == 4
from ramdsir_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()  # second process / reruns hit the first's compiles
# Establish the gloo clique NOW with a tiny all-reduce: the rendezvous has
# a fixed ~30 s deadline, and fit()'s first collective would hit it when
# the two processes' multi-minute compiles skew on a 1-core host.  Both
# children compile this in seconds, rendezvous in lockstep, and the
# context is reused by every later collective.
import numpy as _np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as _P
_mesh = Mesh(_np.array(jax.devices()), ("d",))
_x = jax.device_put(_np.arange(8, dtype=_np.float32), NamedSharding(_mesh, _P("d")))
float(jnp.sum(_x))
from ramdsir_tpu.config import TrainConfig
from ramdsir_tpu.train.loop import fit
mode = sys.argv[5]  # "device" (HBM-resident + scan windows) or "host"
cfg = TrainConfig(
    data_root=data_root, dataset="fundus", image_size=32, test_domain_idx=3,
    domain_idxs=(0, 1, 2), save_path=os.path.join(out_dir, f"proc{proc_id}"),
    ram=True, rec=True, consistency=True, consistency_type="kd", epochs=1,
    device_data=(mode == "device"), loader="thread", seed=7, log_interval=1,
)
summary = fit(cfg, eval_every=10**9, max_steps=4)
print("CHILD_OK", proc_id, json.dumps({k: summary[k] for k in ("steps",)}), flush=True)
# on a 1-core host the two processes can reach the shutdown barrier far
# apart; a barrier timeout here must not poison an otherwise-good run
try:
    jax.distributed.shutdown()
except Exception:
    pass
"""


def _losses_from_jsonl(save_path):
    rows = {}
    with open(os.path.join(save_path, "log", "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "loss/loss" in rec:
                rows[rec["step"]] = rec["loss/loss"]
    return rows


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["host", "device"])
def test_two_process_fit_matches_single_process(tmp_path, mode):
    """mode='host': multi-host host-loader path (rows= slicing +
    make_array_from_process_local_data).  mode='device': the default pod
    path — HBM-resident dataset replicated per process, full index plans
    everywhere, lax.scan windows sharding the batch axis over the global
    mesh (loop.py run_scan_segment)."""
    from ramdsir_tpu.data.synthetic import make_fundus_tree

    data_root = str(tmp_path / "data")
    make_fundus_tree(data_root, per_domain_train=12, per_domain_test=2, size=32)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = str(tmp_path / "mh")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", CHILD, str(i), str(port), data_root, out_dir, mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-host children timed out")
    for i, (p, out) in enumerate(zip(procs, outs)):
        # success = the training ran and reported; a nonzero exit AFTER
        # CHILD_OK is a shutdown-barrier race on this 1-core host, not a
        # multi-host failure
        if f"CHILD_OK {i}" in out:
            continue
        if "DISTRIBUTED" in out.upper() or "gloo" in out or "collectives" in out:
            pytest.skip(f"distributed CPU runtime unavailable: {out[-400:]}")
        pytest.fail(f"child {i} failed:\n{out[-2000:]}")

    mh_losses = _losses_from_jsonl(os.path.join(out_dir, "proc0"))
    assert len(mh_losses) == 4 and all(np.isfinite(v) for v in mh_losses.values())

    # single-process reference run: same config, whole batch on one host
    from ramdsir_tpu.config import TrainConfig
    from ramdsir_tpu.train.loop import fit

    sp_path = str(tmp_path / "sp")
    cfg = TrainConfig(
        data_root=data_root, dataset="fundus", image_size=32, test_domain_idx=3,
        domain_idxs=(0, 1, 2), save_path=sp_path, ram=True, rec=True,
        consistency=True, consistency_type="kd", epochs=1,
        device_data=(mode == "device"), loader="thread", seed=7, log_interval=1,
    )
    fit(cfg, eval_every=10**9, max_steps=4)
    sp_losses = _losses_from_jsonl(sp_path)

    assert sorted(sp_losses) == sorted(mh_losses)
    first = min(sp_losses)
    for s in sorted(sp_losses):
        # Step 0 is pre-optimizer: identical global batch + init, so any
        # gap beyond cross-device reduction order means a data-slicing or
        # sharding bug — keep it TIGHT.  Later steps legitimately drift at
        # the 1e-3 level: near-zero gradients make the first Adam updates
        # ~lr*sign(g), so 1e-7 reduction-order noise flips update signs
        # (same effect documented in tests/test_fused_dual.py).
        rtol = 1e-5 if s == first else 2e-2
        np.testing.assert_allclose(mh_losses[s], sp_losses[s], rtol=rtol, err_msg=f"step {s}")
