"""Multi-device data parallelism on the virtual 8-device CPU mesh.

Checks that the full RAM-DSIR train step runs SPMD with the batch sharded
over the 'data' axis and that the sharded step matches the single-device
step numerically (global-batch BN == sync-BN, gradient psum by XLA).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ramdsir_tpu.config import TrainConfig
from ramdsir_tpu.parallel.mesh import get_mesh, replicate_state, shard_batch
from ramdsir_tpu.train.state import init_state
from ramdsir_tpu.train.steps import make_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = TrainConfig(
        dataset="fundus", image_size=32, test_domain_idx=3, domain_idxs=(0, 1, 2),
        save_path="x", ram=True, rec=True, consistency=True, consistency_type="kd",
    ).resolve()
    state, models = init_state(cfg, jax.random.PRNGKey(0))
    # per-domain sub-batches sized for an 8-way shard (8 | 24)
    bsl = [8, 8, 8]
    step = make_train_step(cfg, models, total_iters=10, batch_size_list=bsl)
    rng = np.random.default_rng(0)
    batch = {
        "img": rng.uniform(0, 255, (24, 32, 32, 3)).astype(np.float32),
        "donor": rng.uniform(0, 255, (24, 32, 32, 3)).astype(np.float32),
        "mask": (rng.uniform(size=(24, 32, 32, 2)) > 0.5).astype(np.float32),
    }
    return cfg, state, step, batch


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8


def test_sharded_step_matches_single_device(setup):
    cfg, state, step, batch = setup
    key = jax.random.PRNGKey(7)

    new_single, m_single, _ = step(state, batch, key)

    mesh = get_mesh(8)
    state_r = replicate_state(state, mesh)
    batch_s = shard_batch(batch, mesh)
    new_sharded, m_sharded, _ = step(state_r, batch_s, key)

    for k in m_single:
        np.testing.assert_allclose(
            float(m_single[k]), float(m_sharded[k]), rtol=2e-3, atol=1e-5,
            err_msg=f"metric {k} diverged under sharding",
        )
    # BN batch statistics are pure global reductions: if sharding computed
    # per-shard stats instead of sync-BN, these would diverge wildly.
    for a, b in zip(
        jax.tree.leaves(new_single.batch_stats), jax.tree.leaves(new_sharded.batch_stats)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    # Params compare loosely: at step 1 Adam's update is ~sign(grad)
    # (v_hat == grad^2), so last-ulp reduction-order differences can flip a
    # near-zero gradient's sign — bounded by 2 * lr per element.
    for a, b in zip(jax.tree.leaves(new_single.params), jax.tree.leaves(new_sharded.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=6e-3)


def test_sharded_batch_layout(setup):
    cfg, state, step, batch = setup
    mesh = get_mesh(8)
    bs = shard_batch(batch, mesh)
    shard_shapes = {s.data.shape for s in bs["img"].addressable_shards}
    assert shard_shapes == {(3, 32, 32, 3)}  # 24 / 8 devices
