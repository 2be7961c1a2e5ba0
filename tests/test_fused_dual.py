"""Fused dual forward == two sequential forwards.

fused_dual stacks the clean and frequency-mixed batches on a leading axis
and vmaps ONE forward over it: convs see 2B rows, BN reductions stay
per-half, and the running-stat update composes the two per-half updates in
closed form.  These tests pin numerical equivalence to the sequential
reference path (train.py:263-287 semantics) for both datasets.
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np
import pytest

from ramdsir_tpu.config import TrainConfig
from ramdsir_tpu.train.state import init_state
from ramdsir_tpu.train.steps import make_train_step


def _run(cfg, batch, fused: bool):
    cfg = dataclasses.replace(cfg, fused_dual=fused)
    state, models = init_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, models, total_iters=20)
    new_state, metrics, viz = step(state, batch, jax.random.PRNGKey(7))
    return new_state, metrics


@pytest.mark.parametrize("dataset", ["fundus", "prostate"])
def test_fused_dual_matches_sequential(dataset):
    rng = np.random.default_rng(0)
    if dataset == "fundus":
        cfg = TrainConfig(
            dataset="fundus", ram=True, rec=True, consistency=True,
            consistency_type="kd", image_size=32, domain_idxs=(0, 1, 2),
            test_domain_idx=3, save_path="/tmp/fd",
        ).resolve()
        b = sum(cfg.batch_size_list[:3])
        batch = {
            "img": rng.uniform(0, 255, (b, 32, 32, 3)).astype(np.float32),
            "donor": rng.uniform(0, 255, (b, 32, 32, 3)).astype(np.float32),
            "mask": (rng.uniform(size=(b, 32, 32, 2)) > 0.5).astype(np.float32),
        }
    else:
        cfg = TrainConfig(
            dataset="prostate", ram=True, rec=True, consistency=True,
            consistency_type="mse", image_size=32, domain_idxs=(0, 1, 2, 3, 4),
            test_domain_idx=5, save_path="/tmp/fd",
        ).resolve()
        b = sum(cfg.batch_size_list[:5])
        batch = {
            "img": rng.uniform(-1, 1, (b, 32, 32, 3)).astype(np.float32),
            "donor": rng.uniform(-1, 1, (b, 32, 32, 3)).astype(np.float32),
            "mask": rng.integers(0, 2, (b, 32, 32)).astype(np.int32),
        }

    s_seq, m_seq = _run(cfg, batch, fused=False)
    s_fused, m_fused = _run(cfg, batch, fused=True)

    for k in m_seq:
        np.testing.assert_allclose(
            np.asarray(m_fused[k]), np.asarray(m_seq[k]), rtol=2e-5, atol=1e-6,
            err_msg=k,
        )
    # Updated params: the first Adam step is ~lr*sign(g) (v is tiny), so a
    # reduction-order-level grad difference near g=0 flips an element by up
    # to 2*lr — compare with that as the absolute budget.
    lr = float(cfg.lr)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2.5 * lr
        ),
        s_fused.params,
        s_seq.params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        s_fused.batch_stats,
        s_seq.batch_stats,
    )
