"""lax.scan training windows == the per-step loop, numerically.

The scan path (train.steps.make_train_step(scan=True)) runs W optimizer
steps in one XLA program with the per-step key derived as
fold_in(base_key, state.step) — exactly what fit()'s per-step loop passes
in.  These tests pin that equivalence and smoke the fit() wiring.
"""
from __future__ import annotations

import os
import tempfile

import jax
import numpy as np
import pytest

from ramdsir_tpu.config import TrainConfig
from ramdsir_tpu.data.synthetic import make_fundus_tree
from ramdsir_tpu.train.loop import build_train_loaders, fit
from ramdsir_tpu.train.state import init_state
from ramdsir_tpu.train.steps import make_train_step


@pytest.fixture(scope="module")
def tree():
    root = tempfile.mkdtemp(prefix="scan_test_")
    make_fundus_tree(root, per_domain_train=12, per_domain_test=2, size=32)
    return root


def _cfg(root, **kw):
    base = dict(
        data_root=root, dataset="fundus", image_size=32, test_domain_idx=0,
        domain_idxs=(1, 2, 3), save_path=root + "/run", ram=True, rec=True,
        consistency=True, consistency_type="kd", epochs=2,
        log_images_every=0, log_interval=1,
    )
    base.update(kw)
    return TrainConfig(**base).resolve()


def test_scan_matches_sequential_steps(tree):
    cfg = _cfg(tree)
    loader = build_train_loaders(cfg, os.path.join(tree, "fundus"), seed=0)
    dev_data = loader.device_data
    rng = jax.random.PRNGKey(0)
    state0, models = init_state(cfg, rng)
    w = 4
    plan = loader.epoch_plan()
    window = {k: v[:w] for k, v in plan.items()}

    step_fn = make_train_step(cfg, models, total_iters=50, device_data=dev_data)
    state_seq = state0
    seq_metrics = []
    for i in range(w):
        row = {k: v[i] for k, v in window.items()}
        key = jax.random.fold_in(rng, i)
        state_seq, m, _ = step_fn(state_seq, row, key, dev_data)
        seq_metrics.append(m)

    scan_fn = make_train_step(
        cfg, models, total_iters=50, device_data=dev_data, scan=True
    )
    state_scan, mtable, viz = scan_fn(state0, window, rng, dev_data)

    assert int(state_scan.step) == int(state_seq.step) == w
    for k in seq_metrics[0]:
        got = np.asarray(mtable[k])
        want = np.asarray([m[k] for m in seq_metrics])
        # step 0 must be numerically identical (pins the fold_in(base_key,
        # state.step) key derivation and the gather/aug plumbing) ...
        np.testing.assert_allclose(got[0], want[0], rtol=1e-6, err_msg=k)
        # ... later steps drift slowly: the fused scan program reassociates
        # float math differently and Adam amplifies tiny grad differences
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5, err_msg=k)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=5e-3
        ),
        state_scan.params,
        state_seq.params,
    )
    # log_images_every=0: viz slices are skipped entirely (they would be
    # materialized as step outputs every step — train/steps.py)
    assert viz == {}


def test_scan_viz_enabled_carries_last_step(tree):
    cfg = _cfg(tree, log_images_every=100)
    loader = build_train_loaders(cfg, os.path.join(tree, "fundus"), seed=0)
    dev_data = loader.device_data
    rng = jax.random.PRNGKey(0)
    state0, models = init_state(cfg, rng)
    plan = loader.epoch_plan()
    window = {k: v[:2] for k, v in plan.items()}
    scan_fn = make_train_step(
        cfg, models, total_iters=50, device_data=dev_data, scan=True
    )
    _, _, viz = scan_fn(state0, window, rng, dev_data)
    # viz carries the LAST step's sample grids
    assert viz["image"].shape[0] >= 1 and "pred" in viz and "image_freq" in viz


def test_scan_requires_device_data(tree):
    cfg = _cfg(tree)
    _, models = init_state(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        make_train_step(cfg, models, total_iters=10, scan=True)


def test_fit_scan_smoke(tree):
    """fit() on the 8-device CPU mesh with the scan window active: metrics
    logged per-step, eval + keep-best still run, steps counted exactly."""
    cfg = _cfg(tree, save_path=tree + "/run_scan", scan_window=3, epochs=2)
    summary = fit(cfg, eval_every=1, max_steps=7)
    assert summary["steps"] == 7
    assert summary["images_per_sec"] > 0
    assert "cup_dice" in summary
    # per-step scalars made it to the JSONL log despite windowed dispatch
    import json

    logged = set()
    logdir = os.path.join(tree, "run_scan", "log")
    for name in os.listdir(logdir):
        if name.endswith(".jsonl"):
            with open(os.path.join(logdir, name)) as f:
                for line in f:
                    rec = json.loads(line)
                    if any(k.startswith("loss/") for k in rec):
                        logged.add(rec["step"])
    assert logged == set(range(7)), logged


def test_chained_scan_windows_match_loop(tree):
    """fit() dispatches CONSECUTIVE scan windows threading one state and one
    base key (run_scan_segment); two chained 3-step windows must equal six
    sequential per-step calls — pins the fold_in(base, state.step) carry
    across window boundaries, not just within one window."""
    cfg = _cfg(tree)
    loader = build_train_loaders(cfg, os.path.join(tree, "fundus"), seed=3)
    dev_data = loader.device_data
    rng = jax.random.PRNGKey(9)
    state0, models = init_state(cfg, rng)
    # two epochs' plans chained: the 6-step window spans an epoch boundary,
    # exactly like fit()'s segment windows do
    p1, p2 = loader.epoch_plan(), loader.epoch_plan()
    full = {k: np.concatenate([p1[k], p2[k]])[:6] for k in p1}
    assert full["img_idx"].shape[0] == 6, full["img_idx"].shape

    step_fn = make_train_step(cfg, models, total_iters=50, device_data=dev_data)
    state_seq = state0
    seq_losses = []
    for i in range(6):
        row = {k: v[i] for k, v in full.items()}
        state_seq, m, _ = step_fn(state_seq, row, jax.random.fold_in(rng, i), dev_data)
        seq_losses.append(float(np.asarray(m["loss"])))

    scan_fn = make_train_step(cfg, models, total_iters=50, device_data=dev_data, scan=True)
    state_scan = state0
    scan_losses = []
    for w0 in (0, 3):
        window = {k: v[w0 : w0 + 3] for k, v in full.items()}
        state_scan, mtable, _ = scan_fn(state_scan, window, rng, dev_data)
        scan_losses.extend(np.asarray(mtable["loss"]).tolist())

    assert int(state_scan.step) == int(state_seq.step) == 6
    np.testing.assert_allclose(scan_losses[0], seq_losses[0], rtol=1e-6)
    np.testing.assert_allclose(scan_losses, seq_losses, rtol=2e-3, atol=2e-5)
    # atol 8e-3 (vs the 4-step test's 5e-3): early Adam updates are
    # ~lr*sign(g), so per-step fp32 reduction-order noise compounds by
    # ~2*lr per extra step (measured at 6 steps: 2/294912 elements past
    # 5e-3, max 5.6e-3 — chaos accumulation, not systematic drift)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=8e-3
        ),
        state_scan.params,
        state_seq.params,
    )


def test_prostate_scan_matches_sequential():
    """Prostate twin of the fundus scan-parity test: 5-domain DSBN + CE +
    dice_loss_multi through a 4-step window vs the per-step loop."""
    import tempfile

    from ramdsir_tpu.data.synthetic import make_prostate_tree

    root = tempfile.mkdtemp(prefix="scan_prostate_")
    make_prostate_tree(root, per_domain=6, size=32)
    cfg = TrainConfig(
        data_root=root, dataset="prostate", image_size=32, test_domain_idx=5,
        domain_idxs=(0, 1, 2, 3, 4), save_path=root + "/run", ram=True,
        rec=True, consistency=True, consistency_type="kd", epochs=2,
        log_images_every=0,
    ).resolve()
    loader = build_train_loaders(cfg, os.path.join(root, "prostate"), seed=1)
    dev_data = loader.device_data
    rng = jax.random.PRNGKey(4)
    state0, models = init_state(cfg, rng)
    w = 4
    p1, p2 = loader.epoch_plan(), loader.epoch_plan()
    window = {k: np.concatenate([p1[k], p2[k]])[:w] for k in p1}
    assert window["img_idx"].shape[0] == w, window["img_idx"].shape

    step_fn = make_train_step(cfg, models, total_iters=50, device_data=dev_data)
    state_seq = state0
    seq_metrics = []
    for i in range(w):
        row = {k: v[i] for k, v in window.items()}
        state_seq, m, _ = step_fn(state_seq, row, jax.random.fold_in(rng, i), dev_data)
        seq_metrics.append(m)

    scan_fn = make_train_step(cfg, models, total_iters=50, device_data=dev_data, scan=True)
    state_scan, mtable, _ = scan_fn(state0, window, rng, dev_data)
    assert int(state_scan.step) == int(state_seq.step) == w
    for k in seq_metrics[0]:
        got = np.asarray(mtable[k])
        want = np.asarray([np.asarray(m[k]) for m in seq_metrics])
        np.testing.assert_allclose(got[0], want[0], rtol=1e-6, err_msg=k)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-5, err_msg=k)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=5e-3
        ),
        state_scan.params,
        state_seq.params,
    )
