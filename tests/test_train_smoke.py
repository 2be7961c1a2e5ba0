"""End-to-end smoke: full RAM-DSIR train step, eval, checkpoint roundtrip.

Runs the BASELINE configs on synthetic data at tiny resolution (CPU):
  #1 plain supervised, #3 fundus full RAM-DSIR, #4 prostate RAM-DSIR,
  #5 prostate volume eval.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ramdsir_tpu.config import TrainConfig
from ramdsir_tpu.data.synthetic import make_fundus_tree, make_prostate_tree, make_prostate_volumes
from ramdsir_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from ramdsir_tpu.train.evaluate import eval_prostate_volumes
from ramdsir_tpu.train.loop import build_train_loaders, fit
from ramdsir_tpu.train.state import init_state
from ramdsir_tpu.train.steps import make_predict_fn, make_train_step


@pytest.fixture(scope="session")
def roots(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    make_fundus_tree(root, per_domain_train=12, per_domain_test=2, size=32)
    make_prostate_tree(root, per_domain=4, size=32)
    make_prostate_volumes(root, per_domain=1, depth=10, size=32)
    return root


def _metrics_finite(m):
    return all(np.isfinite(float(v)) for v in m.values())


def test_fundus_full_ramdsir_steps(roots):
    cfg = TrainConfig(
        data_root=roots, dataset="fundus", image_size=32, test_domain_idx=3,
        domain_idxs=(0, 1, 2), save_path=os.path.join(roots, "r1"),
        ram=True, rec=True, consistency=True, consistency_type="kd", epochs=1,
    ).resolve()
    it = build_train_loaders(cfg, os.path.join(roots, "fundus"), seed=cfg.seed)
    # default fundus path is the HBM-resident pipeline: idx batches + arrays
    dev = getattr(it, "device_data", None)
    state, models = init_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, models, total_iters=10, device_data=dev)
    losses = []
    rng = jax.random.PRNGKey(1)
    for i, batch in enumerate(it):
        state, m, _ = step(state, batch, jax.random.fold_in(rng, i), dev)
        assert _metrics_finite(m), m
        # metric keys = the reference's fundus TB tags (train.py:298-304)
        # minus the 'loss/' namespace the ring adds, plus {loss, lr}
        assert set(m) == {
            "loss_bce_1", "loss_dice_1", "loss_bce_2", "loss_dice_2",
            "loss_consistency", "loss_rec", "loss", "lr",
        }
        losses.append(float(m["loss"]))
        if i == 2:
            break
    assert int(state.step) == 3
    # no NaN in params after several updates
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(state.params))


def test_plain_supervised_config1(roots):
    cfg = TrainConfig(
        data_root=roots, dataset="fundus", image_size=32, test_domain_idx=3,
        domain_idxs=(0, 1, 2), save_path=os.path.join(roots, "r2"),
        ram=False, rec=False, consistency=False, epochs=1,
    ).resolve()
    it = build_train_loaders(cfg, os.path.join(roots, "fundus"), seed=0)
    dev = getattr(it, "device_data", None)
    state, models = init_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, models, total_iters=10, device_data=dev)
    batch = next(iter(it))
    state, m, _ = step(state, batch, jax.random.PRNGKey(2), dev)
    assert _metrics_finite(m)
    assert "loss_consistency" not in m  # no RAM branch


def test_prostate_ramdsir_step_and_volume_eval(roots):
    cfg = TrainConfig(
        data_root=roots, dataset="prostate", image_size=32, test_domain_idx=5,
        domain_idxs=(0, 1, 2, 3, 4), save_path=os.path.join(roots, "r3"),
        ram=True, rec=True, consistency=True, consistency_type="mse",
        test_batch_size=4, epochs=1,
    ).resolve()
    it = build_train_loaders(cfg, os.path.join(roots, "prostate"), seed=0)
    state, models = init_state(cfg, jax.random.PRNGKey(0))
    # device_data default: prostate slices live in HBM, batches are indices
    dev_data = getattr(it, "device_data", None)
    step = make_train_step(cfg, models, total_iters=10, device_data=dev_data)
    batch = next(iter(it))
    state, m, _ = step(state, batch, jax.random.PRNGKey(3), dev_data)
    assert _metrics_finite(m)
    # prostate TB tags use the CE names (train.py:467-473)
    assert set(m) == {
        "loss_ce_1", "loss_dice_1", "loss_ce_2", "loss_dice_2",
        "loss_consistency", "loss_rec", "loss", "lr",
    }

    predict = make_predict_fn(cfg, models)
    res = eval_prostate_volumes(predict, state, roots, cfg.test_domain_idx,
                                batch_size=4, with_distances=True)
    assert res.num == 1
    assert 0.0 <= res.dice <= 1.0
    assert np.isfinite(res.hd) and np.isfinite(res.asd)


def test_checkpoint_roundtrip(roots, tmp_path):
    cfg = TrainConfig(
        data_root=roots, dataset="fundus", image_size=32, test_domain_idx=3,
        domain_idxs=(0, 1, 2), save_path=str(tmp_path), ram=True, rec=True,
    ).resolve()
    state, models = init_state(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, state, meta={"hello": 1})
    # restore into a fresh template
    fresh, _ = init_state(cfg, jax.random.PRNGKey(42))
    restored, meta = load_checkpoint(path, fresh)
    assert meta == {"hello": 1}
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


def test_fit_smoke_with_eval_and_best(roots, tmp_path):
    cfg = TrainConfig(
        data_root=roots, dataset="fundus", image_size=32, test_domain_idx=3,
        domain_idxs=(0, 1, 2), save_path=str(tmp_path / "run"),
        ram=True, rec=True, consistency=True, consistency_type="kd",
        epochs=1, test_batch_size=2,
    )
    summary = fit(cfg, max_steps=2)
    assert os.path.exists(summary["final_checkpoint"])
    assert any(f.startswith("model_") for f in os.listdir(str(tmp_path / "run")))
    assert os.path.exists(str(tmp_path / "run" / "log" / "metrics.jsonl"))
    assert "cup_dice" in summary


def test_remat_matches_plain(roots):
    """jax.checkpoint changes memory, not math."""
    base = dict(
        data_root=roots, dataset="fundus", image_size=32, test_domain_idx=3,
        domain_idxs=(0, 1, 2), save_path="x", ram=True, rec=True,
        consistency=True, consistency_type="kd",
    )
    it = build_train_loaders(TrainConfig(**base).resolve(), os.path.join(roots, "fundus"), seed=0)
    dev = getattr(it, "device_data", None)
    batch = next(iter(it))
    key = jax.random.PRNGKey(9)
    outs = {}
    for remat in (False, True):
        cfg = TrainConfig(**base, remat=remat).resolve()
        state, models = init_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(cfg, models, total_iters=10, device_data=dev)
        _, m, _ = step(state, batch, key, dev)
        outs[remat] = {k: float(v) for k, v in m.items()}
    for k in outs[False]:
        np.testing.assert_allclose(outs[True][k], outs[False][k], rtol=1e-5)


def test_bn_adapt_predict_differs_from_frozen(roots):
    cfg = TrainConfig(
        data_root=roots, dataset="fundus", image_size=32, test_domain_idx=3,
        domain_idxs=(0, 1, 2), save_path="x", ram=False, rec=False,
    ).resolve()
    state, models = init_state(cfg, jax.random.PRNGKey(0))
    x = np.random.default_rng(0).uniform(0, 255, (4, 32, 32, 3)).astype(np.float32)
    frozen = make_predict_fn(cfg, models, bn_adapt=False)(state, x)
    adapted = make_predict_fn(cfg, models, bn_adapt=True)(state, x)
    assert not np.allclose(np.asarray(frozen), np.asarray(adapted))


def test_global_batch_override(roots):
    """--global_batch (non-parity scaling knob): even per-domain split,
    linear LR scaling unless --lr is explicit, divisibility guard, and a
    real train step at the overridden batch."""
    base = dict(
        data_root=roots, dataset="fundus", image_size=32, test_domain_idx=3,
        domain_idxs=(0, 1, 2), save_path="x", ram=True, rec=True,
        consistency=True, consistency_type="kd",
    )
    ref = TrainConfig(**base).resolve()  # table [2,4,10] -> 16, lr 2e-3
    cfg = TrainConfig(**base, global_batch=24).resolve()
    assert cfg.batch_size_list == [8, 8, 8]
    np.testing.assert_allclose(cfg.lr, ref.lr * 24 / 16)
    # explicit --lr wins over the linear scaling
    assert TrainConfig(**base, global_batch=24, lr=5e-4).resolve().lr == 5e-4
    with pytest.raises(ValueError, match="divide"):
        _ = TrainConfig(**base, global_batch=25).resolve().batch_size_list

    it = build_train_loaders(cfg, os.path.join(roots, "fundus"), seed=0)
    dev = getattr(it, "device_data", None)
    batch = next(iter(it))
    n_rows = (batch["img_idx"] if "img_idx" in batch else batch["img"]).shape[0]
    assert n_rows == 24
    state, models = init_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, models, total_iters=10, device_data=dev)
    state, m, _ = step(state, batch, jax.random.PRNGKey(3), dev)
    assert _metrics_finite(m), m
