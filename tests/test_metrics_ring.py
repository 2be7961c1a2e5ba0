"""DeviceMetricsRing: on-device scalar buffering with batched readback."""
from __future__ import annotations

import json
import os
import tempfile

import jax.numpy as jnp
import numpy as np

from ramdsir_tpu.utils.logging import DeviceMetricsRing, MetricsWriter


def _read_rows(log_dir):
    rows = {}
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            vals = {k: v for k, v in rec.items() if k.startswith("loss/")}
            if vals:
                rows[rec["step"]] = vals
    return rows


def test_scalar_rows_and_flush():
    d = tempfile.mkdtemp()
    w = MetricsWriter(d, use_tensorboard=False)
    ring = DeviceMetricsRing(w, cap=8, log_interval=1)
    for s in range(5):
        ring.append(s, {"loss": jnp.float32(s * 1.0), "lr": jnp.float32(0.1)})
    ring.flush()
    w.close()
    rows = _read_rows(d)
    assert sorted(rows) == [0, 1, 2, 3, 4]
    assert rows[3]["loss/loss"] == 3.0
    # `lr` is exempt from the loss/ namespace — the reference logs it bare
    # (train.py:298/467)
    lr_rows = {}
    with open(os.path.join(d, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "lr" in rec:
                lr_rows[rec["step"]] = rec["lr"]
    assert abs(lr_rows[3] - 0.1) < 1e-6
    assert not any("loss/lr" in r for r in rows.values())


def test_window_tables_and_autoflush():
    d = tempfile.mkdtemp()
    w = MetricsWriter(d, use_tensorboard=False)
    ring = DeviceMetricsRing(w, cap=6, log_interval=2)
    # two (W=4) windows: the second overflows cap=6 -> auto-flush first
    ring.append(0, {"a": jnp.arange(4, dtype=jnp.float32)})
    ring.append(4, {"a": 10.0 + jnp.arange(4, dtype=jnp.float32)})
    ring.flush()
    w.close()
    rows = _read_rows(d)
    # log_interval=2 -> even steps only
    assert sorted(rows) == [0, 2, 4, 6]
    assert rows[2]["loss/a"] == 2.0
    assert rows[6]["loss/a"] == 12.0


def test_flush_empty_is_noop():
    d = tempfile.mkdtemp()
    w = MetricsWriter(d, use_tensorboard=False)
    ring = DeviceMetricsRing(w, cap=4)
    ring.flush()
    w.close()
    assert _read_rows(d) == {}


def test_viz_ring_defers_and_preserves_grids():
    """DeviceVizRing: grids parked on device come back with their original
    step tags in one batched pull.  Grids are uint8-quantized on device
    (4x fewer d2h bytes); reconstruction error is bounded by half a
    quantization bin of each array's own range — invisible after TB's own
    uint8 conversion — and binary masks reconstruct EXACTLY."""
    from ramdsir_tpu.utils.logging import DeviceVizRing

    ring = DeviceVizRing()
    rng = np.random.default_rng(0)
    sent = {}
    for s in (100, 200, 300):
        viz = {
            "image": jnp.asarray(rng.normal(size=(3, 8, 8, 3)).astype(np.float32)),
            "pred": jnp.asarray(rng.uniform(size=(3, 8, 8, 2)).astype(np.float32)),
            "mask": jnp.asarray(rng.integers(0, 2, size=(3, 8, 8, 2)).astype(np.float32)),
        }
        sent[s] = {k: np.asarray(v) for k, v in viz.items()}
        ring.append(s, viz)

    got = {}
    ring.flush(lambda viz, s: got.__setitem__(s, viz))
    assert sorted(got) == [100, 200, 300]
    for s in got:
        for k in ("image", "pred"):
            span = sent[s][k].max() - sent[s][k].min()
            np.testing.assert_allclose(
                got[s][k], sent[s][k], atol=span / 255.0 * 0.5 + 1e-6
            )
        # binary 0/1 masks hit exact quantization bins -> bit-exact
        np.testing.assert_array_equal(got[s]["mask"], sent[s]["mask"])
    # second flush is a no-op
    ring.flush(lambda viz, s: (_ for _ in ()).throw(AssertionError))


def test_viz_ring_integer_label_maps_reconstruct_exactly():
    """A 5-class label map must survive the uint8 round-trip EXACTLY:
    without the integer flag, label 3 of a 0..4 map dequantizes to 2.996
    and a downstream astype(int) renders class 2 (silently wrong TB
    grids).  Integer-valued arrays are flagged on device and rounded at
    dequant — exact for any value range <= 255."""
    from ramdsir_tpu.utils.logging import DeviceVizRing

    ring = DeviceVizRing()
    rng = np.random.default_rng(1)
    labels = rng.integers(0, 5, size=(2, 8, 8)).astype(np.float32)
    labels.flat[0] = 3.0  # force the problematic class into the map
    ring.append(7, {"label": jnp.asarray(labels)})
    got = {}
    ring.flush(lambda viz, s: got.__setitem__(s, viz))
    np.testing.assert_array_equal(got[7]["label"], labels)
    assert np.array_equal(got[7]["label"].astype(int), labels.astype(int))


def test_step_timer_mark_without_ticks_is_noop():
    """mark() extends the window only when ticks are pending: the final
    sync+mark after an eval/checkpoint block must NOT fold that non-step
    work into images/sec (regression: a 252-step e2e run reported 29.9
    img/s because the end-of-training mark absorbed eval + a ~80 s viz
    pull + a checkpoint save that all ran after the eval-boundary mark)."""
    import time as _time

    from ramdsir_tpu.utils.profiler import StepTimer

    t = StepTimer(warmup=1)
    for _ in range(3):
        t.tick(4)
    t.mark()  # sync boundary: extends (ticks pending)
    rate1 = t.items_per_sec
    _time.sleep(0.2)  # eval / checkpoint / flush happen here
    t.mark()  # no ticks since the last mark -> must not extend
    assert t.items_per_sec == rate1
    t.tick(4)
    _time.sleep(0.05)
    t.mark()  # pending tick -> extends again
    assert t.items_per_sec < rate1


def test_viz_ring_caps_slots():
    from ramdsir_tpu.utils.logging import DeviceVizRing

    ring = DeviceVizRing()
    for s in range(40):
        ring.append(s, {"image": jnp.zeros((1, 2, 2, 3)) + s})
    got = []
    ring.flush(lambda viz, s: got.append((s, float(viz["image"][0, 0, 0, 0]))))
    assert len(got) == 32  # oldest dropped
    assert got[0] == (8, 8.0) and got[-1] == (39, 39.0)


def test_tb_tag_set_matches_reference():
    """The full emitted tag set equals the reference's SummaryWriter calls
    (train.py:298-304 fundus / :467-473 prostate) plus one documented extra
    (`loss/loss`, the total — PARITY.md)."""
    for sup in ("bce", "ce"):
        d = tempfile.mkdtemp()
        w = MetricsWriter(d, use_tensorboard=False)
        ring = DeviceMetricsRing(w, cap=8)
        step_metrics = {
            f"loss_{sup}_1": 0.1, "loss_dice_1": 0.2,
            f"loss_{sup}_2": 0.3, "loss_dice_2": 0.4,
            "loss_consistency": 0.5, "loss_rec": 0.6,
            "loss": 1.0, "lr": 1e-3,
        }
        ring.append(0, {k: jnp.float32(v) for k, v in step_metrics.items()})
        ring.flush()
        w.close()
        tags = set()
        with open(os.path.join(d, "metrics.jsonl")) as f:
            for line in f:
                tags |= {k for k in json.loads(line) if k not in ("t", "step")}
        reference_tags = {
            "lr",
            f"loss/loss_{sup}_1", "loss/loss_dice_1",
            f"loss/loss_{sup}_2", "loss/loss_dice_2",
            "loss/loss_consistency", "loss/loss_rec",
        }
        assert tags == reference_tags | {"loss/loss"}, tags
