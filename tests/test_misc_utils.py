"""Misc helper coverage: data_utils + nn_utils."""
import numpy as np
import jax
import jax.numpy as jnp

from ramdsir_tpu.utils.data_utils import (
    cross_entropy2d,
    get_dice,
    get_iou,
    get_mc_dice,
    lr_poly,
    pascal_colormap,
)
from ramdsir_tpu.utils.nn_utils import (
    Timer,
    get_prediction,
    get_probability,
    make_same_size,
    sgd_fast_weights,
    to_one_hot,
)


def test_lr_poly_schedule():
    assert lr_poly(2e-3, 0, 100) == 2e-3
    assert abs(lr_poly(2e-3, 50, 100) - 2e-3 * 0.5 ** 0.9) < 1e-12


def test_iou_dice_helpers():
    pred = np.array([[0, 1], [1, 1]])
    gt = np.array([[0, 1], [0, 1]])
    assert abs(get_iou(pred, gt, 2)[1] - 2 / 3) < 1e-12
    assert abs(get_dice(pred, gt, 2)[1] - 0.8) < 1e-12
    assert abs(get_mc_dice(pred, gt, 2) - 0.8) < 1e-12


def test_pascal_colormap():
    cm = pascal_colormap()
    assert cm.shape == (256, 3)
    assert tuple(cm[0]) == (0, 0, 0) and tuple(cm[1]) == (128, 0, 0)


def test_cross_entropy2d_matches_jax():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    t = rng.integers(0, 3, (2, 4, 4))
    from ramdsir_tpu.ops.losses import cross_entropy_loss

    want = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(t)))
    assert abs(cross_entropy2d(logits, t) - want) < 1e-5


def test_nn_utils_shapes():
    x = jnp.zeros((2, 8, 8, 2))
    assert get_probability(x).shape == x.shape
    assert get_prediction(get_probability(x)).shape == x.shape
    x3 = jnp.zeros((2, 8, 8, 5))
    assert get_prediction(get_probability(x3)).shape == (2, 8, 8)
    assert to_one_hot(jnp.zeros((2, 4), jnp.int32), 3).shape == (2, 4, 3)
    small = jnp.zeros((2, 4, 4, 6))
    big = jnp.zeros((2, 16, 16, 1))
    assert make_same_size(small, big).shape == (2, 16, 16, 6)


def test_sgd_fast_weights():
    p = {"w": jnp.ones((3,))}
    g = {"w": jnp.ones((3,)) * 2}
    out = sgd_fast_weights(p, g, 0.1)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.8)


def test_timer_context():
    with Timer("t") as t:
        pass
    assert t.elapsed >= 0.0
