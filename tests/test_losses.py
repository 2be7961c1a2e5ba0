"""Loss parity vs torch builtins / reference formulas (torch CPU golden)."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ramdsir_tpu.ops.losses import (
    binary_kd_loss,
    binary_mse_consistency,
    bce_loss,
    bce_with_logits_loss,
    cross_entropy_loss,
    dice_loss,
    dice_loss_multi,
    kd_loss,
    mse_loss,
)

RNG = np.random.default_rng(0)


def _rand_probs(shape):
    return RNG.uniform(0.01, 0.99, shape).astype(np.float32)


def test_bce_matches_torch():
    p = _rand_probs((4, 8, 8, 2))
    t = (RNG.uniform(size=(4, 8, 8, 2)) > 0.5).astype(np.float32)
    want = torch.nn.BCELoss()(torch.from_numpy(p), torch.from_numpy(t)).item()
    got = float(bce_loss(jnp.asarray(p), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_with_logits_matches_torch():
    logits = RNG.normal(0, 3, (4, 8, 8, 2)).astype(np.float32)
    t = (RNG.uniform(size=(4, 8, 8, 2)) > 0.5).astype(np.float32)
    want = torch.nn.BCEWithLogitsLoss()(torch.from_numpy(logits), torch.from_numpy(t)).item()
    got = float(bce_with_logits_loss(jnp.asarray(logits), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # equals BCELoss(sigmoid(x)) in the non-saturated regime (reference path)
    want2 = torch.nn.BCELoss()(torch.sigmoid(torch.from_numpy(logits)), torch.from_numpy(t)).item()
    np.testing.assert_allclose(got, want2, rtol=1e-4)


def test_bce_with_logits_saturation_is_finite_and_grad_safe():
    import jax

    logits = jnp.asarray([[40.0, -40.0]], jnp.float32)
    t = jnp.asarray([[0.0, 1.0]], jnp.float32)
    val = bce_with_logits_loss(logits, t)
    assert np.isfinite(float(val))
    g = jax.grad(lambda x: bce_with_logits_loss(x, t))(logits)
    assert np.isfinite(np.asarray(g)).all()
    # probability-input variant is also finite at exact 0/1
    p = jnp.asarray([[1.0, 0.0]], jnp.float32)
    val2 = bce_loss(p, t)
    assert np.isfinite(float(val2))
    g2 = jax.grad(lambda x: bce_loss(x, t))(p)
    assert np.isfinite(np.asarray(g2)).all()


def test_dice_loss_reference_formula():
    p = _rand_probs((4, 8, 8, 2))
    t = (RNG.uniform(size=(4, 8, 8, 2)) > 0.5).astype(np.float32)
    smooth = 1e-5
    inter, ys, zs = (p * t).sum(), (t * t).sum(), (p * p).sum()
    want = 1 - (2 * inter + smooth) / (zs + ys + smooth)
    got = float(dice_loss(jnp.asarray(p), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dice_loss_multi_ignores_background():
    logits = RNG.normal(size=(4, 8, 8, 2)).astype(np.float32)
    p = np.asarray(jnp.asarray(logits))
    p = np.exp(p) / np.exp(p).sum(-1, keepdims=True)
    t = RNG.integers(0, 2, (4, 8, 8))
    smooth = 1e-5
    ti = (t == 1).astype(np.float32)
    s = p[..., 1]
    want = 1 - (2 * (s * ti).sum() + smooth) / ((s * s).sum() + ti.sum() + smooth)
    got = float(dice_loss_multi(jnp.asarray(p), jnp.asarray(t), num_classes=2, ignore_index=0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cross_entropy_matches_torch():
    logits = RNG.normal(size=(4, 8, 8, 3)).astype(np.float32)
    t = RNG.integers(0, 3, (4, 8, 8))
    want = torch.nn.CrossEntropyLoss()(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)), torch.from_numpy(t)
    ).item()
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_kd_matches_torch_kldivloss():
    p = _rand_probs((4, 8, 8, 2))
    q = _rand_probs((4, 8, 8, 2))
    tp, tq = torch.from_numpy(p), torch.from_numpy(q)
    crit = torch.nn.KLDivLoss()
    want = (crit(tp.log(), tq) + crit(tq.log(), tp)).item()
    got = float(kd_loss(jnp.asarray(p), jnp.asarray(q)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_mse_matches_torch():
    a = RNG.normal(size=(4, 8, 8, 3)).astype(np.float32)
    b = RNG.normal(size=(4, 8, 8, 3)).astype(np.float32)
    want = F.mse_loss(torch.from_numpy(a), torch.from_numpy(b)).item()
    got = float(mse_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


# --- binary (2-class) head specializations vs the generic softmax path ----


def _logits2():
    return RNG.normal(size=(4, 8, 8, 2)).astype(np.float32) * 3.0


def test_binary_head_ce_equals_cross_entropy():
    lg = _logits2()
    t = RNG.integers(0, 2, (4, 8, 8))
    l = jnp.asarray(lg[..., 1] - lg[..., 0])
    want = float(cross_entropy_loss(jnp.asarray(lg), jnp.asarray(t)))
    got = float(bce_with_logits_loss(l, jnp.asarray(t).astype(jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_binary_head_dice_equals_dice_multi():
    lg = _logits2()
    t = RNG.integers(0, 2, (4, 8, 8))
    p = np.asarray(jax.nn.softmax(jnp.asarray(lg), axis=-1))
    want = float(dice_loss_multi(jnp.asarray(p), jnp.asarray(t), num_classes=2, ignore_index=0))
    l = jnp.asarray(lg[..., 1] - lg[..., 0])
    got = float(dice_loss(jax.nn.sigmoid(l), jnp.asarray(t) == 1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_binary_kd_equals_kd_loss():
    lp, lq = _logits2(), _logits2()
    pp = np.asarray(jax.nn.softmax(jnp.asarray(lp), axis=-1))
    qq = np.asarray(jax.nn.softmax(jnp.asarray(lq), axis=-1))
    for eps in (0.0, 1e-8):
        want = float(kd_loss(jnp.asarray(pp), jnp.asarray(qq), eps=eps))
        got = float(
            binary_kd_loss(
                jnp.asarray(lp[..., 1] - lp[..., 0]),
                jnp.asarray(lq[..., 1] - lq[..., 0]),
                eps=eps,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_binary_mse_equals_mse_on_softmax():
    lp, lq = _logits2(), _logits2()
    pp = jax.nn.softmax(jnp.asarray(lp), axis=-1)
    qq = jax.nn.softmax(jnp.asarray(lq), axis=-1)
    want = float(mse_loss(pp, qq))
    got = float(
        binary_mse_consistency(
            jnp.asarray(lp[..., 1] - lp[..., 0]), jnp.asarray(lq[..., 1] - lq[..., 0])
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)
