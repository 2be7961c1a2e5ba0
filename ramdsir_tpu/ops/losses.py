"""Loss library (jnp), numerically matching the reference's used losses.

Reference: /root/reference/code/utils/losses.py and the torch builtins used
by code/train.py (BCELoss, CrossEntropyLoss, KLDivLoss, MSELoss).

All losses reduce over the *whole* batch exactly like the reference (global
sums, not per-sample means), so values are comparable step-for-step. Inputs
are NHWC; the channel axis is last (the reference is NCHW — only the axis
differs, reductions are global so values match).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import xlogy


def bce_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """torch nn.BCELoss on probabilities: mean over all elements.

    torch clamps each log term at -100 for stability; replicated here.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    # Gradient-safe floor: smallest NORMAL fp32 (subnormals are flushed to
    # zero on some backends, which would reintroduce log(0)).  torch clamps
    # the log at -100; this floors it at ~-87.3, which only differs inside
    # the fully-saturated regime where both are sentinel values.
    floor = 1.18e-38
    log_p = jnp.log(jnp.maximum(pred, floor))
    log_1p = jnp.log(jnp.maximum(1.0 - pred, floor))
    return -jnp.mean(target * log_p + (1.0 - target) * log_1p)


def bce_with_logits_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    """BCE on logits via softplus — numerically exact where torch's
    BCELoss(sigmoid(x)) is, and finite/stable where fp32 sigmoid saturates
    (|x| > ~17) instead of hitting the -100 clamp.  This is what the train
    step uses (the reference applies BCELoss to sigmoid outputs,
    train.py:202,248)."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    # log sigmoid(x) = -softplus(-x);  log(1 - sigmoid(x)) = -softplus(x)
    loss = target * jax.nn.softplus(-logits) + (1.0 - target) * jax.nn.softplus(logits)
    return jnp.mean(loss)


def dice_loss(score: jax.Array, target: jax.Array) -> jax.Array:
    """Soft dice with squared-sum denominator, smooth 1e-5 (losses.py:8-16)."""
    score = score.astype(jnp.float32)
    target = target.astype(jnp.float32)
    smooth = 1e-5
    intersect = jnp.sum(score * target)
    y_sum = jnp.sum(target * target)
    z_sum = jnp.sum(score * score)
    return 1.0 - (2.0 * intersect + smooth) / (z_sum + y_sum + smooth)


def dice_loss_multi(
    score: jax.Array, target: jax.Array, num_classes: int, ignore_index: int = 255
) -> jax.Array:
    """Per-class soft dice vs an integer mask (losses.py:18-33).

    `score` is (B, H, W, C) softmax probabilities; `target` is (B, H, W) int.
    Classes equal to `ignore_index` are skipped (background for prostate).
    """
    score = score.astype(jnp.float32)
    smooth = 1e-5
    loss = 0.0
    count = 0
    for i in range(num_classes):
        if i == ignore_index:
            continue
        count += 1
        t = (target == i).astype(jnp.float32)
        s = score[..., i]
        intersect = jnp.sum(s * t)
        y_sum = jnp.sum(t)  # t is 0/1 so t*t == t
        z_sum = jnp.sum(s * s)
        loss = loss + 1.0 - (2.0 * intersect + smooth) / (z_sum + y_sum + smooth)
    return loss / count


def cross_entropy_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    """torch nn.CrossEntropyLoss (mean) on NHWC logits and int targets.

    The label pick is a one-hot contraction, NOT take_along_axis: XLA:TPU
    lowers a per-pixel gather over a (B,H,W,C) map to a "custom fusion"
    that cost 50.6 ms/step — 39% of the whole prostate train step — in the
    round-3 trace; the one-hot multiply-sum is a pure VPU elementwise+
    reduce at memory bandwidth and is exactly equal (one-hot rows select
    the same logp element; both forms' gradients scatter the same way).
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(target, logits.shape[-1], dtype=jnp.float32)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def _kl_div_mean(log_input: jax.Array, target: jax.Array) -> jax.Array:
    """torch nn.KLDivLoss(reduction='mean'): mean over ALL elements of
    target * (log(target) - log_input), with 0*log(0) := 0."""
    pointwise = xlogy(target, target) - target * log_input
    return jnp.mean(pointwise)


def kd_loss(p: jax.Array, q: jax.Array, eps: float = 0.0) -> jax.Array:
    """Symmetric KL consistency (reference train.py:85-88).

    KD(input, target) = KLDiv(input.log(), target) + KLDiv(target.log(), input)
    on probabilities.  `eps` > 0 optionally clips probabilities away from 0
    (the reference does not; keep 0 for parity).
    """
    p = p.astype(jnp.float32)
    q = q.astype(jnp.float32)
    if eps:
        p = jnp.clip(p, eps, 1.0)
        q = jnp.clip(q, eps, 1.0)
    return _kl_div_mean(jnp.log(p), q) + _kl_div_mean(jnp.log(q), p)


def mse_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    """torch nn.MSELoss (mean)."""
    diff = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.mean(jnp.square(diff))


# --- Two-class specializations on the logit-DIFFERENCE map ----------------
#
# For num_classes == 2 every softmax-based loss is an exact function of the
# single map l = logits[..., 1] - logits[..., 0]:
#   softmax[..., 1] = sigmoid(l),  softmax[..., 0] = sigmoid(-l)
# The (B, H, W, 2) probability tensors the generic path materializes tile
# the TPU's 128-lane minor dimension at 2/128 occupancy — the round-4
# prostate trace showed ~9 ms/step of loss/softmax loop fusions on
# f32[10,384,384,2] maps running at ~1-2% of VPU bandwidth.  The (B, H, W)
# map forms below compute the same values (fp differences ~1e-7: sigmoid vs
# max-subtracted softmax) on well-tiled arrays.  train/steps.py uses them
# whenever the dataset head has exactly 2 classes (prostate,
# /root/reference/code/train.py:393-498); equality with the generic path is
# pinned in tests/test_losses.py.


def binary_kd_loss(l_p: jax.Array, l_q: jax.Array, eps: float = 0.0) -> jax.Array:
    """`kd_loss(softmax(p), softmax(q))` from 2-class logit-difference maps.

    l_p, l_q: (B, H, W) logit differences of the two passes.  Matches
    kd_loss's mean over ALL (B, H, W, 2) elements and its eps clip.
    """
    l_p = l_p.astype(jnp.float32)
    l_q = l_q.astype(jnp.float32)
    p1, p0 = jax.nn.sigmoid(l_p), jax.nn.sigmoid(-l_p)
    q1, q0 = jax.nn.sigmoid(l_q), jax.nn.sigmoid(-l_q)
    if eps:
        p1, p0 = jnp.clip(p1, eps, 1.0), jnp.clip(p0, eps, 1.0)
        q1, q0 = jnp.clip(q1, eps, 1.0), jnp.clip(q0, eps, 1.0)
    pointwise = (
        (xlogy(q1, q1) - q1 * jnp.log(p1))
        + (xlogy(q0, q0) - q0 * jnp.log(p0))
        + (xlogy(p1, p1) - p1 * jnp.log(q1))
        + (xlogy(p0, p0) - p0 * jnp.log(q0))
    )
    return jnp.mean(pointwise) / 2.0


def binary_mse_consistency(l_p: jax.Array, l_q: jax.Array) -> jax.Array:
    """`mse_loss(softmax(p), softmax(q))` from logit-difference maps: the
    class-0 difference is the negative of the class-1 difference, so the
    mean over both classes equals the mean over the class-1 map alone."""
    d = jax.nn.sigmoid(l_p.astype(jnp.float32)) - jax.nn.sigmoid(l_q.astype(jnp.float32))
    return jnp.mean(jnp.square(d))


# --- The remainder of the reference loss library (losses.py:35-162).
# Shipped-but-unused by the reference entry points; provided for API
# completeness.  Channel axis is LAST (NHWC).


def dice_loss1(score: jax.Array, target: jax.Array) -> jax.Array:
    """Linear-denominator soft dice (losses.py:35-43)."""
    score = score.astype(jnp.float32)
    target = target.astype(jnp.float32)
    smooth = 1e-5
    intersect = jnp.sum(score * target)
    return 1.0 - (2.0 * intersect + smooth) / (jnp.sum(score) + jnp.sum(target) + smooth)


def entropy_loss(p: jax.Array, num_classes: int = 2) -> jax.Array:
    """Mean normalized entropy of probabilities (losses.py:45-50)."""
    p = p.astype(jnp.float32)
    ent = -jnp.sum(p * jnp.log(p + 1e-6), axis=-1) / jnp.log(num_classes)
    return jnp.mean(ent)


def entropy_loss_map(p: jax.Array, num_classes: int = 2) -> jax.Array:
    """Pixelwise normalized entropy map (losses.py:71-73)."""
    p = p.astype(jnp.float32)
    return -jnp.sum(p * jnp.log(p + 1e-6), axis=-1, keepdims=True) / jnp.log(num_classes)


def entropy_minimization(p: jax.Array) -> jax.Array:
    """Unnormalized mean entropy (losses.py:152-156)."""
    p = p.astype(jnp.float32)
    return jnp.mean(-jnp.sum(p * jnp.log(p + 1e-6), axis=-1))


def entropy_map(p: jax.Array) -> jax.Array:
    """Unnormalized pixelwise entropy (losses.py:159-162)."""
    p = p.astype(jnp.float32)
    return -jnp.sum(p * jnp.log(p + 1e-6), axis=-1, keepdims=True)


def softmax_dice_loss(input_logits: jax.Array, target_logits: jax.Array) -> jax.Array:
    """Mean per-class dice between two softmaxes (losses.py:52-68)."""
    ps = jax.nn.softmax(input_logits.astype(jnp.float32), axis=-1)
    pt = jax.nn.softmax(target_logits.astype(jnp.float32), axis=-1)
    n = ps.shape[-1]
    total = 0.0
    for i in range(n):
        total = total + dice_loss1(ps[..., i], pt[..., i])
    return total / n


def softmax_mse_loss(input_logits: jax.Array, target_logits: jax.Array) -> jax.Array:
    """Elementwise (softmax(a) - softmax(b))^2, unreduced (losses.py:75-87)."""
    ps = jax.nn.softmax(input_logits.astype(jnp.float32), axis=-1)
    pt = jax.nn.softmax(target_logits.astype(jnp.float32), axis=-1)
    return jnp.square(ps - pt)


def softmax_kl_loss(input_logits: jax.Array, target_logits: jax.Array) -> jax.Array:
    """Unreduced pointwise KL(target softmax || input softmax) (losses.py:89-103)."""
    logp = jax.nn.log_softmax(input_logits.astype(jnp.float32), axis=-1)
    pt = jax.nn.softmax(target_logits.astype(jnp.float32), axis=-1)
    return xlogy(pt, pt) - pt * logp


def symmetric_mse_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    """Mean squared difference, gradients to both sides (losses.py:105-113)."""
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


def focal_loss(
    logits: jax.Array,
    target: jax.Array,
    gamma: float = 2.0,
    alpha=None,
    size_average: bool = True,
) -> jax.Array:
    """Multi-class focal loss on NHWC logits + int targets (losses.py:115-149)."""
    logits = logits.astype(jnp.float32).reshape(-1, logits.shape[-1])
    target = target.reshape(-1).astype(jnp.int32)
    logpt = jax.nn.log_softmax(logits, axis=-1)
    logpt = jnp.take_along_axis(logpt, target[:, None], axis=-1)[:, 0]
    pt = jnp.exp(jax.lax.stop_gradient(logpt))
    if alpha is not None:
        alpha = jnp.asarray(alpha, jnp.float32)
        if alpha.ndim == 0:
            alpha = jnp.stack([alpha, 1.0 - alpha])
        logpt = logpt * alpha[target]
    loss = -((1.0 - pt) ** gamma) * logpt
    return jnp.mean(loss) if size_average else jnp.sum(loss)
