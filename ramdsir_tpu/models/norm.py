"""Normalization layers with torch-compatible semantics, NHWC layout.

Covers the reference's `normalization(...)` factory
(/root/reference/code/networks/unet.py:17-28) — 'bn', 'gn', 'in', 'dsbn' —
and the per-domain BN bank (/root/reference/code/networks/dsbn.py:4-34).

Torch-compatibility notes (deliberate, so checkpoints interchange):
  * BatchNorm normalizes with *biased* batch variance but updates the running
    variance with the *unbiased* estimate (factor n/(n-1)), momentum 0.1 in
    torch convention: new = (1-m)*old + m*batch.
  * On a sharded batch under `jax.jit`, the mean/var reductions below are
    *global* over the logical batch — XLA inserts the cross-device psum.
    This exactly matches the reference's effective single-GPU DataParallel
    numerics (global-batch BN), i.e. we get sync-BN for free.
  * Test-time "BN adaptation" (the reference eval scripts flip BatchNorm back
    to train mode, test_fundus_slice.py:75-86) maps to calling with
    use_running_average=False and discarding the mutated stats: predictions
    only depend on batch stats in that mode.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.BatchNorm2d convention: new = (1-m)*old + m*batch.  Single source
# of truth — train/steps.py's fused-dual running-stat merge composes two
# sequential updates in closed form and must use the SAME momentum.
BN_MOMENTUM = 0.1


class BatchNorm(nn.Module):
    """BatchNorm over NHWC with torch nn.BatchNorm2d semantics.

    s2d=True: the input is the 2x2 space-to-depth packing of the logical
    map (last dim = 4*features, c-major — models/s2d.py).  Statistics
    contract the extra 4 positions into their C channel (a free (...,C,4)
    reshape), so stats, running stats, and affine params stay (C,) and the
    numerics equal the pixel-domain norm exactly.

    dual=True: the batch is the concatenation [pass1; pass2] of the fused
    dual forward (train/steps.py) stacked on axis 0.  In train mode each
    half is normalized by ITS OWN batch statistics and the running stats
    receive the two torch updates composed sequentially (pass1's then
    pass2's) — exactly the reference's two consecutive forwards
    (train.py:246-287).  The leading-axis (2B,)->(2,B,) reshapes are
    layout-free on TPU (minor-dim tiling untouched), unlike the vmapped
    formulation whose (2,B,...) arrays forced relayout copies at every
    conv boundary.
    """

    features: int
    momentum: float = BN_MOMENTUM
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    s2d: bool = False
    dual: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, *, use_running_average: bool, n_valid: Optional[int] = None
    ) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        # eval normalizes every row identically -> dual structure is moot
        dual = self.dual and not use_running_average

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            # Batch padded for mesh divisibility: statistics come from the
            # REAL rows only (static slice), so padded-batch numerics equal
            # the unpadded batch exactly.  n_valid is a Python int -> no
            # dynamic shapes; XLA still reduces globally across shards.
            if dual:
                half = x.shape[0] // 2
                xh = xf.reshape(2, half, *x.shape[1:])
                xs = xh[:, :n_valid] if (n_valid is not None and n_valid < half) else xh
            else:
                xs = xf[:n_valid] if (n_valid is not None and n_valid < x.shape[0]) else xf
            lead = 1 if dual else 0  # stat axes exclude the (2,) half axis
            if self.s2d:
                xs = xs.reshape(*xs.shape[:-1], self.features, 4)
                axes = tuple(i for i in range(lead, xs.ndim) if i != xs.ndim - 2)
            else:
                axes = tuple(range(lead, xs.ndim - 1))
            mean = jnp.mean(xs, axis=axes)          # (C,) or (2, C)
            mean2 = jnp.mean(jnp.square(xs), axis=axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = xs.size / self.features / (2 if dual else 1)
                unbiased = var * (n / max(n - 1.0, 1.0))
                m = self.momentum
                if dual:
                    # two sequential torch updates composed in closed form
                    ra_mean.value = (1.0 - m) * (
                        (1.0 - m) * ra_mean.value + m * mean[0]
                    ) + m * mean[1]
                    ra_var.value = (1.0 - m) * (
                        (1.0 - m) * ra_var.value + m * unbiased[0]
                    ) + m * unbiased[1]
                else:
                    ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                    ra_var.value = (1.0 - m) * ra_var.value + m * unbiased

        # Stats are f32 (torch parity); the normalize itself runs in the
        # activation dtype.  Under bf16 compute this keeps every BN-adjacent
        # elementwise pass AND its backward cotangets at bf16 bandwidth —
        # the f32 x-cast above only feeds the reductions, which XLA fuses
        # (bf16 read, f32 accumulate) without materializing an f32 map.
        dt = self.dtype or x.dtype
        inv = jax.lax.rsqrt(var + self.eps)
        mean_c, inv_c, scale_c, bias_c = mean, inv, scale, bias
        if self.s2d:
            from ramdsir_tpu.models.s2d import repeat4

            mean_c, inv_c = repeat4(mean), repeat4(inv)
            scale_c, bias_c = repeat4(scale), repeat4(bias)
        if dual:
            half = x.shape[0] // 2
            xh = x.astype(dt).reshape(2, half, *x.shape[1:])
            sp = (slice(None),) + (None,) * (x.ndim - 1)  # (2, 1, 1, 1, C)
            y = (xh - mean_c.astype(dt)[sp]) * inv_c.astype(dt)[sp]
            y = y * scale_c.astype(dt) + bias_c.astype(dt)
            return y.reshape(x.shape)
        y = (x.astype(dt) - mean_c.astype(dt)) * inv_c.astype(dt)
        y = y * scale_c.astype(dt) + bias_c.astype(dt)
        return y


class DomainSpecificBatchNorm(nn.Module):
    """A bank of per-domain BatchNorms selected by a scalar domain index.

    Mirrors DomainSpecificBatchNorm2d (dsbn.py:24-34): the whole (sub-)batch
    must belong to one domain; affine params AND running stats are per-domain.
    Parameters are stored stacked as (num_domains, features) so a traced
    domain index works (gather + scatter on the bank).
    """

    features: int
    num_domains: int
    momentum: float = BN_MOMENTUM
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    s2d: bool = False  # input is the 2x2 packing (last dim 4*features)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        domain: jax.Array,
        *,
        use_running_average: bool,
        n_valid: Optional[int] = None,
    ) -> jax.Array:
        domain = jnp.asarray(domain, jnp.int32)
        shape = (self.num_domains, self.features)
        scale = self.param("scale", nn.initializers.ones, shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, shape, jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(shape, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(shape, jnp.float32))

        if domain.ndim == 1:
            # Vectorized mode: per-SAMPLE domain labels.  One pass computes
            # segment (per-domain) statistics over the whole batch — exactly
            # the per-sub-batch stats of the looped reference path, but the
            # convs around this norm run once on the full batch (MXU-friendly
            # batching instead of 3-7-image slivers).
            return self._segment_bn(
                x, domain, scale, bias, ra_mean, ra_var, use_running_average, n_valid
            )

        d = domain.reshape(())
        if use_running_average:
            mean = jnp.take(ra_mean.value, d, axis=0)
            var = jnp.take(ra_var.value, d, axis=0)
        else:
            xf = x.astype(jnp.float32)
            xs = xf[:n_valid] if (n_valid is not None and n_valid < x.shape[0]) else xf
            if self.s2d:
                xs = xs.reshape(*xs.shape[:-1], self.features, 4)
                axes = tuple(i for i in range(xs.ndim) if i != xs.ndim - 2)
            else:
                axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xs, axis=axes)
            mean2 = jnp.mean(jnp.square(xs), axis=axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = xs.size / self.features
                unbiased = var * (n / max(n - 1.0, 1.0))
                m = self.momentum
                new_mean = (1.0 - m) * jnp.take(ra_mean.value, d, axis=0) + m * mean
                new_var = (1.0 - m) * jnp.take(ra_var.value, d, axis=0) + m * unbiased
                ra_mean.value = ra_mean.value.at[d].set(new_mean)
                ra_var.value = ra_var.value.at[d].set(new_var)

        dt = self.dtype or x.dtype
        inv = jax.lax.rsqrt(var + self.eps)
        scale_d = jnp.take(scale, d, axis=0)
        bias_d = jnp.take(bias, d, axis=0)
        if self.s2d:
            from ramdsir_tpu.models.s2d import repeat4

            mean, inv = repeat4(mean), repeat4(inv)
            scale_d, bias_d = repeat4(scale_d), repeat4(bias_d)
        y = (x.astype(dt) - mean.astype(dt)) * inv.astype(dt)
        y = y * scale_d.astype(dt) + bias_d.astype(dt)
        return y

    def _segment_bn(
        self, x, domain, scale, bias, ra_mean, ra_var, use_running_average, n_valid=None
    ):
        xf = x.astype(jnp.float32)
        b, h, w, _ = xf.shape
        k = 4 if self.s2d else 1  # packed positions folded into each C
        onehot = jax.nn.one_hot(domain, self.num_domains, dtype=jnp.float32)  # (B, D)

        if use_running_average:
            mean_d, var_d = ra_mean.value, ra_var.value
        else:
            # stats from REAL rows only (see BatchNorm): padded tail rows are
            # statically sliced out; normalization still covers all rows.
            # Contract the RAW activations (bf16 under mixed precision) with
            # f32 accumulation: bf16 values are exact in f32 and bf16 x bf16
            # products fit f32's mantissa, so per-sample sums/sum-of-squares
            # match f32 math while reading half the bytes of the old
            # materialize-f32-then-einsum path.
            xv = x[:n_valid] if (n_valid is not None and n_valid < b) else x
            if self.s2d:
                xv = xv.reshape(*xv.shape[:-1], self.features, 4)
            ov = onehot[: xv.shape[0]]
            cnt = jnp.sum(ov, axis=0) * (h * w * k)  # pixels per domain
            safe_cnt = jnp.maximum(cnt, 1.0)
            if self.s2d:
                s1_bc = jnp.sum(xv, axis=(1, 2, 4), dtype=jnp.float32)
                s2_bc = jnp.einsum(
                    "bhwcp,bhwcp->bc", xv, xv, preferred_element_type=jnp.float32
                )
            else:
                s1_bc = jnp.sum(xv, axis=(1, 2), dtype=jnp.float32)
                s2_bc = jnp.einsum(
                    "bhwc,bhwc->bc", xv, xv, preferred_element_type=jnp.float32
                )
            sum_x = jnp.einsum("bc,bd->dc", s1_bc, ov)
            sum_x2 = jnp.einsum("bc,bd->dc", s2_bc, ov)
            mean_d = sum_x / safe_cnt[:, None]
            var_d = jnp.maximum(sum_x2 / safe_cnt[:, None] - jnp.square(mean_d), 0.0)
            if not self.is_initializing():
                m = self.momentum
                unbiased = var_d * (safe_cnt / jnp.maximum(safe_cnt - 1.0, 1.0))[:, None]
                present = (cnt > 0)[:, None]
                ra_mean.value = jnp.where(
                    present, (1.0 - m) * ra_mean.value + m * mean_d, ra_mean.value
                )
                ra_var.value = jnp.where(
                    present, (1.0 - m) * ra_var.value + m * unbiased, ra_var.value
                )

        # per-sample gather of this sample's domain stats/affine
        dt = self.dtype or x.dtype
        mean_b = onehot @ mean_d  # (B, C)
        var_b = onehot @ var_d
        scale_b = onehot @ scale
        bias_b = onehot @ bias
        inv_b = jax.lax.rsqrt(var_b + self.eps)
        if self.s2d:
            from ramdsir_tpu.models.s2d import repeat4

            mean_b, inv_b = repeat4(mean_b), repeat4(inv_b)
            scale_b, bias_b = repeat4(scale_b), repeat4(bias_b)
        y = (x.astype(dt) - mean_b.astype(dt)[:, None, None, :]) * inv_b.astype(dt)[:, None, None, :]
        y = y * scale_b.astype(dt)[:, None, None, :] + bias_b.astype(dt)[:, None, None, :]
        return y


class InstanceNorm(nn.Module):
    """torch nn.InstanceNorm2d defaults: no affine, no running stats."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
        inv = jax.lax.rsqrt(var + self.eps)
        y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
        return y


class Norm(nn.Module):
    """Normalization switch mirroring unet.py:17-28.

    'gn' is GroupNorm with a single group (layer-norm over C,H,W).
    """

    features: int
    norm: str = "bn"
    num_domains: Optional[int] = None
    s2d: bool = False  # input is 2x2-packed (models/s2d.py); bn/dsbn only
    dual: bool = False  # batch = [pass1; pass2] per-half stats; bn only

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool,
        domain: Optional[jax.Array] = None,
        n_valid: Optional[int] = None,
    ) -> jax.Array:
        if self.norm == "bn":
            return BatchNorm(self.features, s2d=self.s2d, dual=self.dual)(
                x, use_running_average=not train, n_valid=n_valid
            )
        if self.dual:
            raise ValueError(f"dual-half stats support bn only, not {self.norm!r}")
        if self.norm == "dsbn":
            if domain is None:
                raise ValueError("dsbn requires a domain index")
            return DomainSpecificBatchNorm(self.features, self.num_domains, s2d=self.s2d)(
                x, domain, use_running_average=not train, n_valid=n_valid
            )
        if self.s2d:
            raise ValueError(f"s2d packing supports bn/dsbn norms, not {self.norm!r}")
        if self.norm == "gn":
            return nn.GroupNorm(num_groups=1, epsilon=1e-5)(x)
        if self.norm == "in":
            return InstanceNorm(self.features)(x)
        raise ValueError(f"Normalization type {self.norm} is not supported")
