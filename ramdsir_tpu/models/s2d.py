"""Space-to-depth (2x2 block) domain for the low-channel top U-Net stages.

Why: the reference topology's top levels are 16/32-channel maps at full
resolution (networks/unet.py:248-271 — n=16 at 256^2, 2n at 128^2).  TPU
arrays tile the minor dimension onto 128 lanes, so a 16-channel bf16 map
runs every elementwise pass, BN reduce, and conv at 16/128 lane occupancy
and pays ~8x padded HBM traffic — measured as the throughput cap of the
whole train step (BENCH_NOTES.md trace breakdown).

Fix: represent a (B, H, W, C) map as its exact 2x2 space-to-depth packing
(B, H/2, W/2, 4C) and run the stage's convs/norms/resizes directly in that
domain.  Every op here is EXACTLY equivalent (to fp reassociation) to its
pixel-domain counterpart — pinned in tests/test_s2d.py:

  * channel layout is c-major: packed channel = c*4 + (py*2 + px), so
    channel-concat of packed maps == packing of the channel-concat (the
    ConvU skip concat needs this), and per-C statistics are a free
    (..., C, 4) reshape;
  * a KxK stride-1 SAME conv becomes a 3x3 (K=3) / 1x1 (K=1) conv on
    blocks whose (3,3,4Ci,4Co) kernel is a fixed sparse re-layout of the
    original (K,K,Ci,Co) weights (built by one gather per step, so the
    stored parameter tree is IDENTICAL to the plain path and checkpoints
    interchange);
  * 2x2 maxpool collapses to a max over the 4 block positions (no spatial
    op at all);
  * bilinear 2x upsample (half-pixel, torch align_corners=False ==
    jax.image.resize 'bilinear') from a pixel-domain map lands DIRECTLY in
    the packed domain of the doubled map via a separable 0.75/0.25 stencil.

The 3x3 block conv runs 4x the MACs of the pixel conv (the re-laid-out
kernel is 25% dense and the MXU does not skip zeros) but at 4x the output
lane occupancy — MXU time is a wash while HBM traffic drops ~4x, which is
what the top stages are bound by.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def pack(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), c-major block layout."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (b, hb, wb, c, py, px)
    return x.reshape(b, h // 2, w // 2, c * 4)


def unpack(x: jax.Array) -> jax.Array:
    """(B, Hb, Wb, 4C) -> (B, 2Hb, 2Wb, C)."""
    b, hb, wb, c4 = x.shape
    x = x.reshape(b, hb, wb, c4 // 4, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (b, hb, py, wb, px, c)
    return x.reshape(b, hb * 2, wb * 2, c4 // 4)


def pool2x2(xp: jax.Array) -> jax.Array:
    """2x2/stride-2 maxpool of the represented map, from its packing:
    max over the 4 block positions.  Returns the POOLED map in pixel
    domain at block resolution (B, Hb, Wb, C)."""
    b, hb, wb, c4 = xp.shape
    return xp.reshape(b, hb, wb, c4 // 4, 4).max(-1)


@lru_cache(maxsize=None)
def _upsample_kernel_np(c: int):
    """(3, 3, C, 4C) constant kernel: bilinear 2x upsample written straight
    into the packed layout.  Output channel c*4 + (py*2+px) at block (i,j)
    is out pixel (2i+py, 2j+px) = sum over the 3x3 input neighbourhood with
    separable weights wy[py] x wx[px], wy[0] = [.25, .75, 0] (prev row),
    wy[1] = [0, .75, .25] (next row)."""
    w1 = np.array([[0.25, 0.75, 0.0], [0.0, 0.75, 0.25]], np.float32)
    k = np.zeros((3, 3, c, 4 * c), np.float32)
    eye = np.eye(c, dtype=np.float32)
    for py in range(2):
        for px in range(2):
            k[:, :, :, py * 2 + px :: 4] = (
                w1[py][:, None, None, None] * w1[px][None, :, None, None] * eye
            )
    return k


@lru_cache(maxsize=None)
def _border_mask_np(hb: int, wb: int, c: int):
    """(hb, wb, 4C) constant correction for running the upsample stencil
    with ZERO padding instead of clamping: a clamped out-of-bounds tap
    duplicates the in-bounds edge value of the SAME stencil (.25 oob +
    .75 edge == 1.0 x edge), so zero-padding loses exactly a 3/4 factor
    per out-of-bounds axis — multiply those outputs by 4/3 (16/9 at
    corners).  Data-independent, exact."""
    my = np.ones((hb, 2), np.float32)
    my[0, 0] = 4.0 / 3.0    # block row 0, py=0 references row -1
    my[-1, 1] = 4.0 / 3.0   # last block row, py=1 references row h
    mx = np.ones((wb, 2), np.float32)
    mx[0, 0] = 4.0 / 3.0
    mx[-1, 1] = 4.0 / 3.0
    m = my[:, None, :, None] * mx[None, :, None, :]  # (hb, wb, py, px)
    return np.tile(m.reshape(hb, wb, 4), (1, 1, c))  # c-major packed chans


def upsample2x_into(x: jax.Array) -> jax.Array:
    """Bilinear 2x upsample of a PIXEL-domain map, produced directly in
    the packed domain of the doubled map: (B, h, w, C) -> (B, h, w, 4C).

    Half-pixel convention: out[2i] = .75*in[i] + .25*in[i-1] and
    out[2i+1] = .75*in[i] + .25*in[i+1] per axis, edges clamped — equal to
    jax.image.resize(..., 'bilinear') / torch align_corners=False
    (renormalized edge weights == clamping), pinned in tests/test_s2d.py.

    Implemented as ONE constant-kernel SAME conv times a constant border
    mask (zero-pad + exact 4/3-per-oob-axis correction, see
    _border_mask_np) — both the multiply and its gradient fuse into the
    conv.  Alternatives measured worse on the chip: shift/stack lowers to
    ~7 ms/step of 6-D interleave transposes; edge-pad + VALID costs
    ~2.3 ms/step of scatter-add (add_any) in the pad's backward; .at[]
    border adds cost ~11 ms/step of broken fusion.
    """
    c = x.shape[-1]
    _, h, w, _ = x.shape
    k = jnp.asarray(_upsample_kernel_np(c)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y * jnp.asarray(_border_mask_np(h, w, c)).astype(y.dtype)


@lru_cache(maxsize=None)
def _kernel_index_map(kh: int, kw: int):
    """Gather map (bkh, bkw, 4q, 4p) into the flattened (kh*kw + 1)-slot
    source (last slot = zero): block-kernel tap (bd, q->p) pulls original
    tap (dy, dx) = (2*bd_y + q_y - p_y, 2*bd_x + q_x - p_x) when in range.
    """
    if kh not in (1, 3) or kw not in (1, 3):
        raise ValueError(f"s2d conv supports 1x1/3x3 kernels, got {kh}x{kw}")
    r_h, r_w = kh // 2, kw // 2
    bk_h, bk_w = (3 if kh == 3 else 1), (3 if kw == 3 else 1)
    idx = np.full((bk_h, bk_w, 4, 4), kh * kw, dtype=np.int32)
    for bdy in range(-(bk_h // 2), bk_h // 2 + 1):
        for bdx in range(-(bk_w // 2), bk_w // 2 + 1):
            for qy in range(2):
                for qx in range(2):
                    for py in range(2):
                        for px in range(2):
                            dy = 2 * bdy + qy - py
                            dx = 2 * bdx + qx - px
                            if abs(dy) <= r_h and abs(dx) <= r_w:
                                idx[bdy + bk_h // 2, bdx + bk_w // 2,
                                    qy * 2 + qx, py * 2 + px] = (dy + r_h) * kw + (dx + r_w)
    return idx


def block_kernel(w: jax.Array) -> jax.Array:
    """(kh, kw, Ci, Co) pixel-domain HWIO kernel -> its exact block-domain
    (bkh, bkw, 4Ci, 4Co) re-layout (c-major on both sides)."""
    kh, kw, ci, co = w.shape
    idx = jnp.asarray(_kernel_index_map(kh, kw))
    flat = jnp.concatenate(
        [w.reshape(kh * kw, ci, co), jnp.zeros((1, ci, co), w.dtype)], axis=0
    )
    g = flat[idx]                      # (bkh, bkw, 4q, 4p, ci, co)
    g = g.transpose(0, 1, 4, 2, 5, 3)  # (bkh, bkw, ci, 4q, co, 4p)
    return g.reshape(g.shape[0], g.shape[1], ci * 4, co * 4)


def repeat4(v: jax.Array) -> jax.Array:
    """Per-C vector -> per-packed-channel (c-major): [a,b] -> [a,a,a,a,b,b,b,b]."""
    return jnp.repeat(v, 4, axis=-1)


@lru_cache(maxsize=None)
def _upsample_stencil_np():
    """(3, 3, 4) separable bilinear stencil: tap weight for packed output
    position q = py*2+px (same geometry as _upsample_kernel_np, without
    the identity channel factor)."""
    w1 = np.array([[0.25, 0.75, 0.0], [0.0, 0.75, 0.25]], np.float32)
    k = np.zeros((3, 3, 4), np.float32)
    for py in range(2):
        for px in range(2):
            k[:, :, py * 2 + px] = w1[py][:, None] * w1[px][None, :]
    return k


@lru_cache(maxsize=None)
def _down_kernel_index_map():
    """(4, 4, 4) gather map into the flattened 3x3 (+zero slot) source for
    the stride-2 fused pack-conv: stride-2 tap (a, b) for output position
    q = qy*2+qx pulls original tap (dy, dx) = (a-1-qy, b-1-qx) when in
    [-1,1] (zero otherwise)."""
    idx = np.full((4, 4, 4), 9, dtype=np.int32)
    for a in range(4):
        for b in range(4):
            for qy in range(2):
                for qx in range(2):
                    dy, dx = a - 1 - qy, b - 1 - qx
                    if abs(dy) <= 1 and abs(dx) <= 1:
                        idx[a, b, qy * 2 + qx] = (dy + 1) * 3 + (dx + 1)
    return idx


def down_kernel(w: jax.Array) -> jax.Array:
    """(3, 3, Ci, Co) pixel-domain kernel -> (4, 4, Ci, 4Co) stride-2
    kernel computing pack(conv3x3_SAME(x)) in ONE conv: output block
    (i, j) position q = out pixel (2i+qy, 2j+qx) = the 3x3 stencil over
    input pixels 2i+qy+dy — a stride-2 window of height 4 with padding
    (1, 1), zero-padded at the borders exactly like the SAME conv."""
    kh, kw, ci, co = w.shape
    if (kh, kw) != (3, 3):
        raise ValueError(f"down_kernel supports 3x3 kernels, got {kh}x{kw}")
    idx = jnp.asarray(_down_kernel_index_map())
    flat = jnp.concatenate(
        [w.reshape(9, ci, co), jnp.zeros((1, ci, co), w.dtype)], axis=0
    )
    g = flat[idx]                      # (4, 4, 4q, ci, co)
    g = g.transpose(0, 1, 3, 4, 2)     # (4, 4, ci, co, 4q)
    return g.reshape(4, 4, ci, co * 4)  # c-major: channel co*4 + q


def _packconv2_raw(x: jax.Array, wp: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, wp, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.custom_vjp
def packconv2(x: jax.Array, wp: jax.Array) -> jax.Array:
    """The S2DConvDown stride-2 4x4 conv with a hand-written weight-grad.

    XLA's native weight gradient for this conv contracts with the UNPACKED
    input's Ci (=16 at level 2) on the MXU's 128-lane dim — measured
    3.2 ms/step of a 87 ms prostate step (dW[4,4,16,128], round-4 trace)
    where the math is ~60 us.  The backward below computes the identical
    dW from the PACKED padded input: tap (a, b) of the stride-2 window is
    packed block (a//2, b//2) position (a%2, b%2), so
      dwp[2u+py, 2v+px, ci, co] = sum_{b,i,j} xp[b,i+u,j+v,ci*4+py*2+px]
                                              * dy[b,i,j,co]
    — four (4Ci x 4Co) matmuls with K = B*Hb*Wb, at 4x the lane occupancy.
    The input gradient keeps XLA's own transpose rule.
    """
    return _packconv2_raw(x, wp)


def _packconv2_fwd(x, wp):
    return _packconv2_raw(x, wp), (x, wp)


def _packconv2_bwd(res, dy):
    x, wp = res
    _, vjp_x = jax.vjp(lambda xx: _packconv2_raw(xx, wp), x)
    (dx,) = vjp_x(dy)
    ci = x.shape[-1]
    hb, wb = dy.shape[1], dy.shape[2]
    xp = pack(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))))  # (B, H/2+1, W/2+1, 4Ci)
    d2 = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.einsum(
                        "bijc,bijo->co",
                        xp[:, u : u + hb, v : v + wb, :],
                        dy,
                        preferred_element_type=jnp.float32,
                    )
                    for v in (0, 1)
                ]
            )
            for u in (0, 1)
        ]
    )  # (u, v, 4Ci, 4Co)
    co4 = dy.shape[-1]
    d2 = d2.reshape(2, 2, ci, 2, 2, co4)  # (u, v, ci, py, px, co)
    dwp = d2.transpose(0, 3, 1, 4, 2, 5).reshape(4, 4, ci, co4)
    return dx, dwp.astype(wp.dtype)


packconv2.defvjp(_packconv2_fwd, _packconv2_bwd)


class S2DConvDown(nn.Module):
    """Fused pack + 3x3 SAME conv for a stage ENTRY: pixel-domain input
    (B, H, W, Ci) -> packed stage map (B, H/2, W/2, 4Co) in one stride-2
    conv (see down_kernel).  vs pack-then-block-conv: no 6-D pack
    transpose, and 16*Ci*4Co MACs/block instead of 9*4Ci*4Co (44%).
    Stores the ORIGINAL (3, 3, Ci, Co) kernel + (Co,) bias under the same
    names/inits as the plain nn.Conv => bit-identical initialization and
    checkpoint interchange."""

    features: int
    kernel_init: Callable
    bias_init: Callable

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ci = x.shape[-1]
        w = self.param(
            "kernel", self.kernel_init, (3, 3, ci, self.features), jnp.float32
        )
        b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        wp = down_kernel(w.astype(x.dtype))
        y = packconv2(x, wp)
        return y + repeat4(b.astype(y.dtype))


class S2DUpConv(nn.Module):
    """Fused bilinear-2x-upsample + 1x1 conv, straight into the packed
    domain: (B, h, w, Ci) pixel input -> (B, h, w, 4Co) packing of the
    doubled-then-1x1-projected map.  The upsample is linear and the
    border mask depends only on (i, j, q), so it commutes with the per-q
    channel mixing of the 1x1: conv2(mask * up(x)) == mask * conv(x,
    stencil (x) W2) + bias — ONE SAME conv instead of upsample-conv +
    separate 1x1 (which cost its own activation round-trip).  Stores the
    ORIGINAL (1, 1, Ci, Co) kernel + (Co,) bias (same names/inits as the
    module it replaces => checkpoints interchange)."""

    features: int
    kernel_init: Callable
    bias_init: Callable

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ci = x.shape[-1]
        w = self.param(
            "kernel", self.kernel_init, (1, 1, ci, self.features), jnp.float32
        )
        b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        sten = jnp.asarray(_upsample_stencil_np()).astype(x.dtype)  # (3,3,4)
        wc = w[0, 0].astype(x.dtype)  # (Ci, Co)
        k = sten[:, :, None, None, :] * wc[None, None, :, :, None]
        k = k.reshape(3, 3, ci, 4 * self.features)  # c-major: co*4 + q
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        _, h, w_, _ = x.shape
        y = y * jnp.asarray(_border_mask_np(h, w_, self.features)).astype(y.dtype)
        return y + repeat4(b.astype(y.dtype))


class S2DConv(nn.Module):
    """Conv on packed maps, parameter-compatible with the plain nn.Conv it
    replaces: stores the ORIGINAL (K, K, Ci, Co) kernel + (Co,) bias under
    the same names ('kernel'/'bias'), re-laid-out per call by one gather.
    Same param path + init fns => bit-identical initialization and
    checkpoint interchange with the pixel-domain module."""

    features: int
    kernel: int
    kernel_init: Callable
    bias_init: Callable

    @nn.compact
    def __call__(self, xp: jax.Array) -> jax.Array:
        ci = xp.shape[-1] // 4
        w = self.param(
            "kernel", self.kernel_init,
            (self.kernel, self.kernel, ci, self.features), jnp.float32,
        )
        b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        wp = block_kernel(w.astype(xp.dtype))
        if self.kernel == 1:
            # 1x1 conv == per-position channel matmul on the (4Ci -> 4Co)
            # block-diagonal re-layout.  dot_general instead of a conv op:
            # XLA's conv layout assignment wraps 1x1 convs in batch-minor
            # copies (measured ~2 ms/step of data formatting); a plain
            # contraction over the minor dim needs none.
            y = jax.lax.dot_general(
                xp, wp[0, 0], (((xp.ndim - 1,), (0,)), ((), ()))
            )
        else:
            y = jax.lax.conv_general_dilated(
                xp, wp, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return y + repeat4(b.astype(y.dtype))
