"""Fused Pallas TPU kernel for the RAM amplitude band-mix.

The mix is elementwise over the half-spectrum: given the source FFT
(re, im), the donor amplitude, a per-sample ratio and the static band mask,
produce the re-scaled spectrum in a single VMEM pass — amplitude, blend,
rescale and the zero-amplitude corner case all fused, one HBM round-trip.

Layout: the (B, H, Wh, C) complex spectrum is folded to (B*C, H, Wh) planes
(channels-out so each grid step owns one full H x Wh plane on the VPU;
Wh = W//2+1 rides the 128-lane dimension).  Ratios live in SMEM.

On non-TPU backends the kernel runs in interpreter mode so tests exercise
the exact same code path on the virtual CPU mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mix_kernel(ratio_ref, re_ref, im_ref, amp_t_ref, mask_ref, out_re_ref, out_im_ref):
    i = pl.program_id(0)
    r = ratio_ref[i]
    re = re_ref[0]
    im = im_ref[0]
    amp_t = amp_t_ref[0]
    mask = mask_ref[...]

    amp_s = jnp.sqrt(re * re + im * im)
    new_amp = jnp.where(mask, r * amp_s + (1.0 - r) * amp_t, amp_s)
    factor = new_amp / jnp.maximum(amp_s, np.finfo(np.float32).tiny)
    zero = amp_s == 0.0
    out_re_ref[0] = jnp.where(zero, new_amp, re * factor)
    out_im_ref[0] = jnp.where(zero, jnp.zeros_like(im), im * factor)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mix_planes(re, im, amp_t, ratio, mask, interpret=False):
    n, h, wh = re.shape
    plane = pl.BlockSpec((1, h, wh), lambda i: (i, 0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM)
    mask_spec = pl.BlockSpec((h, wh), lambda i: (0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, h, wh), jnp.float32)
    return pl.pallas_call(
        _mix_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ratio, full (n,)
            plane,
            plane,
            plane,
            mask_spec,
        ],
        out_specs=(plane, plane),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(ratio, re, im, amp_t, mask)


def mix_spectrum_pallas(
    fft_src: jax.Array, amp_trg: jax.Array, ratio: jax.Array, mask2d: jax.Array
) -> jax.Array:
    """Fused band-mix. fft_src/amp_trg: (B, H, Wh, C); ratio: (B,);
    mask2d: (H, Wh) bool. Returns the mixed complex spectrum."""
    b, h, wh, c = fft_src.shape
    # (B, H, Wh, C) -> (B*C, H, Wh): each grid step owns one channel plane.
    fold = lambda x: jnp.transpose(x, (0, 3, 1, 2)).reshape(b * c, h, wh)
    re = fold(jnp.real(fft_src).astype(jnp.float32))
    im = fold(jnp.imag(fft_src).astype(jnp.float32))
    amp_t = fold(amp_trg.astype(jnp.float32))
    ratio_n = jnp.repeat(ratio.astype(jnp.float32), c)
    mask = mask2d.astype(jnp.float32) > 0.0

    interpret = jax.default_backend() != "tpu"
    out_re, out_im = _mix_planes(re, im, amp_t, ratio_n, mask, interpret=interpret)

    unfold = lambda x: jnp.transpose(x.reshape(b, c, h, wh), (0, 2, 3, 1))
    return jax.lax.complex(unfold(out_re), unfold(out_im))
