"""U-Net model zoo in Flax (NHWC, TPU-native layouts).

Topology-parity with the reference model zoo
(/root/reference/code/networks/unet.py):
  * ConvD   down-stage  (:32-72):  [maxpool if not first] -> conv3x3+norm ->
            conv3x3+norm+act -> conv3x3+norm+act
  * ConvU   up-stage    (:75-117): [conv3x3+norm+act if not first] ->
            bilinear x2 -> conv1x1(planes//2)+norm+act -> concat(skip) ->
            conv3x3+norm+act
  * ConvURec up-stage   (:120-165): skip-free, optional DSBN domain routing
  * Encoder (:248-271): 5 ConvD stages, c -> n..16n, returns all 5 maps
  * Decoder (:273-296): 4 ConvU + conv3x3 head
  * RecDecoder (:299-322): 4 ConvURec from bottleneck only + conv3x3 head
  * Variants kept for API completeness: Unet2D (:168-203), Unet2DMT
    (:206-245), Unet2DDS deep supervision (:325-378), Unet2DMS multi-scale
    (:381-430), Discriminator PatchGAN (:433-461).

Init parity: conv kernels Kaiming-normal fan_out (per activation), conv
biases torch-default uniform(+-1/sqrt(fan_in)); norm scale=1, bias=0.

Layout: NHWC everywhere (images are (B, H, W, C)); TPU convolutions tile the
channel dim onto the MXU lanes.  Upsampling is `jax.image.resize` bilinear
(half-pixel convention == torch align_corners=False).
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ramdsir_tpu.models.norm import Norm


def count_params(variables: Any) -> float:
    """Parameter count in millions (reference unet.py:13-15)."""
    params = variables.get("params", variables) if isinstance(variables, dict) else variables
    return sum(x.size for x in jax.tree.leaves(params)) / 1e6


def kaiming_normal_fanout(activation: str = "relu"):
    """torch nn.init.kaiming_normal_(mode='fan_out', nonlinearity=...).

    The reference (unet.py:259 etc.) calls kaiming_normal_ with its default
    a=0, which calculate_gain turns into sqrt(2/(1+0^2)) = sqrt(2) for BOTH
    'relu' and 'leaky_relu' — the 0.01 negative slope of the activation is
    NOT reflected in the init gain.
    """
    del activation  # gain is sqrt(2) for every nonlinearity the zoo uses
    gain = math.sqrt(2.0)

    def init(key, shape, dtype=jnp.float32):
        # flax conv kernel shape: (kh, kw, in_ch, out_ch); fan_out = kh*kw*out
        fan_out = shape[0] * shape[1] * shape[3]
        std = gain / math.sqrt(fan_out)
        return std * jax.random.normal(key, shape, dtype)

    return init


def torch_conv_bias_init(fan_in: int):
    """torch Conv2d default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def upsample2x(x: jax.Array) -> jax.Array:
    """Bilinear x2 upsample, align_corners=False (reference ConvU.pool)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


def _act(name: str):
    if name == "relu":
        return nn.relu
    return lambda x: nn.leaky_relu(x, 0.01)


class _Base(nn.Module):
    """Shared conv helper so every layer gets torch-parity init."""

    def conv(
        self,
        x,
        features: int,
        kernel: int,
        name: str,
        activation: str = "relu",
        s2d: bool = False,
    ):
        """s2d=True: x is a 2x2 space-to-depth packed map (models/s2d.py);
        the conv runs in the packed domain with the SAME stored parameters
        (original kernel shape + init), exactly equivalent numerics."""
        if s2d:
            from ramdsir_tpu.models.s2d import S2DConv

            fan_in = (x.shape[-1] // 4) * kernel * kernel
            return S2DConv(
                features,
                kernel,
                kernel_init=kaiming_normal_fanout(activation),
                bias_init=torch_conv_bias_init(fan_in),
                name=name,
            )(x)
        fan_in = x.shape[-1] * kernel * kernel
        return nn.Conv(
            features,
            (kernel, kernel),
            padding="SAME" if kernel > 1 else "VALID",
            use_bias=True,
            kernel_init=kaiming_normal_fanout(activation),
            bias_init=torch_conv_bias_init(fan_in),
            # compute in the activation dtype: with dtype=None flax would
            # promote(bf16 input, f32 params) -> f32 and silently run every
            # conv on the slow path; params stay f32 (param_dtype default)
            dtype=x.dtype,
            name=name,
        )(x)

    def downconv(self, x, features: int, name: str, activation: str = "relu"):
        """Fused pack + 3x3 SAME stage-entry conv: pixel-domain x ->
        packed stage map in ONE stride-2 conv (s2d.S2DConvDown); params
        identical to the plain 3x3 conv it replaces."""
        from ramdsir_tpu.models.s2d import S2DConvDown

        fan_in = x.shape[-1] * 9
        return S2DConvDown(
            features,
            kernel_init=kaiming_normal_fanout(activation),
            bias_init=torch_conv_bias_init(fan_in),
            name=name,
        )(x)

    def upconv(self, x, features: int, name: str, activation: str = "relu"):
        """Fused bilinear-2x-upsample + 1x1 conv into the packed domain
        (s2d.S2DUpConv); params identical to the 1x1 conv it replaces."""
        from ramdsir_tpu.models.s2d import S2DUpConv

        fan_in = x.shape[-1]
        return S2DUpConv(
            features,
            kernel_init=kaiming_normal_fanout(activation),
            bias_init=torch_conv_bias_init(fan_in),
            name=name,
        )(x)


class ConvD(_Base):
    """Down-stage.  s2d: run the convs/norms in the 2x2 packed domain and
    return the PACKED stage output; s2d_in: the input arrives packed (from
    a previous s2d stage), so the 2x2 maxpool collapses to a max over the
    4 block positions (models/s2d.py — exact equivalence)."""

    planes: int
    norm: str = "bn"
    first: bool = False
    activation: str = "relu"
    s2d: bool = False
    s2d_in: bool = False
    dual: bool = False  # batch = [pass1; pass2]; per-half BN stats

    @nn.compact
    def __call__(
        self, x: jax.Array, *, train: bool = True, n_valid: Optional[int] = None
    ) -> jax.Array:
        from ramdsir_tpu.models import s2d as s2d_ops

        act = _act(self.activation)
        if not self.first:
            x = s2d_ops.pool2x2(x) if self.s2d_in else nn.max_pool(x, (2, 2), strides=(2, 2))
        kw = dict(train=train, n_valid=n_valid)
        nkw = dict(s2d=self.s2d, dual=self.dual)
        # layer 1: conv, norm (no activation — reference unet.py:58-60).
        # s2d: fused pack+conv (stride-2) takes the pixel-domain x straight
        # into the packed stage domain — no pack transpose
        if self.s2d:
            x = self.downconv(x, self.planes, "conv1", self.activation)
        else:
            x = self.conv(x, self.planes, 3, "conv1", self.activation)
        x = Norm(self.planes, self.norm, name="bn1", **nkw)(x, **kw)
        # layer 2: conv, norm, act
        y = self.conv(x, self.planes, 3, "conv2", self.activation, s2d=self.s2d)
        y = Norm(self.planes, self.norm, name="bn2", **nkw)(y, **kw)
        y = act(y)
        # layer 3: conv, norm, act
        z = self.conv(y, self.planes, 3, "conv3", self.activation, s2d=self.s2d)
        z = Norm(self.planes, self.norm, name="bn3", **nkw)(z, **kw)
        z = act(z)
        return z


class ConvU(_Base):
    """Up-stage.  s2d: the post-upsample half of the block (1x1 conv,
    skip-concat, 3x3 conv) runs in the 2x2 packed domain — the bilinear 2x
    upsample writes DIRECTLY into the packing of the doubled map
    (s2d.upsample2x_into) and `prev` must arrive packed (c-major layout
    makes the channel concat equal the packing of the pixel concat).
    s2d_in: the stage input x is packed too, so conv1 runs packed."""

    planes: int
    norm: str = "bn"
    first: bool = False
    activation: str = "relu"
    s2d: bool = False
    s2d_in: bool = False
    dual: bool = False  # batch = [pass1; pass2]; per-half BN stats

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        prev: jax.Array,
        *,
        train: bool = True,
        n_valid: Optional[int] = None,
    ) -> jax.Array:
        from ramdsir_tpu.models import s2d as s2d_ops

        act = _act(self.activation)
        kw = dict(train=train, n_valid=n_valid)
        if not self.first:
            x = self.conv(x, self.planes, 3, "conv1", self.activation, s2d=self.s2d_in)
            x = Norm(self.planes, self.norm, s2d=self.s2d_in, dual=self.dual, name="bn1")(x, **kw)
            x = act(x)
        if self.s2d_in:
            x = s2d_ops.unpack(x)
        if self.s2d:
            # fused upsample + 1x1 (ONE conv straight into the packed domain)
            y = self.upconv(x, self.planes // 2, "conv2", self.activation)
        else:
            y = upsample2x(x)
            y = self.conv(y, self.planes // 2, 1, "conv2", self.activation)
        y = Norm(self.planes // 2, self.norm, s2d=self.s2d, dual=self.dual, name="bn2")(y, **kw)
        y = act(y)
        # channel-concat: skip first (reference torch.cat([prev, y], 1));
        # in c-major packed layout this equals packing the pixel concat
        y = jnp.concatenate([prev, y], axis=-1)
        y = self.conv(y, self.planes, 3, "conv3", self.activation, s2d=self.s2d)
        y = Norm(self.planes, self.norm, s2d=self.s2d, dual=self.dual, name="bn3")(y, **kw)
        y = act(y)
        return y


class ConvURec(_Base):
    """Skip-free up-stage with optional DSBN routing (unet.py:120-165).

    s2d/s2d_in: same packed-domain contract as ConvU (DSBN segment stats
    contract the 4 block positions into their channel — models/norm.py)."""

    planes: int
    norm: str = "bn"
    activation: str = "relu"
    num_domains: Optional[int] = None
    s2d: bool = False
    s2d_in: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        domain: Optional[jax.Array] = None,
        train: bool = True,
        n_valid: Optional[int] = None,
    ) -> jax.Array:
        from ramdsir_tpu.models import s2d as s2d_ops

        act = _act(self.activation)
        half = self.planes // 2
        kw = dict(train=train, domain=domain, n_valid=n_valid)
        x = self.conv(x, half, 3, "conv1", self.activation, s2d=self.s2d_in)
        x = Norm(half, self.norm, self.num_domains, s2d=self.s2d_in, name="bn1")(x, **kw)
        x = act(x)
        if self.s2d_in:
            x = s2d_ops.unpack(x)
        if self.s2d:
            # fused upsample + 1x1 (ONE conv straight into the packed domain)
            y = self.upconv(x, half, "conv2", self.activation)
        else:
            y = upsample2x(x)
            y = self.conv(y, half, 1, "conv2", self.activation)
        y = Norm(half, self.norm, self.num_domains, s2d=self.s2d, name="bn2")(y, **kw)
        y = act(y)
        y = self.conv(y, half, 3, "conv3", self.activation, s2d=self.s2d)
        y = Norm(half, self.norm, self.num_domains, s2d=self.s2d, name="bn3")(y, **kw)
        y = act(y)
        return y


class Encoder(_Base):
    """5-stage encoder, channels c -> n,2n,4n,8n,16n (unet.py:248-271).

    s2d_levels: how many TOP (highest-resolution, lowest-channel) stages
    run in the 2x2 space-to-depth domain (0-3).  The returned
    feature maps for those stages are PACKED (c-major, models/s2d.py) —
    Decoder must be built with the same s2d_levels.  Numerics are exactly
    equivalent to s2d_levels=0 (tests/test_s2d.py); the packing lifts the
    16/32-channel maps to 64/128 channels so TPU lane occupancy and HBM
    tile padding stop capping the top stages (BENCH_NOTES.md)."""

    c: int = 3
    n: int = 16
    norm: str = "bn"
    activation: str = "relu"
    s2d_levels: int = 0
    dual: bool = False  # batch = [pass1; pass2]; per-half BN stats

    @nn.compact
    def __call__(
        self, x: jax.Array, *, train: bool = True, n_valid: Optional[int] = None
    ) -> List[jax.Array]:
        n = self.n
        s1, s2, s3 = (self.s2d_levels >= 1, self.s2d_levels >= 2,
                      self.s2d_levels >= 3)
        kw = dict(train=train, n_valid=n_valid)
        d = self.dual
        x1 = ConvD(n, self.norm, first=True, activation=self.activation,
                   s2d=s1, dual=d, name="convd1")(x, **kw)
        x2 = ConvD(2 * n, self.norm, activation=self.activation,
                   s2d=s2, s2d_in=s1, dual=d, name="convd2")(x1, **kw)
        x3 = ConvD(4 * n, self.norm, activation=self.activation,
                   s2d=s3, s2d_in=s2, dual=d, name="convd3")(x2, **kw)
        x4 = ConvD(8 * n, self.norm, activation=self.activation,
                   s2d_in=s3, dual=d, name="convd4")(x3, **kw)
        x5 = ConvD(16 * n, self.norm, activation=self.activation, dual=d, name="convd5")(x4, **kw)
        return [x1, x2, x3, x4, x5]


class Decoder(_Base):
    """Segmentation decoder over all 5 encoder maps (unet.py:273-296)."""

    n: int = 16
    num_classes: int = 2
    norm: str = "bn"
    activation: str = "relu"
    s2d_levels: int = 0  # must match the Encoder's (skips arrive packed)
    dual: bool = False  # batch = [pass1; pass2]; per-half BN stats

    @nn.compact
    def __call__(
        self,
        feats: Sequence[jax.Array],
        *,
        train: bool = True,
        n_valid: Optional[int] = None,
    ) -> jax.Array:
        from ramdsir_tpu.models import s2d as s2d_ops

        n = self.n
        s1, s2, s3 = (self.s2d_levels >= 1, self.s2d_levels >= 2,
                      self.s2d_levels >= 3)
        kw = dict(train=train, n_valid=n_valid)
        d = self.dual
        y4 = ConvU(16 * n, self.norm, first=True, activation=self.activation,
                   dual=d, name="convu4")(feats[-1], feats[-2], **kw)
        y3 = ConvU(8 * n, self.norm, activation=self.activation,
                   s2d=s3, dual=d, name="convu3")(y4, feats[-3], **kw)
        y2 = ConvU(4 * n, self.norm, activation=self.activation,
                   s2d=s2, s2d_in=s3, dual=d, name="convu2")(y3, feats[-4], **kw)
        y1 = ConvU(2 * n, self.norm, activation=self.activation,
                   s2d=s1, s2d_in=s2, dual=d, name="convu1")(y2, feats[-5], **kw)
        out = self.conv(y1, self.num_classes, 3, "out1", self.activation, s2d=s1)
        return s2d_ops.unpack(out) if s1 else out


class RecDecoder(_Base):
    """Restoration decoder from the bottleneck only (unet.py:299-322)."""

    n: int = 16
    num_classes: int = 3  # reconstructs the input channels
    norm: str = "dsbn"
    activation: str = "relu"
    num_domains: Optional[int] = None
    s2d_levels: int = 0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        domain: Optional[jax.Array] = None,
        train: bool = True,
        n_valid: Optional[int] = None,
    ) -> jax.Array:
        from ramdsir_tpu.models import s2d as s2d_ops

        n = self.n
        s1, s2, s3 = (self.s2d_levels >= 1, self.s2d_levels >= 2,
                      self.s2d_levels >= 3)
        kw = dict(domain=domain, train=train, n_valid=n_valid)
        y4 = ConvURec(16 * n, self.norm, self.activation, self.num_domains, name="convu4")(x, **kw)
        y3 = ConvURec(8 * n, self.norm, self.activation, self.num_domains,
                      s2d=s3, name="convu3")(y4, **kw)
        y2 = ConvURec(4 * n, self.norm, self.activation, self.num_domains,
                      s2d=s2, s2d_in=s3, name="convu2")(y3, **kw)
        y1 = ConvURec(2 * n, self.norm, self.activation, self.num_domains,
                      s2d=s1, s2d_in=s2, name="convu1")(y2, **kw)
        out = self.conv(y1, self.num_classes, 3, "out1", self.activation, s2d=s1)
        return s2d_ops.unpack(out) if s1 else out


class Unet2D(_Base):
    """Single-net encoder+decoder variant (unet.py:168-203)."""

    c: int = 3
    n: int = 16
    norm: str = "bn"
    num_classes: int = 2
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = True) -> jax.Array:
        feats = Encoder(self.c, self.n, self.norm, self.activation, name="encoder")(x, train=train)
        return Decoder(self.n, self.num_classes, self.norm, self.activation, name="decoder")(
            feats, train=train
        )


class Unet2DMT(_Base):
    """Seg+rec single net with shared trunk (unet.py:206-245)."""

    c: int = 3
    n: int = 16
    norm: str = "bn"
    num_classes: int = 2
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jax.Array, *, is_rec: bool = False, train: bool = True) -> jax.Array:
        n = self.n
        feats = Encoder(self.c, n, self.norm, self.activation, name="encoder")(x, train=train)
        y4 = ConvU(16 * n, self.norm, first=True, activation=self.activation, name="convu4")(
            feats[-1], feats[-2], train=train
        )
        y3 = ConvU(8 * n, self.norm, activation=self.activation, name="convu3")(y4, feats[-3], train=train)
        y2 = ConvU(4 * n, self.norm, activation=self.activation, name="convu2")(y3, feats[-4], train=train)
        y1 = ConvU(2 * n, self.norm, activation=self.activation, name="convu1")(y2, feats[-5], train=train)
        if is_rec:
            return self.conv(y1, self.c, 3, "rec1", self.activation)
        return self.conv(y1, self.num_classes, 3, "seg1", self.activation)


class Unet2DDS(_Base):
    """Deep-supervision variant (unet.py:325-378)."""

    c: int = 3
    n: int = 16
    norm: str = "bn"
    num_classes: int = 2
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jax.Array, *, deep_sup: bool = False, train: bool = True):
        n = self.n
        feats = Encoder(self.c, n, self.norm, self.activation, name="encoder")(x, train=train)
        x5 = feats[-1]
        y4 = ConvU(16 * n, self.norm, first=True, activation=self.activation, name="convu4")(
            x5, feats[-2], train=train
        )
        y3 = ConvU(8 * n, self.norm, activation=self.activation, name="convu3")(y4, feats[-3], train=train)
        y2 = ConvU(4 * n, self.norm, activation=self.activation, name="convu2")(y3, feats[-4], train=train)
        y1 = ConvU(2 * n, self.norm, activation=self.activation, name="convu1")(y2, feats[-5], train=train)
        y1_pred = self.conv(y1, self.num_classes, 3, "seg1", self.activation)
        if not deep_sup:
            return y1_pred

        def up(z, s):
            b, h, w, c = z.shape
            return jax.image.resize(z, (b, h * s, w * s, c), method="bilinear")

        y5_pred = up(self.conv(x5, self.num_classes, 3, "seg5", self.activation), 16)
        y4_pred = up(self.conv(y4, self.num_classes, 3, "seg4", self.activation), 8)
        y3_pred = up(self.conv(y3, self.num_classes, 3, "seg3", self.activation), 4)
        y2_pred = up(self.conv(y2, self.num_classes, 3, "seg2", self.activation), 2)
        return y1_pred, y2_pred, y3_pred, y4_pred, y5_pred


class Unet2DMS(_Base):
    """Multi-scale-output variant (unet.py:381-430)."""

    c: int = 3
    n: int = 16
    norm: str = "bn"
    num_classes: int = 2
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jax.Array, *, multi_scale_output: bool = False, train: bool = True):
        n = self.n
        feats = Encoder(self.c, n, self.norm, self.activation, name="encoder")(x, train=train)
        x5 = feats[-1]
        y4 = ConvU(16 * n, self.norm, first=True, activation=self.activation, name="convu4")(
            x5, feats[-2], train=train
        )
        y3 = ConvU(8 * n, self.norm, activation=self.activation, name="convu3")(y4, feats[-3], train=train)
        y2 = ConvU(4 * n, self.norm, activation=self.activation, name="convu2")(y3, feats[-4], train=train)
        y1 = ConvU(2 * n, self.norm, activation=self.activation, name="convu1")(y2, feats[-5], train=train)
        y1_pred = self.conv(y1, self.num_classes, 3, "seg1", self.activation)
        if not multi_scale_output:
            return y1_pred
        return (
            y1_pred,
            self.conv(y2, self.num_classes, 3, "seg2", self.activation),
            self.conv(y3, self.num_classes, 3, "seg3", self.activation),
            self.conv(y4, self.num_classes, 3, "seg4", self.activation),
            self.conv(x5, self.num_classes, 3, "seg5", self.activation),
        )


class Discriminator(nn.Module):
    """PatchGAN discriminator (unet.py:433-461)."""

    input_nc: int = 3
    n: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ramdsir_tpu.models.norm import InstanceNorm

        def conv(z, feats, stride, name):
            return nn.Conv(feats, (4, 4), strides=(stride, stride), padding=((1, 1), (1, 1)), name=name)(z)

        n = self.n
        x = nn.leaky_relu(conv(x, n, 2, "conv1"), 0.2)
        x = nn.leaky_relu(InstanceNorm(2 * n)(conv(x, 2 * n, 2, "conv2")), 0.2)
        x = nn.leaky_relu(InstanceNorm(4 * n)(conv(x, 4 * n, 2, "conv3")), 0.2)
        x = nn.leaky_relu(InstanceNorm(8 * n)(conv(x, 8 * n, 1, "conv4")), 0.2)
        x = conv(x, 1, 1, "conv5")
        return jnp.mean(x, axis=(1, 2))
