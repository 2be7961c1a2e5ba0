"""Numerical parity vs an independent torch oracle.

Builds the documented architecture (SURVEY.md §2: ConvD/ConvU/ConvURec
stages, 5-level encoder, skip decoder, skip-free DSBN rec decoder) from
torch primitives, loads OUR weights into it via utils/torch_compat, and
compares forward outputs.  This pins down conv padding, bilinear upsample
convention (align_corners=False), BN eps/momentum, concat order, and the
NHWC<->NCHW weight mapping, end to end.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from ramdsir_tpu.models import Decoder, Encoder, RecDecoder
from ramdsir_tpu.utils.torch_compat import flax_module_to_torch_sd

torch.manual_seed(0)


def _norm2d(c):
    return tnn.BatchNorm2d(c, eps=1e-5, momentum=0.1)


class TDown(tnn.Module):
    """conv+bn, conv+bn+relu, conv+bn+relu; maxpool first unless first."""

    def __init__(self, cin, cout, first=False):
        super().__init__()
        self.first = first
        self.conv1, self.bn1 = tnn.Conv2d(cin, cout, 3, padding=1), _norm2d(cout)
        self.conv2, self.bn2 = tnn.Conv2d(cout, cout, 3, padding=1), _norm2d(cout)
        self.conv3, self.bn3 = tnn.Conv2d(cout, cout, 3, padding=1), _norm2d(cout)

    def forward(self, x):
        if not self.first:
            x = tF.max_pool2d(x, 2)
        x = self.bn1(self.conv1(x))
        y = tF.relu(self.bn2(self.conv2(x)))
        return tF.relu(self.bn3(self.conv3(y)))


class TUp(tnn.Module):
    def __init__(self, planes, first=False):
        super().__init__()
        self.first = first
        if not first:
            self.conv1, self.bn1 = tnn.Conv2d(2 * planes, planes, 3, padding=1), _norm2d(planes)
        self.conv2, self.bn2 = tnn.Conv2d(planes, planes // 2, 1), _norm2d(planes // 2)
        self.conv3, self.bn3 = tnn.Conv2d(planes, planes, 3, padding=1), _norm2d(planes)

    def forward(self, x, prev):
        if not self.first:
            x = tF.relu(self.bn1(self.conv1(x)))
        y = tF.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
        y = tF.relu(self.bn2(self.conv2(y)))
        y = torch.cat([prev, y], 1)
        return tF.relu(self.bn3(self.conv3(y)))


class TDSBN(tnn.Module):
    def __init__(self, c, domains):
        super().__init__()
        self.bns = tnn.ModuleList(_norm2d(c) for _ in range(domains))

    def forward(self, x, d):
        return self.bns[d](x)


class TUpRec(tnn.Module):
    def __init__(self, planes, domains):
        super().__init__()
        half = planes // 2
        self.conv1, self.bn1 = tnn.Conv2d(planes, half, 3, padding=1), TDSBN(half, domains)
        self.conv2, self.bn2 = tnn.Conv2d(half, half, 1), TDSBN(half, domains)
        self.conv3, self.bn3 = tnn.Conv2d(half, half, 3, padding=1), TDSBN(half, domains)

    def forward(self, x, d):
        x = tF.relu(self.bn1(self.conv1(x), d))
        y = tF.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
        y = tF.relu(self.bn2(self.conv2(y), d))
        return tF.relu(self.bn3(self.conv3(y), d))


class TEncoder(tnn.Module):
    def __init__(self, c=3, n=16):
        super().__init__()
        self.convd1 = TDown(c, n, first=True)
        self.convd2 = TDown(n, 2 * n)
        self.convd3 = TDown(2 * n, 4 * n)
        self.convd4 = TDown(4 * n, 8 * n)
        self.convd5 = TDown(8 * n, 16 * n)

    def forward(self, x):
        feats = [self.convd1(x)]
        for m in (self.convd2, self.convd3, self.convd4, self.convd5):
            feats.append(m(feats[-1]))
        return feats


class TDecoder(tnn.Module):
    def __init__(self, n=16, num_classes=2):
        super().__init__()
        self.convu4 = TUp(16 * n, first=True)
        self.convu3 = TUp(8 * n)
        self.convu2 = TUp(4 * n)
        self.convu1 = TUp(2 * n)
        self.out1 = tnn.Conv2d(2 * n, num_classes, 3, padding=1)

    def forward(self, feats):
        y = self.convu4(feats[-1], feats[-2])
        y = self.convu3(y, feats[-3])
        y = self.convu2(y, feats[-4])
        y = self.convu1(y, feats[-5])
        return self.out1(y)


class TRecDecoder(tnn.Module):
    def __init__(self, n=16, num_classes=3, domains=3):
        super().__init__()
        self.convu4 = TUpRec(16 * n, domains)
        self.convu3 = TUpRec(8 * n, domains)
        self.convu2 = TUpRec(4 * n, domains)
        self.convu1 = TUpRec(2 * n, domains)
        self.out1 = tnn.Conv2d(n, num_classes, 3, padding=1)

    def forward(self, x, d):
        for m in (self.convu4, self.convu3, self.convu2, self.convu1):
            x = m(x, d)
        return self.out1(x)


@pytest.fixture(scope="module")
def enc_pair():
    enc = Encoder(c=3, n=16, norm="bn")
    v = enc.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)), train=False)
    tenc = TEncoder()
    tenc.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(a)) for k, a in
         flax_module_to_torch_sd(v["params"], v["batch_stats"]).items()},
        strict=False,  # num_batches_tracked buffers absent by design
    )
    tenc.eval()
    return enc, v, tenc


def test_encoder_forward_parity(enc_pair):
    enc, v, tenc = enc_pair
    x = np.random.default_rng(0).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = [f.numpy() for f in tenc(torch.from_numpy(x))]
    got = enc.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), w, atol=2e-4, rtol=1e-4)


def test_full_unet_forward_parity(enc_pair):
    enc, ev, tenc = enc_pair
    dec = Decoder(num_classes=2, norm="bn")
    feats0 = enc.apply(ev, jnp.zeros((1, 64, 64, 3)), train=False)
    dv = dec.init(jax.random.PRNGKey(4), feats0, train=False)
    tdec = TDecoder()
    tdec.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(a)) for k, a in
         flax_module_to_torch_sd(dv["params"], dv["batch_stats"]).items()},
        strict=False,
    )
    tdec.eval()

    x = np.random.default_rng(1).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        tfeats = tenc(torch.from_numpy(x))
        want = tdec(tfeats).numpy()
    feats = enc.apply(ev, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    got = dec.apply(dv, feats, train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-4, rtol=1e-4)


def test_rec_decoder_dsbn_parity():
    rec = RecDecoder(num_classes=3, norm="dsbn", num_domains=3)
    x0 = jnp.zeros((1, 4, 4, 256))
    rv = rec.init(jax.random.PRNGKey(5), x0, domain=jnp.int32(0), train=False)
    trec = TRecDecoder()
    trec.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(a)) for k, a in
         flax_module_to_torch_sd(rv["params"], rv["batch_stats"]).items()},
        strict=False,
    )
    trec.eval()
    # make the banks distinguishable
    with torch.no_grad():
        for i, bn in enumerate(trec.convu4.bn1.bns):
            bn.weight += i * 0.25
    sd = {k: v.numpy() for k, v in trec.state_dict().items()}
    from ramdsir_tpu.utils.torch_compat import torch_sd_to_flax

    p, s = torch_sd_to_flax(sd, rv["params"], rv["batch_stats"])
    rv2 = {"params": p, "batch_stats": s}

    x = np.random.default_rng(2).normal(size=(2, 256, 4, 4)).astype(np.float32)
    for d in range(3):
        with torch.no_grad():
            want = trec(torch.from_numpy(x), d).numpy()
        got = rec.apply(rv2, jnp.asarray(x.transpose(0, 2, 3, 1)), domain=jnp.int32(d), train=False)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-4, rtol=1e-4)


def test_train_mode_bn_parity(enc_pair):
    """Batch-stat normalization matches torch train-mode BN."""
    enc, v, tenc = enc_pair
    tenc.train()
    x = np.random.default_rng(3).normal(size=(4, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = [f.numpy() for f in tenc(torch.from_numpy(x))]
    got, _ = enc.apply(
        v, jnp.asarray(x.transpose(0, 2, 3, 1)), train=True, mutable=["batch_stats"]
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), w, atol=5e-4, rtol=1e-3)
    tenc.eval()


def test_kaiming_init_statistics_vs_torch():
    """kaiming_normal_fanout matches torch kaiming_normal_(mode='fan_out')
    for BOTH 'relu' and 'leaky_relu' — torch's default a=0 makes the gain
    sqrt(2) in both cases (reference unet.py:259)."""
    import math

    import jax
    import numpy as np
    import torch

    from ramdsir_tpu.models.unet import kaiming_normal_fanout

    for act in ("relu", "leaky_relu"):
        t = torch.empty(256, 128, 3, 3)
        torch.manual_seed(0)
        torch.nn.init.kaiming_normal_(t, mode="fan_out", nonlinearity=act)
        torch_std = t.std().item()
        k = kaiming_normal_fanout(act)(jax.random.PRNGKey(0), (3, 3, 128, 256))
        ours_std = float(np.asarray(k).std())
        expect = math.sqrt(2.0) / math.sqrt(3 * 3 * 256)
        assert abs(torch_std - expect) / expect < 0.02
        assert abs(ours_std - expect) / expect < 0.02
