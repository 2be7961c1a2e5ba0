"""Model-zoo structural tests: shapes, parameter counts, norm behaviors."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ramdsir_tpu.models import (
    BatchNorm,
    Decoder,
    Discriminator,
    DomainSpecificBatchNorm,
    Encoder,
    RecDecoder,
    Unet2D,
    count_params,
)


def conv_params(cin, cout, k):
    return k * k * cin * cout + cout


def bn_params(c):
    return 2 * c


def convd_params(cin, cout):
    return conv_params(cin, cout, 3) * 1 + conv_params(cout, cout, 3) * 2 + 3 * bn_params(cout)


def convu_params(planes, first):
    total = 0
    if not first:
        total += conv_params(2 * planes, planes, 3) + bn_params(planes)
    total += conv_params(planes, planes // 2, 1) + bn_params(planes // 2)
    total += conv_params(planes, planes, 3) + bn_params(planes)
    return total


def convurec_params(planes, num_domains):
    half = planes // 2
    return (
        conv_params(planes, half, 3)
        + conv_params(half, half, 1)
        + conv_params(half, half, 3)
        + 3 * num_domains * bn_params(half)
    )


@pytest.fixture(scope="module")
def encoder_vars():
    enc = Encoder(c=3, n=16, norm="bn")
    v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    return enc, v


def test_encoder_shapes_and_params(encoder_vars):
    enc, v = encoder_vars
    feats = enc.apply(v, jnp.zeros((2, 64, 64, 3)), train=False)
    shapes = [f.shape for f in feats]
    assert shapes == [
        (2, 64, 64, 16),
        (2, 32, 32, 32),
        (2, 16, 16, 64),
        (2, 8, 8, 128),
        (2, 4, 4, 256),
    ]
    want = (
        convd_params(3, 16)
        + convd_params(16, 32)
        + convd_params(32, 64)
        + convd_params(64, 128)
        + convd_params(128, 256)
    )
    got = sum(x.size for x in jax.tree.leaves(v["params"]))
    assert got == want


def test_decoder_shapes_and_params(encoder_vars):
    enc, ev = encoder_vars
    feats = enc.apply(ev, jnp.zeros((2, 64, 64, 3)), train=False)
    dec = Decoder(num_classes=2, norm="bn")
    v = dec.init(jax.random.PRNGKey(1), feats, train=False)
    out = dec.apply(v, feats, train=False)
    assert out.shape == (2, 64, 64, 2)
    want = (
        convu_params(256, True)
        + convu_params(128, False)
        + convu_params(64, False)
        + convu_params(32, False)
        + conv_params(32, 2, 3)
    )
    assert sum(x.size for x in jax.tree.leaves(v["params"])) == want


def test_rec_decoder_shapes_params_dsbn():
    x = jnp.zeros((4, 4, 4, 256))
    dec = RecDecoder(num_classes=3, norm="dsbn", num_domains=3)
    v = dec.init(jax.random.PRNGKey(2), x, domain=jnp.int32(0), train=False)
    out = dec.apply(v, x, domain=jnp.int32(1), train=False)
    assert out.shape == (4, 64, 64, 3)
    want = (
        convurec_params(256, 3)
        + convurec_params(128, 3)
        + convurec_params(64, 3)
        + convurec_params(32, 3)
        + conv_params(16, 3, 3)
    )
    assert sum(x.size for x in jax.tree.leaves(v["params"])) == want


def test_batchnorm_torch_semantics():
    bn = BatchNorm(4)
    x = jnp.asarray(np.random.default_rng(0).normal(2.0, 3.0, (8, 5, 5, 4)).astype(np.float32))
    v = bn.init(jax.random.PRNGKey(0), x, use_running_average=False)
    y, mut = bn.apply(v, x, use_running_average=False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y).mean(axis=(0, 1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y).std(axis=(0, 1, 2)), 1.0, atol=1e-3)
    # running stats: (1-0.1)*init + 0.1*batch, var unbiased
    n = x.size / 4
    bm = np.asarray(x).mean(axis=(0, 1, 2))
    bv = np.asarray(x).var(axis=(0, 1, 2)) * n / (n - 1)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]), 0.1 * bm, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]), 0.9 + 0.1 * bv, rtol=1e-4)


def test_dsbn_banks_are_independent():
    dsbn = DomainSpecificBatchNorm(4, num_domains=3)
    x0 = jnp.ones((2, 3, 3, 4)) * 5.0
    v = dsbn.init(jax.random.PRNGKey(0), x0, jnp.int32(0), use_running_average=False)
    _, mut = dsbn.apply(v, x0, jnp.int32(1), use_running_average=False, mutable=["batch_stats"])
    stats = np.asarray(mut["batch_stats"]["mean"])
    assert stats[1, 0] != 0.0 and stats[0, 0] == 0.0 and stats[2, 0] == 0.0


def test_unet2d_and_discriminator():
    m = Unet2D(norm="gn")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    assert m.apply(v, jnp.zeros((2, 32, 32, 3)), train=False).shape == (2, 32, 32, 2)
    d = Discriminator()
    dv = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert d.apply(dv, jnp.zeros((2, 64, 64, 3))).shape == (2, 1)
    assert count_params(v) > 0


def test_reference_param_count_totals():
    """Full-size encoder/decoders match the reference's printed M-params."""
    enc = Encoder(c=3, n=16, norm="bn")
    ev = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    dec = Decoder(num_classes=2, norm="bn")
    feats = enc.apply(ev, jnp.zeros((1, 32, 32, 3)), train=False)
    dv = dec.init(jax.random.PRNGKey(0), feats, train=False)
    rec = RecDecoder(num_classes=3, norm="dsbn", num_domains=3)
    rv = rec.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 2, 256)), domain=jnp.int32(0), train=False)
    # analytic totals (same formulas as torch param counting)
    enc_want = sum(
        convd_params(a, b) for a, b in [(3, 16), (16, 32), (32, 64), (64, 128), (128, 256)]
    )
    dec_want = (
        convu_params(256, True)
        + sum(convu_params(p, False) for p in (128, 64, 32))
        + conv_params(32, 2, 3)
    )
    rec_want = sum(convurec_params(p, 3) for p in (256, 128, 64, 32)) + conv_params(16, 3, 3)
    assert sum(x.size for x in jax.tree.leaves(ev["params"])) == enc_want
    assert sum(x.size for x in jax.tree.leaves(dv["params"])) == dec_want
    assert sum(x.size for x in jax.tree.leaves(rv["params"])) == rec_want


def test_bfloat16_forward_close_to_f32():
    """bf16 compute path: convs/norms actually run in bf16 (flax dtype=None
    would silently promote to f32 — the round-2 perf bug) and the forward
    stays close to the f32 reference path."""
    import numpy as np

    enc = Encoder(c=3, n=16, norm="bn")
    x32 = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32))
    v = enc.init(jax.random.PRNGKey(0), x32, train=False)
    f32_feats = enc.apply(v, x32, train=True, mutable=["batch_stats"])[0]
    bf_feats = enc.apply(v, x32.astype(jnp.bfloat16), train=True, mutable=["batch_stats"])[0]
    assert bf_feats[-1].dtype == jnp.bfloat16
    a = np.asarray(f32_feats[-1], np.float32)
    b = np.asarray(bf_feats[-1], np.float32)
    # bf16 has ~3 decimal digits; activations are O(1) post-BN
    assert np.max(np.abs(a - b)) < 0.35
    assert np.mean(np.abs(a - b)) < 0.05
