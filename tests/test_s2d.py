"""Space-to-depth top-stage rewrite: exact-equivalence pins.

The s2d domain (models/s2d.py) must be numerically a no-op: every test
here runs the SAME parameters through the plain path and the packed path
and requires agreement to fp-reassociation tolerance.  This is the same
contract fused_dual/fused_dsbn were landed under.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ramdsir_tpu.models import s2d as s2d_ops
from ramdsir_tpu.models.unet import ConvD, ConvU, Decoder, Encoder, RecDecoder

RNG = np.random.default_rng(0)


def _x(b, h, w, c):
    return jnp.asarray(RNG.normal(size=(b, h, w, c)).astype(np.float32))


class TestPrimitives:
    def test_pack_unpack_roundtrip(self):
        x = _x(2, 8, 12, 5)
        assert jnp.array_equal(s2d_ops.unpack(s2d_ops.pack(x)), x)

    def test_pack_channel_concat_is_cmajor(self):
        # concat of packings == packing of channel-concat (ConvU skip needs it)
        a, b = _x(1, 4, 4, 3), _x(1, 4, 4, 2)
        lhs = jnp.concatenate([s2d_ops.pack(a), s2d_ops.pack(b)], axis=-1)
        rhs = s2d_ops.pack(jnp.concatenate([a, b], axis=-1))
        assert jnp.array_equal(lhs, rhs)

    def test_pool2x2_equals_maxpool(self):
        import flax.linen as nn

        x = _x(2, 16, 16, 6)
        ref = nn.max_pool(x, (2, 2), strides=(2, 2))
        assert jnp.array_equal(s2d_ops.pool2x2(s2d_ops.pack(x)), ref)

    @pytest.mark.parametrize("hw", [(8, 8), (7, 9), (1, 1), (16, 4)])
    def test_upsample2x_into_matches_resize(self, hw):
        h, w = hw
        x = _x(2, h, w, 5)
        ref = jax.image.resize(x, (2, 2 * h, 2 * w, 5), method="bilinear")
        got = s2d_ops.unpack(s2d_ops.upsample2x_into(x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    @pytest.mark.parametrize("hw,ci,co", [((8, 8), 3, 16), ((7, 9), 16, 32), ((12, 4), 5, 8)])
    def test_down_kernel_equals_pack_of_conv(self, hw, ci, co):
        # fused stride-2 stage entry == pack(conv3x3_SAME(x))
        h, w_ = hw
        h += h % 2
        w_ += w_ % 2
        x = _x(2, h, w_, ci)
        w = jnp.asarray(RNG.normal(size=(3, 3, ci, co)).astype(np.float32))
        ref = s2d_ops.pack(
            jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
        )
        got = jax.lax.conv_general_dilated(
            x, s2d_ops.down_kernel(w), (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize("hw,ci,co", [((8, 8), 16, 8), ((7, 9), 32, 16), ((1, 1), 4, 4)])
    def test_upconv_equals_upsample_then_1x1(self, hw, ci, co):
        # fused S2DUpConv == 1x1 conv of the bilinear-upsampled map, packed
        h, w_ = hw
        x = _x(2, h, w_, ci)
        w = jnp.asarray(RNG.normal(size=(ci, co)).astype(np.float32))
        up = jax.image.resize(x, (2, 2 * h, 2 * w_, ci), method="bilinear")
        ref = s2d_ops.pack(up @ w)
        sten = jnp.asarray(s2d_ops._upsample_stencil_np())
        k = (sten[:, :, None, None, :] * w[None, None, :, :, None]).reshape(3, 3, ci, 4 * co)
        got = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) * jnp.asarray(s2d_ops._border_mask_np(h, w_, co))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)

    @pytest.mark.parametrize("k,ci,co", [(3, 3, 16), (3, 16, 16), (1, 32, 16)])
    def test_block_kernel_conv_equals_pixel_conv(self, k, ci, co):
        x = _x(2, 12, 16, ci)
        w = jnp.asarray(RNG.normal(size=(k, k, ci, co)).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME" if k > 1 else "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        got = s2d_ops.unpack(
            jax.lax.conv_general_dilated(
                s2d_ops.pack(x), s2d_ops.block_kernel(w), (1, 1),
                "SAME" if k > 1 else "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def _variables_equal_structure(va, vb):
    ta = jax.tree.structure(va)
    tb = jax.tree.structure(vb)
    assert ta == tb
    for a, b in zip(jax.tree.leaves(va), jax.tree.leaves(vb)):
        assert a.shape == b.shape and a.dtype == b.dtype


class TestModules:
    def test_convd_first_stage(self):
        x = _x(3, 16, 16, 3)
        plain = ConvD(8, first=True)
        packed = ConvD(8, first=True, s2d=True)
        v = plain.init(jax.random.PRNGKey(0), x, train=False)
        v2 = packed.init(jax.random.PRNGKey(0), x, train=False)
        _variables_equal_structure(v, v2)
        # identical param paths + init fns => bit-identical init
        for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2)):
            assert jnp.array_equal(a, b)
        ref, ms = plain.apply(v, x, train=True, mutable=["batch_stats"])
        got, ms2 = packed.apply(v, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(s2d_ops.unpack(got)), np.asarray(ref), atol=3e-5
        )
        for a, b in zip(jax.tree.leaves(ms), jax.tree.leaves(ms2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)

    def test_convu_packed_vs_plain(self):
        x = _x(2, 8, 8, 32)       # stage input (lower res)
        prev = _x(2, 16, 16, 8)   # skip at 2x res
        plain = ConvU(16)
        packed = ConvU(16, s2d=True, s2d_in=True)
        v = plain.init(jax.random.PRNGKey(1), x, prev, train=False)
        ref = plain.apply(v, x, prev, train=True, mutable=["batch_stats"])[0]
        got = packed.apply(
            v, s2d_ops.pack(x), s2d_ops.pack(prev), train=True, mutable=["batch_stats"]
        )[0]
        np.testing.assert_allclose(
            np.asarray(s2d_ops.unpack(got)), np.asarray(ref), atol=3e-5
        )


def _close_trees(a, b, atol):
    for pa, pb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=atol)


class TestFullModels:
    @pytest.mark.parametrize("levels", [2, 3])
    def test_encoder_decoder_equivalence(self, levels):
        x = _x(2, 32, 32, 3)
        enc0, dec0 = Encoder(n=8), Decoder(n=8)
        enc2, dec2 = (Encoder(n=8, s2d_levels=levels),
                      Decoder(n=8, s2d_levels=levels))
        ev = enc0.init(jax.random.PRNGKey(2), x, train=False)
        ev2 = enc2.init(jax.random.PRNGKey(2), x, train=False)
        for a, b in zip(jax.tree.leaves(ev), jax.tree.leaves(ev2)):
            assert jnp.array_equal(a, b)  # same init draws

        feats_ref, enc_ms = enc0.apply(ev, x, train=True, mutable=["batch_stats"])
        feats_s2d, enc_ms2 = enc2.apply(ev, x, train=True, mutable=["batch_stats"])
        # top `levels` maps come back packed; all five equal after unpack
        for i in range(5):
            got = feats_s2d[i]
            if i < levels:
                got = s2d_ops.unpack(got)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(feats_ref[i]), atol=5e-5
            )
        _close_trees(enc_ms, enc_ms2, 3e-5)

        dv = dec0.init(jax.random.PRNGKey(3), feats_ref, train=False)
        out_ref = dec0.apply(dv, feats_ref, train=True, mutable=["batch_stats"])
        out_s2d = dec2.apply(dv, feats_s2d, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(out_s2d[0]), np.asarray(out_ref[0]), atol=2e-4
        )
        _close_trees(out_ref[1], out_s2d[1], 5e-5)

    @pytest.mark.parametrize("seg_mode", [False, True])
    @pytest.mark.parametrize("levels", [2, 3])
    def test_rec_decoder_equivalence(self, seg_mode, levels):
        # scalar-domain mode AND vectorized segment-stat mode
        bott = _x(4, 2, 2, 128)
        rec0 = RecDecoder(n=8, num_domains=3)
        rec2 = RecDecoder(n=8, num_domains=3, s2d_levels=levels)
        domain = (
            jnp.asarray(np.array([0, 1, 1, 2]), jnp.int32)
            if seg_mode
            else jnp.int32(1)
        )
        v = rec0.init(jax.random.PRNGKey(4), bott, domain=jnp.int32(0), train=False)
        ref = rec0.apply(v, bott, domain=domain, train=True, mutable=["batch_stats"])
        got = rec2.apply(v, bott, domain=domain, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=2e-4)
        _close_trees(ref[1], got[1], 5e-5)

    def test_n_valid_padded_rows(self):
        # padded-batch BN slicing must survive the packed layout
        x = _x(4, 32, 32, 3)
        x = x.at[3].set(0.0)  # pad row
        enc0 = Encoder(n=8)
        enc2 = Encoder(n=8, s2d_levels=2)
        v = enc0.init(jax.random.PRNGKey(5), x, train=False)
        ref = enc0.apply(v, x, train=True, n_valid=3, mutable=["batch_stats"])
        got = enc2.apply(v, x, train=True, n_valid=3, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(s2d_ops.unpack(got[0][0])), np.asarray(ref[0][0]), atol=3e-5
        )
        _close_trees(ref[1], got[1], 3e-5)


class TestTrainStep:
    def test_full_step_equivalence(self):
        """Two optimizer steps of the flagship config: s2d_levels 2 vs 0
        from identical init -> same losses and post-step params."""
        import dataclasses

        from ramdsir_tpu.config import TrainConfig
        from ramdsir_tpu.train.state import init_state
        from ramdsir_tpu.train.steps import make_train_step

        base = TrainConfig(
            dataset="fundus", ram=True, rec=True, consistency=True,
            consistency_type="kd", image_size=32, domain_idxs=(0, 1, 2),
            test_domain_idx=0, save_path="/tmp/s2d_test", device_data=False,
        ).resolve()
        bsl = [2, 2, 2]
        rng = np.random.default_rng(7)
        batch = {
            "img": jnp.asarray(rng.uniform(0, 255, (6, 32, 32, 3)).astype(np.float32)),
            "donor": jnp.asarray(rng.uniform(0, 255, (6, 32, 32, 3)).astype(np.float32)),
            "mask": jnp.asarray((rng.uniform(size=(6, 32, 32, 2)) > 0.5).astype(np.float32)),
        }
        results = {}
        for levels in (0, 2, 3):
            cfg = dataclasses.replace(base, s2d_levels=levels)
            state, models = init_state(cfg, jax.random.PRNGKey(0))
            step = make_train_step(cfg, models, total_iters=100, batch_size_list=bsl)
            state, metrics, _ = step(state, batch, jax.random.PRNGKey(10))
            results[levels] = (state, metrics)

        s0, m0 = results[0]
        for lv in (2, 3):
            s2, m2 = results[lv]
            for k in m0:
                np.testing.assert_allclose(
                    np.asarray(m0[k]), np.asarray(m2[k]), rtol=5e-5, atol=1e-5,
                    err_msg=f"levels={lv}: {k}",
                )
            # First Adam step is ~lr*sign(g) (v tiny), so fp reassociation can
            # flip near-zero grads: bound the per-param delta by ~lr, like
            # tests/test_fused_dual.py does.
            lr = base.lr
            for pa, pb in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s2.params)):
                np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=2.5 * lr)
            for pa, pb in zip(
                jax.tree.leaves(s0.batch_stats), jax.tree.leaves(s2.batch_stats)
            ):
                np.testing.assert_allclose(
                    np.asarray(pa), np.asarray(pb), rtol=1e-4, atol=1e-5
                )


def test_packconv2_custom_vjp_matches_autodiff():
    """The hand-written weight-grad of the fused stride-2 pack-conv
    (s2d.packconv2: four packed-domain matmuls instead of XLA's 16-lane
    conv weight-grad) must equal the raw conv's autodiff exactly (f32;
    reduction order only)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(3, 16, 16, 5)).astype(np.float32))
    wp = jnp.asarray(rng.normal(size=(4, 4, 5, 8)).astype(np.float32))
    dy = jnp.asarray(rng.normal(size=(3, 8, 8, 8)).astype(np.float32))

    def loss_custom(x_, wp_):
        return jnp.vdot(s2d_ops.packconv2(x_, wp_), dy)

    def loss_raw(x_, wp_):
        return jnp.vdot(s2d_ops._packconv2_raw(x_, wp_), dy)

    np.testing.assert_allclose(
        np.asarray(loss_custom(x, wp)), np.asarray(loss_raw(x, wp)), rtol=1e-6
    )
    gx_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(x, wp)
    gx_r, gw_r = jax.grad(loss_raw, argnums=(0, 1))(x, wp)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_r), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_r), rtol=1e-5, atol=1e-4)
