"""HBM-resident data pipeline: gather + on-device scale-crop augmentation.

The device resampler must reproduce the host path's cv2 semantics: bilinear
(half-pixel convention) for images, nearest for masks, crop window in the
virtually-upscaled image.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ramdsir_tpu.data.device_pipeline import (
    DeviceFundusPipeline,
    _resample_one,
    device_scale_crop,
    gather_and_augment,
)
from ramdsir_tpu.data.fundus import FundusMultiDataset
from ramdsir_tpu.data.synthetic import make_fundus_tree


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = str(tmp_path_factory.mktemp("dev"))
    make_fundus_tree(r, per_domain_train=10, per_domain_test=2, size=48)
    return r


@pytest.fixture(scope="module")
def pipeline(root):
    base = os.path.join(root, "fundus")
    datasets = [
        FundusMultiDataset(base, [d], is_freq=True, test_domain_idx=3,
                           donor_size=32, resize_to=32, rng=np.random.default_rng(d))
        for d in (0, 1, 2)
    ]
    return DeviceFundusPipeline(
        datasets, [2, 3, 3], base, 32, test_domain_idx=3, is_out_domain=True, seed=7
    )


def test_resample_matches_cv2_oracle():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    S = 32
    img = rng.integers(0, 255, (S, S, 3), np.uint8)
    mask = rng.integers(0, 2, (S, S, 2), np.uint8)
    for h_t, w_t, y0, x0 in [(40, 44, 3, 9), (33, 47, 0, 12), (48, 48, 16, 16)]:
        up_i = cv2.resize(img, (w_t, h_t), interpolation=cv2.INTER_LINEAR)
        ref = up_i[y0 : y0 + S, x0 : x0 + S].astype(np.float32)
        got, gotm = _resample_one(
            jnp.asarray(img), jnp.asarray(mask),
            h_t / S, w_t / S, float(y0), float(x0), S,
        )
        # cv2 uses fixed-point bilinear (5-bit weights): tolerance ~1/32 * 255
        np.testing.assert_allclose(np.asarray(got), ref, atol=4.0)
        assert set(np.unique(np.asarray(gotm))) <= {0, 1}


def test_resample_identity():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (32, 32, 3), np.uint8)
    mask = rng.integers(0, 2, (32, 32, 2), np.uint8)
    got, gotm = _resample_one(jnp.asarray(img), jnp.asarray(mask), 1.0, 1.0, 0.0, 0.0, 32)
    np.testing.assert_allclose(np.asarray(got), img.astype(np.float32), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(gotm), mask)


def test_device_scale_crop_batch():
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.integers(0, 255, (6, 32, 32, 3), np.uint8))
    masks = jnp.asarray(rng.integers(0, 2, (6, 32, 32, 2), np.uint8))
    out_i, out_m = jax.jit(lambda i, m, k: device_scale_crop(i, m, k, 32))(
        imgs, masks, jax.random.PRNGKey(0)
    )
    assert out_i.shape == (6, 32, 32, 3) and out_m.shape == (6, 32, 32, 2)
    assert float(out_i.min()) >= 0.0 and float(out_i.max()) <= 255.0
    assert set(np.unique(np.asarray(out_m))) <= {0, 1}


def test_pipeline_plan_and_gather(pipeline):
    assert len(pipeline) == 10 // 2  # longest domain defines the epoch
    steps = list(pipeline)
    assert len(steps) == len(pipeline)
    n_imgs = int(pipeline.device_data["images"].shape[0])
    n_donors = int(pipeline.device_data["donor_amp"].shape[0])
    for s in steps:
        assert s["img_idx"].shape == (8,) and s["img_idx"].dtype == np.int32
        assert s["img_idx"].max() < n_imgs and s["donor_idx"].max() < n_donors
        # sub-batch domain ranges: rows 0-1 from domain 0's slice, etc.
        o = pipeline.offsets
        assert (s["img_idx"][:2] >= o[0]).all() and (s["img_idx"][:2] < o[1]).all()
        assert (s["img_idx"][2:5] >= o[1]).all() and (s["img_idx"][2:5] < o[2]).all()
        # out-domain donors: never from the row's own domain
        for row in range(2):
            dom = pipeline.ds_domains[0]
            start, n = pipeline.donor_offsets[dom]
            assert not (start <= s["donor_idx"][row] < start + n)

    batch = gather_and_augment(
        pipeline.device_data,
        jnp.asarray(steps[0]["img_idx"]),
        jnp.asarray(steps[0]["donor_idx"]),
        jax.random.PRNGKey(1),
        32,
    )
    assert batch["img"].shape == (8, 32, 32, 3)
    # default: precomputed banded donor amplitudes (b = floor(32*0.1) = 3)
    assert batch["donor_amp"].shape == (8, 7, 4, 3)
    assert batch["mask"].shape == (8, 32, 32, 2)
    assert float(batch["img"].max()) <= 255.0


def test_gather_donor_amp_matches_donor_image_path(root):
    """Pipelines built with and without the donor-amp precompute feed the
    step identically: the gathered banded amplitude equals the banded
    spectrum of the gathered donor image."""
    from ramdsir_tpu.ops.ram import banded_amplitude_spectrum

    base = os.path.join(root, "fundus")

    def build(pre):
        datasets = [
            FundusMultiDataset(base, [d], is_freq=True, test_domain_idx=3,
                               donor_size=32, resize_to=32, rng=np.random.default_rng(d))
            for d in (0, 1, 2)
        ]
        return DeviceFundusPipeline(
            datasets, [2, 3, 3], base, 32, test_domain_idx=3,
            is_out_domain=True, seed=7, precompute_donor_amp=pre,
        )

    pre, legacy = build(True), build(False)
    step = next(iter(pre))
    key = jax.random.PRNGKey(3)
    b_pre = gather_and_augment(
        pre.device_data, jnp.asarray(step["img_idx"]), jnp.asarray(step["donor_idx"]), key, 32
    )
    b_leg = gather_and_augment(
        legacy.device_data, jnp.asarray(step["img_idx"]), jnp.asarray(step["donor_idx"]), key, 32
    )
    assert "donor" in b_leg and "donor_amp" in b_pre
    np.testing.assert_allclose(np.asarray(b_pre["img"]), np.asarray(b_leg["img"]), atol=0)
    np.testing.assert_allclose(
        np.asarray(b_pre["donor_amp"]),
        np.asarray(banded_amplitude_spectrum(b_leg["donor"])),
        atol=1e-2, rtol=1e-6,
    )


def test_fit_device_data_smoke(root):
    """fit() on the default (device-resident) fundus path, 8-device mesh."""
    from ramdsir_tpu.config import TrainConfig
    from ramdsir_tpu.train.loop import fit

    save = os.path.join(root, "run_dev")
    cfg = TrainConfig(
        data_root=root, dataset="fundus", image_size=32, test_domain_idx=3,
        domain_idxs=(0, 1, 2), save_path=save, ram=True, rec=True,
        consistency=True, consistency_type="kd", epochs=1, test_batch_size=2,
        log_images_every=0,
    )
    summary = fit(cfg, max_steps=2)
    assert summary["steps"] == 2
    assert np.isfinite(summary["best"])


class TestDeviceProstatePipeline:
    def _make(self, tmp_path):
        import os

        from ramdsir_tpu.config import TrainConfig
        from ramdsir_tpu.data.synthetic import make_prostate_tree
        from ramdsir_tpu.train.loop import build_train_loaders

        root = str(tmp_path)
        make_prostate_tree(root, per_domain=4, size=32)
        cfg = TrainConfig(
            data_root=root, dataset="prostate", image_size=32, test_domain_idx=5,
            domain_idxs=(0, 1, 2, 3, 4), save_path=root + "/r", ram=True,
            rec=True, consistency=True, consistency_type="mse", epochs=1,
        ).resolve()
        loader = build_train_loaders(cfg, os.path.join(root, "prostate"), seed=0)
        return cfg, loader

    def test_plan_ranges_and_gather_matches_numpy(self, tmp_path):
        import jax.numpy as jnp

        from ramdsir_tpu.data.device_pipeline import (
            DeviceProstatePipeline,
            gather_prostate,
        )

        cfg, loader = self._make(tmp_path)
        assert isinstance(loader, DeviceProstatePipeline)
        n = int(loader.device_data["images"].shape[0])
        plan = loader.epoch_plan()
        assert plan["img_idx"].shape == (loader.steps_per_epoch, 10)
        assert plan["img_idx"].min() >= 0 and plan["img_idx"].max() < n
        assert plan["donor_idx"].min() >= 0 and plan["donor_idx"].max() < n
        batch = gather_prostate(
            loader.device_data, jnp.asarray(plan["img_idx"][0]),
            jnp.asarray(plan["donor_idx"][0]),
        )
        import numpy as np

        np.testing.assert_array_equal(
            np.asarray(batch["img"]),
            np.asarray(loader.device_data["images"])[plan["img_idx"][0]],
        )
        assert batch["mask"].dtype == jnp.int32
        assert batch["img"].shape == (10, 32, 32, 3)

    def test_out_domain_exclusion(self, tmp_path):
        cfg, loader = self._make(tmp_path)
        loader.is_out_domain = True
        plan = loader.epoch_plan()
        col = 0
        for d, bs in zip(loader.ds_domains, loader.batch_sizes):
            start, cnt = loader.domain_offsets[d]
            block = plan["donor_idx"][:, col : col + bs]
            assert not ((block >= start) & (block < start + cnt)).any()
            col += bs

    def test_fit_scan_on_mesh(self, tmp_path):
        """prostate fit() on the 8-device CPU mesh: batch 10 zero-padded to
        16, scan windows, eval — end to end."""
        from ramdsir_tpu.data.synthetic import make_prostate_volumes
        from ramdsir_tpu.train.loop import fit

        cfg, loader = self._make(tmp_path)
        make_prostate_volumes(str(tmp_path), per_domain=1, depth=10, size=32)
        cfg = cfg.__class__(
            **{**cfg.__dict__, "scan_window": 2, "test_batch_size": 4, "epochs": 2}
        )
        summary = fit(cfg, eval_every=1, max_steps=3)
        assert summary["steps"] == 3
        assert "dice" in summary
