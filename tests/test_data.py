"""Data layer: mask decode, transforms, datasets, loaders, NIfTI I/O."""
import os

import numpy as np
import pytest
from PIL import Image

from ramdsir_tpu.data.fundus import FundusDataset, FundusMultiDataset
from ramdsir_tpu.data.loaders import DataLoader, MultiDomainIterator, concat_domain_batches
from ramdsir_tpu.data.nifti import read_nifti, write_nifti
from ramdsir_tpu.data.prostate import ProstateMultiDataset
from ramdsir_tpu.data.synthetic import make_fundus_tree, make_prostate_tree, make_prostate_volumes
from ramdsir_tpu.data.transforms import (
    Compose,
    CutOut,
    Hflip,
    Normalize,
    RandomScaleCrop,
    Resize,
    decode_fundus_mask,
    fundus_multilabel,
    to_multilabel,
)


@pytest.fixture(scope="session")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    make_fundus_tree(root, per_domain_train=12, per_domain_test=3, size=48)
    make_prostate_tree(root, per_domain=5, size=48)
    make_prostate_volumes(root, per_domain=1, depth=10, size=48)
    return root


def test_mask_decode_roundtrip():
    gray = np.array([[255, 128, 0], [200, 51, 50]], np.uint8)
    cls = decode_fundus_mask(gray)
    # >200 -> bg, 51..200 -> disc, <=50 -> cup
    np.testing.assert_array_equal(cls, [[0, 1, 2], [1, 1, 2]])
    ml = to_multilabel(cls)
    # cup channel marks class 2 only; disc channel marks classes 1 and 2
    np.testing.assert_array_equal(ml[..., 0], cls == 2)
    np.testing.assert_array_equal(ml[..., 1], (cls == 1) | (cls == 2))


def test_transforms_shapes():
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (40, 60, 3), np.uint8))
    mask = Image.fromarray(rng.choice([0, 128, 255], (40, 60)).astype(np.uint8))
    sample = {"img": img, "mask": mask}
    t = Compose([Resize((32, 32)), RandomScaleCrop((32, 32), rng), Hflip(rng), CutOut(rng=rng), Normalize()])
    out = t(sample)
    assert out["img"].shape == (32, 32, 3) and out["img"].dtype == np.float32
    assert out["mask"].shape == (32, 32, 2)
    assert set(np.unique(out["mask"])) <= {0.0, 1.0}


def test_fundus_datasets(data_root):
    base = os.path.join(data_root, "fundus")
    test_ds = FundusDataset(base, domain_idx=3, split="test", transform=Compose([Resize((32, 32))]))
    item = test_ds[0]
    assert item["img"].shape == (32, 32, 3)
    assert item["mask_orig"].shape == (48, 48, 2)

    train_ds = FundusMultiDataset(
        base, domain_idx_list=[0], transform=Compose([Resize((32, 32))]),
        is_freq=True, is_out_domain=True, test_domain_idx=3, donor_size=32,
        rng=np.random.default_rng(0),
    )
    it = train_ds[0]
    assert it["img"].shape == (32, 32, 3) and it["donor"].shape == (32, 32, 3)
    assert it["mask"].shape == (32, 32, 2)


def test_prostate_dataset(data_root):
    base = os.path.join(data_root, "prostate")
    ds = ProstateMultiDataset(base, domain_idx_list=[0], is_freq=True, is_out_domain=True,
                              test_domain_idx=5, rng=np.random.default_rng(0))
    it = ds[0]
    assert it["img"].shape == (48, 48, 3) and it["donor"].shape == (48, 48, 3)
    assert it["mask"].dtype == np.int32


def test_loader_and_multidomain(data_root):
    base = os.path.join(data_root, "fundus")
    loaders = []
    for d, bs in [(0, 2), (1, 4), (2, 6)]:
        ds = FundusMultiDataset(base, [d], transform=Compose([Resize((32, 32))]),
                                is_freq=True, test_domain_idx=3, donor_size=32,
                                rng=np.random.default_rng(d))
        loaders.append(DataLoader(ds, batch_size=bs, seed=d))
    mdi = MultiDomainIterator(loaders)
    assert len(mdi) == max(12 // 2, 12 // 4, 12 // 6)
    steps = 0
    for per_domain in mdi:
        batch = concat_domain_batches(per_domain, ("img", "donor", "mask"))
        assert batch["img"].shape == (12, 32, 32, 3)
        steps += 1
    assert steps == len(mdi)


def test_loader_drop_last_guard(data_root):
    base = os.path.join(data_root, "fundus")
    ds = FundusMultiDataset(base, [0], transform=Compose([Resize((32, 32))]),
                            is_freq=False, test_domain_idx=3)
    with pytest.raises(ValueError):
        MultiDomainIterator([DataLoader(ds, batch_size=100)])


def test_np_random_scale_crop_distribution():
    from ramdsir_tpu.data.transforms import np_random_scale_crop

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (48, 48, 3), np.uint8)
    mask = rng.choice([0, 128, 255], (48, 48)).astype(np.uint8)
    for _ in range(20):
        i2, m2 = np_random_scale_crop(img, mask, 32, rng)
        assert i2.shape == (32, 32, 3) and m2.shape == (32, 32)
        assert set(np.unique(m2)) <= {0, 128, 255}  # nearest keeps labels


def test_decode_cache_hits(data_root):
    base = os.path.join(data_root, "fundus")
    ds = FundusMultiDataset(
        base, [0], is_freq=True, test_domain_idx=3, donor_size=32,
        resize_to=32, rng=np.random.default_rng(0),
    )
    a = ds[0]
    b = ds[0]
    np.testing.assert_array_equal(a["img"], b["img"])  # deterministic w/o aug
    assert len(ds._cache._store) > 0


def test_fused_loader_semantics(data_root):
    from ramdsir_tpu.data.loaders import FusedMultiDomainLoader

    base = os.path.join(data_root, "fundus")
    datasets = [
        FundusMultiDataset(base, [d], is_freq=True, test_domain_idx=3,
                           donor_size=32, resize_to=32, rng=np.random.default_rng(d))
        for d in (0, 1, 2)
    ]
    loader = FusedMultiDomainLoader(datasets, [2, 4, 6], ("img", "donor", "mask"), seed=0)
    assert len(loader) == 12 // 2
    steps = list(loader)
    assert len(steps) == len(loader)
    for batch in steps:
        assert batch["img"].shape == (12, 32, 32, 3)
        assert batch["img"].dtype == np.uint8
        assert batch["mask"].shape == (12, 32, 32, 2)
    with pytest.raises(ValueError):
        FusedMultiDomainLoader(datasets, [100, 4, 6], ("img",))


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for dtype in [np.float32, np.int16, np.uint8]:
        vol = (rng.uniform(0, 100, (5, 7, 9))).astype(dtype)
        p = str(tmp_path / f"vol_{np.dtype(dtype).name}.nii.gz")
        write_nifti(p, vol)
        back = read_nifti(p)
        np.testing.assert_array_equal(back, vol)
    # uncompressed too
    p = str(tmp_path / "v.nii")
    write_nifti(p, np.arange(24, dtype=np.int32).reshape(2, 3, 4))
    np.testing.assert_array_equal(read_nifti(p), np.arange(24).reshape(2, 3, 4))


def test_synthetic_volume_readable(data_root):
    vol_dir = os.path.join(data_root, "prostate", "ISBI")
    files = [f for f in os.listdir(vol_dir) if "segmentation" not in f]
    img = read_nifti(os.path.join(vol_dir, files[0]))
    seg = read_nifti(os.path.join(vol_dir, files[0].replace(".nii.gz", "_segmentation.nii.gz")))
    assert img.shape == seg.shape == (10, 48, 48)
    assert seg.max() == 1


def test_out_domain_donor_exclusion(data_root):
    base = os.path.join(data_root, "fundus")
    ds = FundusMultiDataset(
        base, [1], is_freq=True, is_out_domain=True, test_domain_idx=3,
        donor_size=32, resize_to=32, rng=np.random.default_rng(0),
    )
    # donor pool = train domains minus test domain minus current domain
    pool = [d for d in ds.train_domains if d != "Domain2"]
    assert "Domain4" not in ds.train_domains  # held-out excluded
    for _ in range(10):
        # _sample_donor only draws from the non-current source domains
        assert set(pool) == {"Domain1", "Domain3"}
        ds._sample_donor("Domain2", ds.rng)


def test_random_resize_aspect_preserving():
    """transform.py:102-132 exact: short side drives an integer target in
    [int(0.75*s), int(1.20*s)]; the long side scales by the same ratio."""
    from PIL import Image

    from ramdsir_tpu.data.transforms import RandomResize

    rng = np.random.default_rng(0)
    t = RandomResize(rng=rng)
    img = Image.fromarray(np.zeros((100, 80, 3), np.uint8))   # w=80 < h=100
    mask = Image.fromarray(np.zeros((100, 80), np.uint8))
    for _ in range(20):
        out = t({"img": img, "mask": mask})
        ow, oh = out["img"].size
        # origin = min(w, h) = 80; w < h so oh = target, ow = int(w * oh/h)
        assert int(80 * 0.75) <= oh <= int(80 * 1.20)
        assert ow == int(80 * (oh / 100))
        assert out["mask"].size == (ow, oh)


def test_rotate_mask_fill_is_255():
    from PIL import Image

    from ramdsir_tpu.data.transforms import Rotate

    rng = np.random.default_rng(3)
    img = Image.fromarray(np.full((64, 64, 3), 128, np.uint8))
    mask = Image.fromarray(np.zeros((64, 64), np.uint8))  # gray 0 = cup class
    saw_fill = False
    for _ in range(10):
        out = Rotate(rng=rng)({"img": img, "mask": mask})
        m = np.array(out["mask"])
        vals = set(np.unique(m).tolist())
        assert vals <= {0, 255}
        if 255 in vals:  # rotated-in corners -> ignore/background, never cup
            saw_fill = True
    assert saw_fill


def test_get_pair_exact_laws():
    from PIL import Image

    from ramdsir_tpu.data.transforms import GetPair, image_in_painting, image_out_painting

    rng = np.random.default_rng(7)
    base = np.arange(96 * 96 * 3, dtype=np.int64).reshape(96, 96, 3) % 251
    base = base.astype(np.uint8)

    inp = image_in_painting(base, np.random.default_rng(1))
    diff = np.any(inp != base, axis=-1)
    assert 0 < diff.sum() < base.shape[0] * base.shape[1]  # interior blocks only
    # inpaint noise is the SAME plane across channels (reference broadcast)
    ys, xs = np.where(diff)
    y0, x0 = ys[0], xs[0]
    assert inp[y0, x0, 0] == inp[y0, x0, 1] == inp[y0, x0, 2]
    # borders (3 px) never touched
    assert not diff[:3].any() and not diff[-3:].any()
    assert not diff[:, :3].any() and not diff[:, -3:].any()

    outp = image_out_painting(base, np.random.default_rng(2))
    same = np.all(outp == base, axis=-1)
    assert same.sum() > 0                      # restored block(s)
    assert (~same).sum() > 0                   # noise elsewhere
    # restored block sides are in [S - 4S//7, S - 3S//7]
    rows = np.where(same.any(axis=1))[0]
    assert rows.size >= 96 - 4 * 96 // 7

    sample = {"img": Image.fromarray(base), "mask": Image.fromarray(base[..., 0])}
    out = GetPair(rng=rng)(sample)
    assert "img_aug" in out and out["img_aug"].size == (96, 96)
    assert np.any(np.array(out["img_aug"]) != base)


def test_painting_constant_variants():
    """The 4 dead-code `_constant`/`_rand_constant` variants
    (reference transform.py:456-489, :521-580)."""
    from ramdsir_tpu.data.transforms import (
        image_in_painting_constant,
        image_in_painting_rand_constant,
        image_out_painting_constant,
        image_out_painting_rand_constant,
    )

    base = (np.arange(96 * 96 * 3).reshape(96, 96, 3) % 200).astype(np.uint8)

    inp = image_in_painting_constant(base, np.random.default_rng(3))
    diff = np.any(inp != base, axis=-1)
    assert diff.sum() > 0
    assert (inp[diff] == 255).all()  # blocks are constant 255

    inp = image_in_painting_rand_constant(base, np.random.default_rng(4))
    diff = np.any(inp != base, axis=-1)
    assert diff.sum() > 0
    # each block is ONE constant: few distinct fill values overall
    assert len(np.unique(inp[diff])) <= 10

    outp = image_out_painting_constant(base, np.random.default_rng(5))
    changed = np.any(outp != base, axis=-1)
    assert changed.sum() > 0 and (outp[changed] == 255).all()

    outp = image_out_painting_rand_constant(base, np.random.default_rng(6))
    changed = np.any(outp != base, axis=-1)
    assert changed.sum() > 0 and len(np.unique(outp[changed])) == 1


def test_cutout_reference_semantics():
    """CutOut parity quirks (reference transform.py:235-277): per-pixel
    U(0,255) noise fill (NOT zeros), mask hole = 255, box fits via
    rejection sampling."""
    from PIL import Image

    from ramdsir_tpu.data.transforms import CutOut

    base = np.full((64, 64, 3), 7, dtype=np.uint8)
    mask = np.zeros((64, 64), dtype=np.uint8)
    sample = {"img": Image.fromarray(base), "mask": Image.fromarray(mask)}
    out = CutOut(p=1.0, rng=np.random.default_rng(0))(sample)
    img2 = np.array(out["img"])
    mask2 = np.array(out["mask"])
    hole = mask2 == 255
    assert hole.sum() > 0
    assert (mask2[~hole] == 0).all()
    # pixel-level noise: many distinct values inside the hole, untouched outside
    assert len(np.unique(img2[hole])) > 10
    assert (img2[~hole] == 7).all()
    # the hole is one solid rectangle
    ys, xs = np.where(hole)
    assert hole.sum() == (ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1)


def test_fused_loader_deterministic_across_runs(data_root):
    """Counter-based per-sample RNG: two loaders with the same seed yield
    identical batches (donor choice + crops), regardless of worker count."""
    from ramdsir_tpu.data.fundus import FundusMultiDataset
    from ramdsir_tpu.data.loaders import FusedMultiDomainLoader
    from ramdsir_tpu.data.transforms import np_random_scale_crop

    base = os.path.join(data_root, "fundus")

    def build(workers):
        datasets = [
            FundusMultiDataset(
                base, [d], is_freq=True, test_domain_idx=3, donor_size=32,
                resize_to=32, rng=np.random.default_rng(d),
                np_transform=lambda im, mk, rng: np_random_scale_crop(im, mk, 32, rng),
            )
            for d in (0, 1, 2)
        ]
        return FusedMultiDomainLoader(
            datasets, [2, 2, 2], ("img", "donor", "mask"), seed=11, num_workers=workers
        )

    a = [dict(b) for b in build(1)]
    b = [dict(b) for b in build(6)]
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        for k in ("img", "donor", "mask"):
            np.testing.assert_array_equal(ba[k], bb[k])


def test_loader_rows_slice_matches_full_build(data_root):
    """Multi-host input path: a loader materializing only rows [lo, hi) of
    the global domain-major batch produces exactly those rows of the full
    build (augmentation is counter-seeded by global position)."""
    from ramdsir_tpu.data.fundus import FundusMultiDataset
    from ramdsir_tpu.data.loaders import FusedMultiDomainLoader
    from ramdsir_tpu.data.transforms import ScaleCropAug

    base = os.path.join(data_root, "fundus")

    def build(rows=None):
        datasets = [
            FundusMultiDataset(
                base, [d], is_freq=True, test_domain_idx=3, donor_size=32,
                resize_to=32, rng=np.random.default_rng(d),
                np_transform=ScaleCropAug(32),
            )
            for d in (0, 1, 2)
        ]
        return FusedMultiDomainLoader(
            datasets, [2, 3, 3], ("img", "donor", "mask"), seed=21, rows=rows
        )

    full = list(build())
    lo, hi = 3, 7  # spans the domain-1/domain-2 boundary
    part = list(build(rows=slice(lo, hi)))
    assert len(full) == len(part)
    for fb, pb in zip(full, part):
        for k in ("img", "donor", "mask"):
            assert pb[k].shape[0] == hi - lo
            np.testing.assert_array_equal(fb[k][lo:hi], pb[k])


def test_process_loader_matches_thread_loader(data_root):
    """Process and thread loaders are batch-for-batch identical for the
    same seed (shared counter-based _assemble_batch)."""
    from ramdsir_tpu.data.fundus import FundusMultiDataset
    from ramdsir_tpu.data.loaders import (
        FusedMultiDomainLoader,
        ProcessFusedMultiDomainLoader,
    )
    from ramdsir_tpu.data.transforms import ScaleCropAug

    base = os.path.join(data_root, "fundus")

    def datasets():
        return [
            FundusMultiDataset(
                base, [d], is_freq=True, test_domain_idx=3, donor_size=32,
                resize_to=32, rng=np.random.default_rng(d),
                np_transform=ScaleCropAug(32),
            )
            for d in (0, 1, 2)
        ]

    thread = list(FusedMultiDomainLoader(datasets(), [2, 2, 2], ("img", "donor", "mask"), seed=5))
    ploader = ProcessFusedMultiDomainLoader(
        datasets(), [2, 2, 2], ("img", "donor", "mask"), seed=5, num_workers=3
    )
    try:
        proc = list(ploader)
        # persistent workers: a second epoch reuses the pool
        proc2 = list(ploader)
    finally:
        ploader.shutdown()
    assert len(thread) == len(proc) == len(proc2)
    for tb, pb in zip(thread, proc):
        for k in ("img", "donor", "mask"):
            np.testing.assert_array_equal(tb[k], pb[k])


def test_fundus_multi_test_split(data_root):
    """Fundus_Multi split='test' (fundus.py:146-186): reads DomainX_test.list
    manifests; items carry the transformed img/mask plus the ORIGINAL-size
    multilabel mask and the id string."""
    from ramdsir_tpu.data.transforms import Compose, Resize

    base = os.path.join(data_root, "fundus")
    ds = FundusMultiDataset(
        base, domain_idx_list=[0, 1], split="test",
        transform=Compose([Resize((32, 32))]), is_freq=False, test_domain_idx=3,
    )
    assert len(ds) == 6  # 3 test images per domain, 2 domains
    it = ds[0]
    assert it["img"].shape == (32, 32, 3)
    assert it["mask_orig"].shape == (48, 48, 2)
    assert isinstance(it["id"], str) and "Domain" in it["id"]


class _RecordingRng:
    """Duck-typed rng wrapper that records every draw (for parameter tests)."""

    def __init__(self, seed=0):
        self._g = np.random.default_rng(seed)
        self.calls = []

    def random(self, *a, **k):
        v = self._g.random(*a, **k)
        self.calls.append(("random", v))
        return v

    def uniform(self, lo, hi, *a, **k):
        v = self._g.uniform(lo, hi, *a, **k)
        self.calls.append(("uniform", lo, hi, v))
        return v

    def integers(self, lo, hi, *a, **k):
        v = self._g.integers(lo, hi, *a, **k)
        self.calls.append(("integers", lo, hi, v))
        return v


def test_sharpness_reference_params():
    """Sharpness: p=0.2 gate, factor U(0.05, 0.95) (transform.py:280-289)."""
    from ramdsir_tpu.data.transforms import Sharpness

    rng = _RecordingRng(1)
    t = Sharpness(rng=rng)
    img = Image.fromarray(np.random.default_rng(0).integers(0, 255, (16, 16, 3), np.uint8))
    applied = 0
    for _ in range(3000):
        rng.calls.clear()
        t({"img": img, "mask": None})
        if len(rng.calls) > 1:  # gate passed -> a uniform draw happened
            applied += 1
            kind, lo, hi, v = rng.calls[1]
            assert kind == "uniform" and (lo, hi) == (0.05, 0.95)
            assert 0.05 <= v <= 0.95
    assert 0.15 < applied / 3000 < 0.25  # p = 0.2


def test_solarize_reference_params():
    """Solarize: p=0.2 gate, threshold randint(0,256) INCLUSIVE
    (transform.py:292-301)."""
    from ramdsir_tpu.data.transforms import Solarize

    rng = _RecordingRng(2)
    t = Solarize(rng=rng)
    img = Image.fromarray(np.random.default_rng(0).integers(0, 255, (16, 16, 3), np.uint8))
    applied = 0
    thresholds = []
    for _ in range(3000):
        rng.calls.clear()
        t({"img": img, "mask": None})
        if len(rng.calls) > 1:
            applied += 1
            kind, lo, hi, v = rng.calls[1]
            assert kind == "integers" and (lo, hi) == (0, 257)
            thresholds.append(int(v))
    assert 0.15 < applied / 3000 < 0.25
    assert max(thresholds) > 250 and min(thresholds) < 6  # spans 0..256


def test_boundary_contour_reference_contract():
    """GetBoundary/GetContourBg match the reference widths and contracts
    (transform.py:377-436): width=5 symmetric band = dilation XOR erosion,
    contour = mask - erode^1, bg = dilate^5 - mask, 4-tuple return."""
    from scipy import ndimage as ndi

    from ramdsir_tpu.data.transforms import (
        GetBoundary,
        GetBoundary_Single,
        GetContourBg,
        GetContourBg_Single,
    )

    rng = np.random.default_rng(3)
    # two blobby binary planes [cup, disc]
    base = (ndi.gaussian_filter(rng.random((64, 64)), 6) > 0.5)
    cup = ndi.binary_erosion(base, iterations=3).astype(np.float32)
    disc = base.astype(np.float32)
    mask = np.stack([cup, disc], axis=-1)

    b = GetBoundary()(mask)
    assert b.dtype == np.uint8 and b.shape == (64, 64)
    expect = np.zeros((64, 64), bool)
    for plane in (cup, disc):
        d = ndi.binary_dilation(plane, iterations=5)
        e = ndi.binary_erosion(plane, iterations=5)
        expect |= d ^ e  # band where exactly one of (dil, ero) holds
    np.testing.assert_array_equal(b.astype(bool), expect)
    np.testing.assert_array_equal(GetBoundary_Single()(cup).astype(bool),
                                  ndi.binary_dilation(cup, iterations=5)
                                  ^ ndi.binary_erosion(cup, iterations=5))

    out = GetContourBg()(mask)
    assert isinstance(out, tuple) and len(out) == 4
    cup_ct, cup_bg, disc_ct, disc_bg = out
    np.testing.assert_array_equal(
        cup_ct, cup - ndi.binary_erosion(cup, iterations=1).astype(np.float32))
    np.testing.assert_array_equal(
        cup_bg, ndi.binary_dilation(cup, iterations=5).astype(np.float32) - cup)
    np.testing.assert_array_equal(
        disc_ct, disc - ndi.binary_erosion(disc, iterations=1).astype(np.float32))
    np.testing.assert_array_equal(
        disc_bg, ndi.binary_dilation(disc, iterations=5).astype(np.float32) - disc)
    sct, sbg = GetContourBg_Single()(disc)
    np.testing.assert_array_equal(sct, disc_ct)
    np.testing.assert_array_equal(sbg, disc_bg)
