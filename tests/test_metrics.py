"""Metrics + postprocess parity: dice formulas, surface distances vs a
brute-force oracle, connected-component cleanup behaviors."""
import numpy as np

from ramdsir_tpu.ops.metrics import (
    SegmentationMetric,
    asd,
    assd,
    calculate_metric_percase,
    dice_binary,
    dice_coeff_2label,
    dice_coefficient,
    hd95,
    surface_distances,
)
from ramdsir_tpu.ops.postprocess import (
    connectivity_region_analysis,
    get_largest_fillhole,
    postprocessing,
)


def _disk(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r


def _brute_surface_distances(a, b):
    """O(n^2) oracle: border via 4-neighborhood erosion, exact euclidean."""
    def border(m):
        m = m.astype(bool)
        er = np.zeros_like(m)
        er[1:-1, 1:-1] = (
            m[1:-1, 1:-1] & m[:-2, 1:-1] & m[2:, 1:-1] & m[1:-1, :-2] & m[1:-1, 2:]
        )
        return m & ~er

    pa = np.argwhere(border(a))
    pb = np.argwhere(border(b))
    d = np.sqrt(((pa[:, None, :] - pb[None, :, :]) ** 2).sum(-1))
    return d.min(axis=1)


def test_dice_coefficient_smooth_one():
    a = _disk(32, 32, 16, 16, 8)
    b = _disk(32, 32, 16, 18, 8)
    inter = np.logical_and(a, b).sum()
    want = (2 * inter + 1.0) / (1.0 + a.sum() + b.sum())
    assert abs(dice_coefficient(a, b) - want) < 1e-12
    # empty vs empty -> smooth keeps it at 1.0
    assert dice_coefficient(np.zeros((4, 4)), np.zeros((4, 4))) == 1.0


def test_dice_coeff_2label_batched():
    a = np.stack([_disk(16, 16, 8, 8, 4), _disk(16, 16, 8, 8, 6)])
    got = dice_coeff_2label(a, a)
    assert got == (1.0, 1.0)


def test_surface_distances_vs_bruteforce():
    rng = np.random.default_rng(0)
    a = _disk(40, 40, 20, 18, 9)
    b = _disk(40, 40, 21, 22, 7)
    got = np.sort(surface_distances(a, b))
    want = np.sort(_brute_surface_distances(a, b))
    np.testing.assert_allclose(got, want, atol=1e-9)
    # hd95/asd consistency with the oracle
    d1, d2 = _brute_surface_distances(a, b), _brute_surface_distances(b, a)
    assert abs(hd95(a, b) - max(np.percentile(d1, 95), np.percentile(d2, 95))) < 1e-9
    assert abs(asd(a, b) - d1.mean()) < 1e-9
    assert abs(assd(a, b) - np.concatenate([d1, d2]).mean()) < 1e-9


def test_identical_masks_zero_distance():
    a = _disk(24, 24, 12, 12, 6)
    assert hd95(a, a) == 0.0 and asd(a, a) == 0.0
    dc, jc, hd, a_ = calculate_metric_percase(a, a)
    assert dc == 1.0 and jc == 1.0 and hd == 0.0 and a_ == 0.0


def test_largest_fillhole():
    m = np.zeros((20, 20), np.uint8)
    m[2:10, 2:10] = 1
    m[5, 5] = 0  # hole -> filled
    m[15:17, 15:17] = 1  # smaller CC -> dropped
    out = get_largest_fillhole(m)
    assert out[5, 5] == 1
    assert out[15, 15] == 0
    assert out[3, 3] == 1
    # empty input stays empty
    assert get_largest_fillhole(np.zeros((5, 5))).sum() == 0


def test_connectivity_region_analysis_3d():
    vol = np.zeros((4, 10, 10))
    vol[1:3, 2:6, 2:6] = 1  # big CC
    vol[0, 8, 8] = 1  # small CC
    out = connectivity_region_analysis(vol)
    assert out[1, 3, 3] == 1 and out[0, 8, 8] == 0
    assert connectivity_region_analysis(np.zeros((3, 5, 5))).sum() == 0


def test_postprocessing_branches():
    pred = np.zeros((2, 16, 16), np.float32)
    pred[0, 4:8, 4:8] = 0.9  # cup
    pred[1, 3:10, 3:10] = 0.9  # disc
    pred[1, 14, 14] = 0.8  # spurious blob below largest
    out = postprocessing(pred, threshold=0.75, dataset="fundus")
    assert out[0, 5, 5] == 1 and out[1, 5, 5] == 1 and out[1, 14, 14] == 0
    # 'D*' branch uses fixed thresholds .1/.5
    out2 = postprocessing(pred, dataset="Domain")
    assert out2[0].max() == 1
    # prostate branch on integer masks
    mask = np.zeros((8, 8), np.uint8)
    mask[2:5, 2:5] = 1
    out3 = postprocessing(mask, dataset="prostate")
    assert out3.sum() == 9


def test_segmentation_metric_iou():
    m = SegmentationMetric(2)
    pred = np.array([[0, 1], [1, 1]])
    gt = np.array([[0, 1], [0, 1]])
    m.update(pred, gt)
    iou = m.iou()
    assert abs(iou[1] - 2 / 3) < 1e-12
