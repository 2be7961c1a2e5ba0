"""OD/fovea localization helpers (reference code/utils/od_coords.py)."""
import numpy as np

from ramdsir_tpu.utils import od_coords as oc


def _gaussian_blob(size, cy, cx, sigma, amp=1.0):
    y, x = np.mgrid[:size, :size]
    return amp * np.exp(-((y - cy) ** 2 + (x - cx) ** 2) / (2 * sigma**2))


def test_find_od_f_two_separated_peaks():
    pred = _gaussian_blob(512, 120, 140, 12, 1.0) + _gaussian_blob(512, 360, 380, 12, 0.8)
    coords = oc.find_od_f(pred)
    assert coords.shape == (2, 2)
    # strongest first (skimage intensity ordering)
    assert np.allclose(coords[0], (120, 140), atol=2)
    assert np.allclose(coords[1], (360, 380), atol=2)


def test_peak_local_max_min_distance_suppression():
    pred = _gaussian_blob(128, 60, 60, 5, 1.0) + _gaussian_blob(128, 70, 60, 5, 0.9)
    # the two blobs merge closer than min_distance -> one peak survives
    coords = oc.peak_local_max(pred, min_distance=30, num_peaks=2)
    assert len(coords) == 1


def test_peak_local_max_excludes_border_peaks():
    # skimage default exclude_border=True drops peaks within min_distance
    # of the border: the STRONGER peak at (10, 64) must be excluded and
    # the interior one returned
    pred = _gaussian_blob(128, 10, 64, 4, 1.0) + _gaussian_blob(128, 64, 64, 4, 0.5)
    coords = oc.peak_local_max(pred, min_distance=30, num_peaks=2)
    assert len(coords) == 1
    assert np.allclose(coords[0], (64, 64), atol=2)
    # opt-out returns the border peak first, like skimage exclude_border=False
    coords = oc.peak_local_max(pred, min_distance=30, num_peaks=2, exclude_border=False)
    assert np.allclose(coords[0], (10, 64), atol=2)


def test_blob_overlap_pruning():
    # nested disks: the smaller-sigma blob is pruned (skimage overlap=0.5)
    blobs = oc._prune_blobs(np.array([[50.0, 50.0, 10.0], [52.0, 52.0, 5.0]]), 0.5)
    assert blobs.shape == (1, 3) and blobs[0, 2] == 10.0
    # disjoint disks: both survive
    blobs = oc._prune_blobs(
        np.array([[50.0, 50.0, 5.0], [200.0, 200.0, 5.0]]), 0.5
    )
    assert blobs.shape == (2, 3)
    # overlap fraction sanity: nested -> 1, disjoint -> 0, partial in (0, 1)
    assert oc._disk_overlap(10.0, 5.0, 2.0) == 1.0
    assert oc._disk_overlap(5.0, 5.0, 20.0) == 0.0
    assert 0.0 < oc._disk_overlap(5.0, 5.0, 5.0) < 1.0


def test_determine_od_prefers_brighter_green():
    img = np.zeros((512, 512, 3))
    img[:, :, 1] = _gaussian_blob(512, 100, 100, 20, 200)  # bright OD
    coords = np.array([[400, 400], [100, 100]])
    od, fov = oc.determine_od(img, coords)
    assert tuple(od) == (100, 100) and tuple(fov) == (400, 400)


def test_determine_od_clamps_border_peaks():
    img = np.random.default_rng(0).uniform(size=(512, 512, 3))
    od, fov = oc.determine_od(img, np.array([[0, 0], [511, 511]]))
    assert set(np.concatenate([od, fov])) <= {3, 508}


def test_get_diameters_and_centroid():
    mask = np.zeros((64, 64), dtype=np.uint8)
    mask[20:41, 10:51] = 1  # 21 rows x 41 cols
    mask[30, 30] = 0  # a hole, filled by get_centroid
    dc, dr = oc.get_diameters(mask)
    assert (dc, dr) == (40, 20)
    c, r = oc.get_centroid(mask, fill=True)
    assert (c, r) == (30, 30)


def test_distance_metrics():
    d = oc.distance_metric((0, 0), (3, 4))
    assert d == 5.0
    d, err = oc.distance_error((0, 0), (3, 4), od_radius=10.0)
    assert (d, err) == (5.0, 0.5)
    assert oc.get_new_peaks((256, 128), (1024, 1024)) == (512.0, 256.0)


def test_get_peak_coordinates_finds_blobs():
    img = np.zeros((512, 512, 3))
    for ch in range(3):
        img[:, :, ch] = _gaussian_blob(512, 150, 150, 20, 1.0) + _gaussian_blob(
            512, 350, 350, 20, 0.9
        )
    coords = oc.get_peak_coordinates(img, threshold=0.05)
    assert coords.shape[0] >= 2
    found = {tuple(c) for c in coords}
    assert any(abs(r - 150) <= 3 and abs(c - 150) <= 3 for r, c in found)
    assert any(abs(r - 350) <= 3 and abs(c - 350) <= 3 for r, c in found)


def test_get_peak_coordinates_fallback_appends_center():
    coords = oc.get_peak_coordinates(np.zeros((512, 512, 3)), threshold=0.2)
    # reference bug (discarded concatenate) fixed: the (256, 256) fallback
    # row actually lands in the output
    assert (256, 256) in {tuple(c) for c in coords}
