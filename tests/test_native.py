"""Native C++ kernels vs the scipy reference paths (and speed sanity)."""
import numpy as np
import pytest
from scipy import ndimage

from ramdsir_tpu import native
from ramdsir_tpu.ops.metrics import _surface_mask


@pytest.fixture(scope="module")
def lib_ok():
    if native._get_lib() is None:
        pytest.skip("native toolchain unavailable")
    return True


def _scipy_largest_fillhole(binary):
    structure = ndimage.generate_binary_structure(2, 2)
    labels, n = ndimage.label(binary, structure=structure)
    if n == 0:
        return np.zeros_like(binary, dtype=np.int64)
    sizes = ndimage.sum(binary, labels, range(1, n + 1))
    kept = labels == (int(np.argmax(sizes)) + 1)
    return ndimage.binary_fill_holes(kept.astype(int)).astype(np.int64)


def test_largest_cc_fillhole_matches_scipy(lib_ok):
    rng = np.random.default_rng(0)
    for _ in range(20):
        m = rng.uniform(size=(40, 40)) > 0.6
        got = native.largest_cc_fillhole_native(m)
        want = _scipy_largest_fillhole(m)
        np.testing.assert_array_equal(got, want)
    assert native.largest_cc_fillhole_native(np.zeros((8, 8), bool)).sum() == 0


def test_largest_cc_nd_matches_scipy(lib_ok):
    rng = np.random.default_rng(1)
    for shape in [(30, 30), (6, 20, 20)]:
        for _ in range(10):
            m = rng.uniform(size=shape) > 0.7
            got = native.largest_cc_nd_native(m)
            labels, n = ndimage.label(m)
            sizes = ndimage.sum(m, labels, range(n + 1))
            winner = int(np.argmax(sizes))
            want = (labels == winner).astype(np.int64)
            if winner == 0:
                want[:] = 0
            np.testing.assert_array_equal(np.asarray(got, np.int64), want)


def test_surface_distances_match_scipy(lib_ok):
    rng = np.random.default_rng(2)
    for shape in [(50, 50), (8, 24, 24)]:
        for _ in range(5):
            yy = np.indices(shape)
            c1 = np.array([s // 2 for s in shape]) + rng.integers(-3, 3, len(shape))
            c2 = np.array([s // 2 for s in shape]) + rng.integers(-3, 3, len(shape))
            r1, r2 = min(shape) // 3, min(shape) // 4
            a = (sum((yy[i] - c1[i]) ** 2 for i in range(len(shape))) < r1 * r1)
            b = (sum((yy[i] - c2[i]) ** 2 for i in range(len(shape))) < r2 * r2)
            if not a.any() or not b.any():
                continue
            got = np.sort(native.surface_distances_native(a, b))
            rb = _surface_mask(a)
            gb = _surface_mask(b)
            dt = ndimage.distance_transform_edt(~gb)
            want = np.sort(dt[rb])
            np.testing.assert_allclose(got, want, atol=1e-9)


def test_surface_distances_empty_raises(lib_ok):
    a = np.zeros((8, 8), bool)
    b = np.ones((8, 8), bool)
    with pytest.raises(RuntimeError):
        native.surface_distances_native(a, b)
    with pytest.raises(RuntimeError):
        native.surface_distances_native(b, a)


def test_metrics_use_native_path(lib_ok):
    """ops.metrics.surface_distances must route through the native lib."""
    from ramdsir_tpu.ops import metrics

    a = np.zeros((30, 30), bool)
    a[5:20, 5:20] = True
    b = np.zeros((30, 30), bool)
    b[8:25, 8:25] = True
    # native and scipy agree end to end through the public API
    d = metrics.surface_distances(a, b)
    rb = _surface_mask(a)
    gb = _surface_mask(b)
    want = ndimage.distance_transform_edt(~gb)[rb]
    np.testing.assert_allclose(np.sort(d), np.sort(want), atol=1e-9)
