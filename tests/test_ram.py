"""RAM kernel parity vs an independent float64 numpy oracle.

The oracle re-implements the *published semantics* of the reference
augmentation (full fft2, fftshift, in-band slice blend, phase-preserving
recombination, real part) — see /root/reference/code/dataset/fundus.py:13-61.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ramdsir_tpu.ops.ram import (
    amplitude_spectrum,
    low_freq_band_mask,
    ram_augment_fundus,
    ram_augment_prostate,
    ram_mixup,
    sample_ram_ratios,
)


def oracle_ram(src_hwc: np.ndarray, donor_hwc: np.ndarray, ratio: float, L: float = 0.1):
    """Reference semantics in float64, channels-first like the original."""
    src = src_hwc.astype(np.float64).transpose(2, 0, 1)
    donor = donor_hwc.astype(np.float64).transpose(2, 0, 1)
    fft_src = np.fft.fft2(src, axes=(-2, -1))
    amp_src, pha_src = np.abs(fft_src), np.angle(fft_src)
    amp_trg = np.abs(np.fft.fft2(donor, axes=(-2, -1)))

    a_src = np.fft.fftshift(amp_src, axes=(-2, -1))
    a_trg = np.fft.fftshift(amp_trg, axes=(-2, -1))
    _, h, w = a_src.shape
    b = int(np.floor(min(h, w) * L))
    c_h, c_w = int(np.floor(h / 2.0)), int(np.floor(w / 2.0))
    h1, h2, w1, w2 = c_h - b, c_h + b + 1, c_w - b, c_w + b + 1
    a_src[:, h1:h2, w1:w2] = a_src[:, h1:h2, w1:w2] * ratio + a_trg[:, h1:h2, w1:w2] * (1 - ratio)
    a_src = np.fft.ifftshift(a_src, axes=(-2, -1))

    out = np.real(np.fft.ifft2(a_src * np.exp(1j * pha_src), axes=(-2, -1)))
    return out.transpose(1, 2, 0)


@pytest.mark.parametrize("h,w", [(64, 64), (65, 63), (32, 48), (256, 256)])
@pytest.mark.parametrize("ratio", [0.1, 0.5, 1.0])
def test_ram_matches_oracle(h, w, ratio):
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 255, (2, h, w, 3)).astype(np.float32)
    donor = rng.uniform(0, 255, (2, h, w, 3)).astype(np.float32)

    donor_amp = amplitude_spectrum(jnp.asarray(donor))
    got = ram_mixup(jnp.asarray(src), donor_amp, jnp.full((2,), ratio, jnp.float32))
    got = np.asarray(got)

    for i in range(2):
        want = oracle_ram(src[i], donor[i], ratio)
        # fp32 rfft vs fp64 full fft; values are O(255)
        np.testing.assert_allclose(got[i], want, atol=2e-2, rtol=1e-5)


def test_band_mask_matches_shifted_definition():
    for h, w in [(64, 64), (65, 63), (10, 20)]:
        m = low_freq_band_mask(h, w, 0.1)
        b = int(np.floor(min(h, w) * 0.1))
        ms = np.fft.fftshift(m)
        c_h, c_w = h // 2, w // 2
        want = np.zeros((h, w), bool)
        want[c_h - b : c_h + b + 1, c_w - b : c_w + b + 1] = True
        np.testing.assert_array_equal(ms, want)
        # point symmetry under frequency negation (rfft-exactness condition)
        neg = m[(-np.arange(h)) % h][:, (-np.arange(w)) % w]
        np.testing.assert_array_equal(m, neg)


def test_ratio_distribution():
    key = jax.random.PRNGKey(0)
    r = np.asarray(sample_ram_ratios(key, 10000))
    assert set(np.round(np.unique(r) * 10).astype(int)) <= set(range(1, 11))
    assert abs(r.mean() - 0.55) < 0.02  # E[randint(1,10)/10] = 0.55


def test_ratio_one_is_identity():
    rng = np.random.default_rng(1)
    src = rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
    donor = rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
    out = ram_mixup(jnp.asarray(src), amplitude_spectrum(jnp.asarray(donor)), jnp.ones((1,)))
    np.testing.assert_allclose(np.asarray(out), src, atol=1e-3)


def test_fundus_wrapper_ranges():
    rng = np.random.default_rng(2)
    src = rng.uniform(0, 255, (4, 64, 64, 3)).astype(np.float32)
    donor = rng.uniform(0, 255, (4, 64, 64, 3)).astype(np.float32)
    img, freq = ram_augment_fundus(jnp.asarray(src), jnp.asarray(donor), jax.random.PRNGKey(0))
    assert float(jnp.min(freq)) >= -1.0 and float(jnp.max(freq)) <= 1.0
    np.testing.assert_allclose(np.asarray(img), src / 127.5 - 1.0, atol=1e-6)


def test_prostate_wrapper_ranges():
    rng = np.random.default_rng(3)
    src = rng.uniform(-1, 1, (4, 48, 48, 3)).astype(np.float32)
    donor = rng.uniform(-1, 1, (4, 48, 48, 3)).astype(np.float32)
    img, freq = ram_augment_prostate(jnp.asarray(src), jnp.asarray(donor), jax.random.PRNGKey(0))
    assert float(jnp.min(freq)) >= -1.0 and float(jnp.max(freq)) <= 1.0
    np.testing.assert_allclose(np.asarray(img), src, atol=0)


def test_pallas_mix_matches_jnp():
    rng = np.random.default_rng(4)
    src = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    donor = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    damp = amplitude_spectrum(jnp.asarray(donor))
    ratio = jnp.asarray([0.3, 0.7], jnp.float32)
    ref = ram_mixup(jnp.asarray(src), damp, ratio, use_pallas=False)
    got = ram_mixup(jnp.asarray(src), damp, ratio, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-5)


@pytest.mark.parametrize("h,w", [(64, 64), (65, 63), (32, 48)])
def test_banded_mixup_matches_full(h, w):
    """ram_mixup_banded (precomputed banded donor amplitudes) is numerically
    identical to ram_mixup: outside the band x/x == 1 exactly, inside it the
    same formula runs on the same inputs."""
    from ramdsir_tpu.ops.ram import banded_amplitude_spectrum, ram_mixup_banded

    rng = np.random.default_rng(7)
    src = rng.uniform(0, 255, (3, h, w, 3)).astype(np.float32)
    donor = rng.uniform(0, 255, (3, h, w, 3)).astype(np.float32)
    ratio = jnp.asarray([0.2, 0.6, 1.0], jnp.float32)

    full = ram_mixup(jnp.asarray(src), amplitude_spectrum(jnp.asarray(donor)), ratio)
    band = ram_mixup_banded(
        jnp.asarray(src), banded_amplitude_spectrum(jnp.asarray(donor)), ratio
    )
    np.testing.assert_allclose(np.asarray(band), np.asarray(full), atol=2e-4, rtol=1e-6)


def test_banded_mixup_matches_oracle():
    from ramdsir_tpu.ops.ram import banded_amplitude_spectrum, ram_mixup_banded

    rng = np.random.default_rng(8)
    src = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    donor = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    for ratio in (0.1, 0.5):
        got = np.asarray(
            ram_mixup_banded(
                jnp.asarray(src),
                banded_amplitude_spectrum(jnp.asarray(donor)),
                jnp.full((2,), ratio, jnp.float32),
            )
        )
        for i in range(2):
            want = oracle_ram(src[i], donor[i], ratio)
            np.testing.assert_allclose(got[i], want, atol=2e-2, rtol=1e-5)


@pytest.mark.parametrize("h,w", [(64, 64), (65, 63), (32, 48)])
def test_banded_dft_matches_fft_path(h, w):
    """The restricted-DFT matmul path == the FFT banded path (same mix math;
    out-of-band passes through exactly instead of via an fft->ifft
    round-trip, so the only difference is matmul-vs-FFT rounding)."""
    from ramdsir_tpu.ops.ram import (
        banded_amplitude_spectrum,
        ram_mixup_banded,
        ram_mixup_banded_dft,
    )

    rng = np.random.default_rng(11)
    src = rng.uniform(0, 255, (3, h, w, 3)).astype(np.float32)
    donor = rng.uniform(0, 255, (3, h, w, 3)).astype(np.float32)
    ratio = jnp.asarray([0.2, 0.6, 1.0], jnp.float32)
    damp = banded_amplitude_spectrum(jnp.asarray(donor))

    fft = ram_mixup_banded(jnp.asarray(src), damp, ratio)
    dft = ram_mixup_banded_dft(jnp.asarray(src), damp, ratio)
    np.testing.assert_allclose(np.asarray(dft), np.asarray(fft), atol=5e-3, rtol=1e-5)
    # ratio == 1: scale-1 == 0 exactly -> delta == 0 -> out IS src, bit-exact
    np.testing.assert_array_equal(np.asarray(dft)[2], src[2])


def test_banded_dft_matches_oracle():
    from ramdsir_tpu.ops.ram import banded_amplitude_spectrum, ram_mixup_banded_dft

    rng = np.random.default_rng(12)
    src = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    donor = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    for ratio in (0.1, 0.5):
        got = np.asarray(
            ram_mixup_banded_dft(
                jnp.asarray(src),
                banded_amplitude_spectrum(jnp.asarray(donor)),
                jnp.full((2,), ratio, jnp.float32),
            )
        )
        for i in range(2):
            want = oracle_ram(src[i], donor[i], ratio)
            np.testing.assert_allclose(got[i], want, atol=2e-2, rtol=1e-5)


def test_banded_dft_wrappers_match_fft_wrappers():
    from ramdsir_tpu.ops.ram import (
        banded_amplitude_spectrum,
        ram_augment_fundus_banded,
        ram_augment_prostate_banded,
    )

    rng = np.random.default_rng(13)
    key = jax.random.PRNGKey(6)
    src = rng.uniform(0, 255, (4, 48, 48, 3)).astype(np.float32)
    donor = rng.uniform(0, 255, (4, 48, 48, 3)).astype(np.float32)
    damp = banded_amplitude_spectrum(jnp.asarray(donor))
    img_a, freq_a = ram_augment_fundus_banded(jnp.asarray(src), damp, key)
    img_b, freq_b = ram_augment_fundus_banded(jnp.asarray(src), damp, key, use_dft=True)
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_a), atol=0)
    np.testing.assert_allclose(np.asarray(freq_b), np.asarray(freq_a), atol=5e-4)

    srcp = rng.uniform(-1, 1, (4, 48, 48, 3)).astype(np.float32)
    donorp = rng.uniform(-1, 1, (4, 48, 48, 3)).astype(np.float32)
    dampp = banded_amplitude_spectrum(jnp.asarray(donorp))
    img_a, freq_a = ram_augment_prostate_banded(jnp.asarray(srcp), dampp, key)
    img_b, freq_b = ram_augment_prostate_banded(jnp.asarray(srcp), dampp, key, use_dft=True)
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_a), atol=0)
    np.testing.assert_allclose(np.asarray(freq_b), np.asarray(freq_a), atol=5e-6)


def test_banded_amplitude_chunking_and_shape():
    """Chunked pool precompute == per-image slices of the full amplitude."""
    from ramdsir_tpu.ops.ram import band_halfwidth, banded_amplitude_spectrum

    rng = np.random.default_rng(9)
    pool = rng.uniform(0, 255, (7, 32, 48, 3)).astype(np.float32)
    b = band_halfwidth(32, 48)
    got = np.asarray(banded_amplitude_spectrum(jnp.asarray(pool), chunk=3))
    assert got.shape == (7, 2 * b + 1, b + 1, 3)
    amp = np.abs(np.fft.rfft2(pool, axes=(1, 2)))
    want = np.concatenate([amp[:, : b + 1, : b + 1], amp[:, 32 - b :, : b + 1]], axis=1)
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-2, rtol=1e-5)


def test_banded_fundus_prostate_wrappers_match_legacy():
    """The banded wrappers reproduce the legacy in-step-donor-FFT wrappers
    bit-for-bit up to FFT batching noise (same keys -> same ratios)."""
    from ramdsir_tpu.ops.ram import (
        banded_amplitude_spectrum,
        ram_augment_fundus_banded,
        ram_augment_prostate_banded,
    )

    rng = np.random.default_rng(10)
    key = jax.random.PRNGKey(5)
    src = rng.uniform(0, 255, (4, 48, 48, 3)).astype(np.float32)
    donor = rng.uniform(0, 255, (4, 48, 48, 3)).astype(np.float32)
    img_a, freq_a = ram_augment_fundus(jnp.asarray(src), jnp.asarray(donor), key)
    img_b, freq_b = ram_augment_fundus_banded(
        jnp.asarray(src), banded_amplitude_spectrum(jnp.asarray(donor)), key
    )
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_a), atol=0)
    np.testing.assert_allclose(np.asarray(freq_b), np.asarray(freq_a), atol=1e-5)

    srcp = rng.uniform(-1, 1, (4, 48, 48, 3)).astype(np.float32)
    donorp = rng.uniform(-1, 1, (4, 48, 48, 3)).astype(np.float32)
    img_a, freq_a = ram_augment_prostate(jnp.asarray(srcp), jnp.asarray(donorp), key)
    img_b, freq_b = ram_augment_prostate_banded(
        jnp.asarray(srcp), banded_amplitude_spectrum(jnp.asarray(donorp)), key
    )
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_a), atol=0)
    np.testing.assert_allclose(np.asarray(freq_b), np.asarray(freq_a), atol=1e-6)
