"""Filter bank tests: coefficients and responses validated against scipy
(the reference validated these only by ear/plots — filter_test/*.py)."""

import numpy as np
import pytest
import scipy.signal as sps

from rayverb_tpu.config.schema import FilterType
from rayverb_tpu.ops.filters import (
    KERNEL_LENGTH,
    bandpass_biquad_coeffs,
    bandpass_sinc_kernel,
    biquad_onepass,
    biquad_twopass,
    blackman,
    filter_bank,
    fir_filter,
    hipass_kernel,
    linkwitz_riley_coeffs,
    lopass_kernel,
    sinc_kernel,
)

SR = 44100.0


def test_blackman_matches_reference_formula():
    w = blackman(29)
    assert w.shape == (29,)
    # symmetric, peak at centre
    np.testing.assert_allclose(w, w[::-1], atol=1e-12)
    assert np.argmax(w) == 14


def test_sinc_kernel_odd_only():
    with pytest.raises(ValueError):
        sinc_kernel(0.1, 28)
    k = sinc_kernel(0.1, 29)
    assert k[14] == 1.0


def test_lopass_kernel_response():
    k = lopass_kernel(SR, 5000.0, KERNEL_LENGTH).astype(np.float64)
    w, h = sps.freqz(k / k.sum(), worN=2048, fs=SR)
    h = np.abs(h)
    assert h[0] > 0.99                      # passband
    assert h[np.searchsorted(w, 15000)] < 0.1  # stopband


def test_hipass_kernel_response():
    """The reference's spectral inversion acts on a MAX-normalised lowpass
    (normalize = divide by peak, generic_functions.h:56-62), so its hipass
    retains DC leakage: |H(0)| = |1 - sum(lowpass)|, not 0. Preserve the
    quirk but require the response to actually slope upward."""
    k = hipass_kernel(SR, 5000.0, KERNEL_LENGTH).astype(np.float64)
    lo = lopass_kernel(SR, 5000.0, KERNEL_LENGTH).astype(np.float64)
    # construction identity (filters.cpp:75-81): k = -lowpass, +1 at centre
    want = -lo.copy()
    want[(KERNEL_LENGTH - 1) // 2] += 1
    np.testing.assert_allclose(k, want, atol=1e-7)
    w, h = sps.freqz(k, worN=2048, fs=SR)
    np.testing.assert_allclose(np.abs(h)[0], abs(1 - lo.sum()), atol=1e-4)


def test_bandpass_kernel_is_lp_conv_hp():
    k = bandpass_sinc_kernel(SR, 700.0, 1400.0)
    assert k.shape == (KERNEL_LENGTH,)
    half = 1 + KERNEL_LENGTH // 2
    manual = np.convolve(
        lopass_kernel(SR, 1400.0, half).astype(np.float64),
        hipass_kernel(SR, 700.0, half).astype(np.float64),
    )
    np.testing.assert_allclose(k, manual, atol=1e-6)


def test_fir_filter_matches_npconvolve(rng):
    x = rng.normal(size=300).astype(np.float32)
    k = bandpass_sinc_kernel(SR, 700.0, 1400.0)
    out = np.asarray(fir_filter(x, k))
    # FastConvolution: output is the FULL convolution (input grows by 28)
    assert out.shape == (300 + KERNEL_LENGTH - 1,)
    np.testing.assert_allclose(
        out, np.convolve(x.astype(np.float64), k), atol=1e-4
    )


def test_biquad_onepass_matches_scipy(rng):
    coeffs = bandpass_biquad_coeffs(700.0, 1400.0, SR)
    b = [coeffs[0], coeffs[1], coeffs[2]]
    a = [1.0, coeffs[3], coeffs[4]]
    x = rng.normal(size=2000).astype(np.float32)
    want = sps.lfilter(b, a, x.astype(np.float64))
    got = np.asarray(biquad_onepass(x, np.asarray(coeffs)))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_biquad_twopass_matches_scipy(rng):
    coeffs = bandpass_biquad_coeffs(700.0, 1400.0, SR)
    b = [coeffs[0], coeffs[1], coeffs[2]]
    a = [1.0, coeffs[3], coeffs[4]]
    x = rng.normal(size=1500).astype(np.float32)
    fwd = sps.lfilter(b, a, x.astype(np.float64))
    want = sps.lfilter(b, a, fwd[::-1])[::-1]
    got = np.asarray(biquad_twopass(x, np.asarray(coeffs)))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_linkwitz_riley_crossover_gain():
    """Twice-applied 2nd-order butterworth => -6 dB (|H| = 0.5) at each
    band edge (zero phase)."""
    lo, hi = 45.0, 2800.0
    lp, hp = linkwitz_riley_coeffs(lo, hi, SR)
    # frequency response of the zero-phase cascade
    for coeffs, edge in ((lp, hi), (hp, lo)):
        b = np.array([coeffs[0], coeffs[1], coeffs[2]])
        a = np.array([1.0, coeffs[3], coeffs[4]])
        w, h = sps.freqz(b, a, worN=[edge], fs=SR)
        np.testing.assert_allclose(np.abs(h[0]) ** 2, 0.5, rtol=0.02)


def test_filter_bank_shapes(rng):
    x = rng.normal(size=(2, 8, 400)).astype(np.float32)
    for ft, extra in [
        (FilterType.WINDOWED_SINC, KERNEL_LENGTH - 1),
        (FilterType.BIQUAD_ONEPASS, 0),
        (FilterType.BIQUAD_TWOPASS, 0),
        (FilterType.LINKWITZ_RILEY, 0),
    ]:
        out = filter_bank(x, SR, 45.0, ft)
        assert out.shape == (2, 8, 400 + extra), ft


def test_numpy_fallback_matches_device_fft(rng):
    from rayverb_tpu.ops.filters import (
        _band_coeffs,
        _bank_fft_passes,
        _bank_fft_passes_numpy,
        _biquad_response,
        _fft_len,
    )
    import jax.numpy as jnp

    x = rng.normal(size=(2, 8, 700)).astype(np.float32)
    passes = _band_coeffs(FilterType.LINKWITZ_RILEY, SR, 45.0)
    nfft = _fft_len(700)
    responses = np.stack(
        [
            np.stack([_biquad_response(c, nfft).astype(np.complex64) for c in cs])
            for cs, _ in passes
        ]
    )
    flips = tuple(bool(f) for _, f in passes)
    dev = np.asarray(_bank_fft_passes(jnp.asarray(x), jnp.asarray(responses), flips, nfft))
    host = _bank_fft_passes_numpy(x, responses, flips, nfft)
    np.testing.assert_allclose(dev, host, atol=5e-4)


def test_fft_method_matches_scan(rng):
    """For a signal that decays to zero, the FFT fast path matches the scan
    path closely (documented deviation bound)."""
    t = np.arange(4000)
    x = (rng.normal(size=(8, 4000)) * np.exp(-t / 400)).astype(np.float32)
    x[:, -200:] = 0
    for ft in (FilterType.BIQUAD_ONEPASS, FilterType.LINKWITZ_RILEY):
        a = np.asarray(filter_bank(x[None], SR, 45.0, ft, method="scan"))
        b = np.asarray(filter_bank(x[None], SR, 45.0, ft, method="fft"))
        scale = np.abs(a).max() + 1e-9
        assert np.abs(a - b).max() / scale < 2e-3, ft
