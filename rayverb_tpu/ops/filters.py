"""The multiband crossover filter bank.

Re-implements all four reference filters (rayverb/filters.{h,cpp}) without
FFTW:

  - windowed-sinc FIR  -> jnp.fft convolution (FastConvolution parity:
    output grows by KERNEL_LENGTH - 1 samples, filters.cpp:96-154)
  - biquad one-pass    -> lax.scan direct-form II (filters.cpp:156-168)
  - biquad two-pass    -> forward + reverse scans (filters.cpp:185-191)
  - Linkwitz-Riley     -> zero-phase 4th-order LP+HP from twice-applied
    2nd-order butterworth sections (filters.cpp:230-266)

Each IIR filter also has an FFT-domain fast path (`method='fft'`): the
rational transfer function is evaluated on the rFFT grid and applied with
generous zero-padding. For decayed-to-zero IRs this matches the scans to
~1e-6 while avoiding O(T) sequential steps on TPU; the scan path remains
the exact-parity default.

Band edges: {lo_cutoff, 175, 350, 700, 1400, 2800, 5600, 11200, 20000}
(filters.cpp:295-305).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import FilterType
from ..constants import FILTER_EDGES_UPPER

KERNEL_LENGTH = 29  # filters.h:123,139


# ---------------------------------------------------------------------------
# windowed-sinc kernels (host-side construction, filters.cpp:9-81)
# ---------------------------------------------------------------------------

def sinc_kernel(cutoff_ratio: float, length: int) -> np.ndarray:
    """Un-windowed lowpass sinc kernel (filters.cpp:17-33)."""
    if length % 2 == 0:
        raise ValueError("Length of sinc filter kernel must be odd.")
    i = np.arange(length, dtype=np.float64)
    center = (length - 1) / 2.0
    x = 2 * cutoff_ratio * (i - center)
    with np.errstate(invalid="ignore"):
        k = np.sin(np.pi * x) / (np.pi * x)
    k[int(center)] = 1.0
    return k


def blackman(length: int) -> np.ndarray:
    """Exact blackman coefficients (filters.cpp:35-54)."""
    a0, a1, a2 = 7938.0 / 18608.0, 9240.0 / 18608.0, 1430.0 / 18608.0
    off = np.arange(length, dtype=np.float64) / (length - 1.0)
    return a0 - a1 * np.cos(2 * np.pi * off) + a2 * np.cos(4 * np.pi * off)


def lopass_kernel(sr: float, cutoff: float, length: int) -> np.ndarray:
    """Windowed, max-normalised lowpass kernel (filters.cpp:56-71)."""
    k = blackman(length) * sinc_kernel(cutoff / sr, length)
    return (k / np.max(np.abs(k))).astype(np.float32)


def hipass_kernel(sr: float, cutoff: float, length: int) -> np.ndarray:
    """Spectral inversion of the lowpass (filters.cpp:73-81)."""
    k = -lopass_kernel(sr, cutoff, length).astype(np.float64)
    k[(length - 1) // 2] += 1
    return k.astype(np.float32)


def bandpass_sinc_kernel(sr: float, lo: float, hi: float) -> np.ndarray:
    """Bandpass = lowpass(hi) (*) hipass(lo), each of length 1 + 29//2
    (BandpassWindowedSinc::bandpassKernel, filters.cpp:126-137)."""
    half = 1 + KERNEL_LENGTH // 2
    lop = lopass_kernel(sr, hi, half).astype(np.float64)
    hip = hipass_kernel(sr, lo, half).astype(np.float64)
    return np.convolve(lop, hip)[:KERNEL_LENGTH].astype(np.float32)


def fir_filter(data, kernel) -> jax.Array:
    """Full linear convolution via FFT (FastConvolution semantics: output
    length = len(data) + len(kernel) - 1, the 14-sample sinc delay is NOT
    compensated — filters.cpp:104-107 replaces data with the full result).
    data: (..., T)."""
    data = jnp.asarray(data, jnp.float32)
    kernel = jnp.asarray(kernel, jnp.float32)
    t = data.shape[-1]
    out_len = t + kernel.shape[-1] - 1
    nfft = out_len
    d = jnp.fft.rfft(data, n=nfft)
    k = jnp.fft.rfft(kernel, n=nfft)
    return jnp.fft.irfft(d * k, n=nfft).astype(jnp.float32)[..., :out_len]


# ---------------------------------------------------------------------------
# biquad coefficients (filters.cpp:193-266)
# ---------------------------------------------------------------------------

def bandpass_biquad_coeffs(lo: float, hi: float, sr: float):
    """RBJ cookbook constant-skirt bandpass (filters.cpp:193-218)."""
    c = math.sqrt(lo * hi)
    omega = 2 * math.pi * c / sr
    cs = math.cos(omega)
    sn = math.sin(omega)
    bandwidth = math.log2(hi / lo)
    q = sn / (math.log(2) * bandwidth * omega)
    alpha = sn * math.sinh(1 / (2 * q))
    a0 = 1 + alpha
    nrm = 1 / a0
    return (
        nrm * alpha,        # b0
        0.0,                # b1
        nrm * -alpha,       # b2
        nrm * (-2 * cs),    # a1
        nrm * (1 - alpha),  # a2
    )


def _get_c(co: float, sr: float) -> float:
    wct = math.pi * co / sr
    return math.cos(wct) / math.sin(wct)


def linkwitz_riley_coeffs(lo: float, hi: float, sr: float):
    """2nd-order butterworth LP(hi) and HP(lo) sections; each is applied
    twice forward-backward for 4th-order zero-phase (filters.cpp:236-266)."""
    c = _get_c(hi, sr)
    a0 = c * c + c * math.sqrt(2) + 1
    lopass = (
        1 / a0,
        2 / a0,
        1 / a0,
        (-2 * (c * c - 1)) / a0,
        (c * c - c * math.sqrt(2) + 1) / a0,
    )
    c = _get_c(lo, sr)
    a0 = c * c + c * math.sqrt(2) + 1
    hipass = (
        (c * c) / a0,
        (-2 * c * c) / a0,
        (c * c) / a0,
        (-2 * (c * c - 1)) / a0,
        (c * c - c * math.sqrt(2) + 1) / a0,
    )
    return lopass, hipass


# ---------------------------------------------------------------------------
# biquad application
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("reverse",))
def biquad_onepass(data, coeffs, *, reverse: bool = False):
    """Direct-form II transposed scan (Biquad::onepass, filters.cpp:156-168).
    data: (..., T); coeffs: (5,) [b0, b1, b2, a1, a2]. The reference keeps
    double-precision state; the scan state here is float32 (TPU-native),
    validated against scipy to ~1e-4.

    reverse=True runs the filter back-to-front via lax.scan(reverse=True) —
    equivalent to flip/filter/flip but without materialising reversed
    arrays (jnp.flip between scans also miscompiles on some TPU backends).
    """
    data = jnp.asarray(data, jnp.float32)
    b0, b1, b2, a1, a2 = [c.astype(jnp.float32) for c in jnp.asarray(coeffs)]

    def step(carry, x):
        z1, z2 = carry
        out = x * b0 + z1
        z1_new = x * b1 + z2 - a1 * out
        z2_new = x * b2 - a2 * out
        return (z1_new, z2_new), out

    zeros = jnp.zeros(data.shape[:-1], jnp.float32)
    _, out = jax.lax.scan(
        step, (zeros, zeros), jnp.moveaxis(data, -1, 0), reverse=reverse
    )
    return jnp.moveaxis(out, 0, -1)


def biquad_twopass(data, coeffs):
    """Forward-backward (zero phase) (Biquad::twopass, filters.cpp:185-191)."""
    out = biquad_onepass(data, coeffs)
    out = jnp.flip(out, axis=-1)
    out = biquad_onepass(out, coeffs)
    return jnp.flip(out, axis=-1)


def _biquad_response(coeffs, nfft: int):
    """H(e^{jw}) of a biquad on the rFFT grid (float64 on host)."""
    b0, b1, b2, a1, a2 = [float(c) for c in coeffs]
    w = np.exp(-2j * np.pi * np.arange(nfft // 2 + 1) / nfft)
    num = b0 + b1 * w + b2 * w * w
    den = 1.0 + a1 * w + a2 * w * w
    return num / den


def _fft_len(t: int, pad: int = 8192) -> int:
    n = t + pad
    return 1 << (n - 1).bit_length()


def fft_biquad_onepass(data, coeffs):
    """One causal biquad pass as FFT convolution, truncated to the input
    length — numerically equivalent to the lax.scan pass (zero initial
    conditions == zero-extended input; the filter's response beyond the
    zero padding has decayed below float32 noise)."""
    data = jnp.asarray(data, jnp.float32)
    t = data.shape[-1]
    nfft = _fft_len(t)
    h = jnp.asarray(_biquad_response(coeffs, nfft).astype(np.complex64))
    out = jnp.fft.irfft(jnp.fft.rfft(data, n=nfft) * h, n=nfft)
    return out[..., :t].astype(jnp.float32)


def fft_biquad_twopass(data, coeffs):
    """Forward-backward with the same inter-pass truncation as the scan
    path (Biquad::twopass parity, filters.cpp:185-191)."""
    out = fft_biquad_onepass(data, coeffs)
    out = jnp.flip(out, axis=-1)
    out = fft_biquad_onepass(out, coeffs)
    return jnp.flip(out, axis=-1)


# ---------------------------------------------------------------------------
# the public bank (RayverbFiltering::filter, filters.cpp:268-306)
# ---------------------------------------------------------------------------

def band_edges(lo_cutoff: float, sample_rate: float | None = None):
    """Crossover edges {lo_cutoff, 175, ..., 20000} (filters.cpp:297-298).

    When a sample rate is given, edges are clamped below Nyquist while
    kept strictly increasing. The reference computes biquad coefficients
    for edges above Nyquist verbatim, which yields poles OUTSIDE the unit
    circle (e.g. Linkwitz-Riley band 7 at 16 kHz diverges to NaN); since
    no demo config renders below 44.1 kHz the bug was latent there. The
    clamp is a documented deviation that makes low-rate renders valid.
    """
    edges = [float(lo_cutoff)] + list(FILTER_EDGES_UPPER)
    if sample_rate is not None:
        cap = 0.49 * float(sample_rate)
        edges = [min(e, cap) for e in edges]
        for i in range(len(edges) - 1, 0, -1):
            if edges[i] <= edges[i - 1]:
                edges[i - 1] = edges[i] / 1.2
    return tuple(edges)


# Single-compile applicators: per-band coefficients are stacked on the host
# and every band/channel runs inside ONE jitted program (8+ separate op
# dispatches would each trigger a fresh XLA compile on the TPU backend).

@jax.jit
def _bank_scan_onepass(data, coeffs):
    """data (..., 8, T), coeffs (8, 5): per-band sequential biquads in one
    program (biquad_onepass already broadcasts leading channel dims)."""
    return jax.vmap(biquad_onepass, in_axes=(-2, 0), out_axes=-2)(data, coeffs)


def _scan_onepass_multi(data, coeff_stack):
    """Apply a sequence of (8, 5) coefficient sets, with optional
    time-reversal between passes encoded as (coeffs, flip) pairs."""
    out = jnp.asarray(data, jnp.float32)
    for coeffs, do_flip in coeff_stack:
        if do_flip:
            out = jnp.flip(out, axis=-1)
        out = _bank_scan_onepass(out, jnp.asarray(coeffs, jnp.float32))
    return out


@partial(jax.jit, static_argnames=("flips", "nfft"))
def _bank_fft_passes(data, responses, flips: tuple, nfft: int):
    """data (..., 8, T); responses (P, 8, nfft//2+1) complex64; flips: a
    static tuple of bools — flip time order before pass p. Each pass
    convolves band b with responses[p, b] and truncates to T. One compiled
    program total."""
    out = jnp.asarray(data, jnp.float32)
    t = out.shape[-1]
    nflips = 0
    for p, do_flip in enumerate(flips):
        if do_flip:
            out = jnp.flip(out, axis=-1)
            nflips += 1
        spec = jnp.fft.rfft(out, n=nfft)
        out = jnp.fft.irfft(spec * responses[p], n=nfft)[..., :t]
    if nflips % 2:
        out = jnp.flip(out, axis=-1)
    return out.astype(jnp.float32)


def _bank_fft_passes_numpy(data, responses, flips, nfft: int):
    """Host fallback for _bank_fft_passes (identical math in float64;
    used when the device backend rejects the FFT program)."""
    out = np.asarray(data, np.float64)
    t = out.shape[-1]
    nflips = 0
    for p, do_flip in enumerate(flips):
        if do_flip:
            out = out[..., ::-1]
            nflips += 1
        spec = np.fft.rfft(out, n=nfft)
        out = np.fft.irfft(spec * responses[p], n=nfft)[..., :t]
    if nflips % 2:
        out = out[..., ::-1]
    return np.ascontiguousarray(out).astype(np.float32)


def _fir_bank(data, kernels):
    """data (..., 8, T), kernels (8, K) -> full convolution per band,
    one jitted program."""

    @jax.jit
    def run(d, k):
        t = d.shape[-1]
        klen = k.shape[-1]
        out_len = t + klen - 1
        spec = jnp.fft.rfft(d, n=out_len)
        kspec = jnp.fft.rfft(k, n=out_len)
        return jnp.fft.irfft(spec * kspec, n=out_len).astype(jnp.float32)

    return run(jnp.asarray(data, jnp.float32), jnp.asarray(kernels, jnp.float32))


def _band_coeffs(filter_type: FilterType, sample_rate: float, lo_cutoff: float):
    """Host-side coefficient stacks: list of ((8, 5) array, flip_before)
    passes replaying the reference's per-band filter sequence."""
    edges = band_edges(lo_cutoff, sample_rate)
    per_band = [
        (edges[i], edges[i + 1]) for i in range(8)
    ]
    if filter_type in (FilterType.BIQUAD_ONEPASS, FilterType.BIQUAD_TWOPASS):
        c = np.array(
            [bandpass_biquad_coeffs(lo, hi, sample_rate) for lo, hi in per_band],
            dtype=np.float64,
        )
        if filter_type == FilterType.BIQUAD_ONEPASS:
            return [(c, False)]
        return [(c, False), (c, True)]  # forward then reversed
    lp = np.array(
        [linkwitz_riley_coeffs(lo, hi, sample_rate)[0] for lo, hi in per_band],
        dtype=np.float64,
    )
    hp = np.array(
        [linkwitz_riley_coeffs(lo, hi, sample_rate)[1] for lo, hi in per_band],
        dtype=np.float64,
    )
    # lopass.twopass then hipass.twopass (filters.cpp:262-266)
    return [(lp, False), (lp, True), (hp, True), (hp, True)]


def filter_bank(
    data,
    sample_rate: float,
    lo_cutoff: float,
    filter_type: FilterType,
    *,
    method: str = "scan",
):
    """Filter (..., 8, T) band signals in place of the reference's
    per-channel loop. Returns (..., 8, T') — T' = T + 28 for the sinc
    filter (FastConvolution growth), T otherwise.

    method: 'scan' (exact sequential IIR parity) or 'fft' (each causal pass
    as a truncated FFT convolution — numerically equivalent up to float32
    wrap-around noise, no O(T) sequential chain on TPU).
    """
    # Host copy taken BEFORE any device attempt: a failed device compile
    # poisons the backend on some tunneled TPU runtimes, after which even a
    # D2H pull of `data` raises — so the numpy fallbacks below must never
    # touch a device array (observed crash: modular --filter-method fft).
    host_data = np.asarray(data, np.float32)
    data = jnp.asarray(host_data)
    if filter_type == FilterType.WINDOWED_SINC:
        edges = band_edges(lo_cutoff, sample_rate)
        kernels = np.stack(
            [
                bandpass_sinc_kernel(sample_rate, edges[i], edges[i + 1])
                for i in range(8)
            ]
        )
        return _fir_bank(data, kernels)

    passes = _band_coeffs(filter_type, sample_rate, lo_cutoff)
    if method == "fft":
        t = data.shape[-1]
        nfft = _fft_len(t)
        responses = np.stack(
            [
                np.stack(
                    [
                        _biquad_response(c, nfft).astype(np.complex64)
                        for c in coeffs
                    ]
                )
                for coeffs, _ in passes
            ]
        )
        flips = tuple(bool(f) for _, f in passes)
        try:
            return _bank_fft_passes(data, jnp.asarray(responses), flips, nfft)
        except jax.errors.JaxRuntimeError as e:  # pragma: no cover - backend flake
            import sys

            print(
                f"WARNING: device FFT filter bank failed ({e}); "
                "falling back to host numpy",
                file=sys.stderr,
            )
            # Return a HOST array computed from the pre-captured host copy:
            # a failed device compile poisons further compiles AND transfers
            # on some backends, so downstream must stay on host.
            return _bank_fft_passes_numpy(host_data, responses, flips, nfft)
    # note: trailing un-flip to restore time order after an odd number of
    # reversed passes (none of the reference sequences end odd)
    try:
        out = _scan_onepass_multi(data, passes)
        nflips = sum(1 for _, f in passes if f)
        if nflips % 2:
            out = jnp.flip(out, axis=-1)
        return out
    except jax.errors.JaxRuntimeError as e:  # pragma: no cover - backend flake
        import sys

        print(
            f"WARNING: device scan filter bank failed ({e}); "
            "falling back to host numpy FFT equivalent",
            file=sys.stderr,
        )
        t = data.shape[-1]
        nfft = _fft_len(t)
        responses = np.stack(
            [
                np.stack(
                    [_biquad_response(c, nfft).astype(np.complex64) for c in coeffs]
                )
                for coeffs, _ in passes
            ]
        )
        flips = tuple(bool(f) for _, f in passes)
        return _bank_fft_passes_numpy(host_data, responses, flips, nfft)
