"""Scatter-free sorted binning vs the scatter reference path.

`ops.render._bin_rows_sorted` (and the multi-pair variant in
`parallel.datagen`) must reproduce `_attenuate_and_bin`'s histograms and
time stats exactly up to within-bin f32 summation order: same
row-admission rules (zero-volume rows contribute nothing, out-of-range
bins drop — flattenImpulses, rayverb.cpp:48-77), same min/max
post-attenuation times.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rayverb_tpu.ops.render import (
    AttenSpec,
    _attenuate_and_bin,
    _bin_rows_sorted,
    _dense_from_runs,
    _segmented_run_totals,
)

LENGTH = 64
SAMPLE_RATE = 1000.0


def speaker_spec(nchannels=2):
    dirs = jnp.asarray(
        np.stack([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]][:nchannels]),
        jnp.float32,
    )
    coeffs = jnp.asarray([0.5, 0.0][:nchannels], jnp.float32)
    return AttenSpec(False, nchannels, dirs, coeffs, None, None, None)


def hrtf_spec():
    from rayverb_tpu.hrtf.table import test_table

    return AttenSpec(
        True,
        2,
        None,
        None,
        jnp.asarray(test_table(), jnp.float32),
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
        jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
    )


def random_rows(m, seed=0, drop_fraction=0.3):
    """Impulse rows exercising every admission rule: zero-volume rows,
    times past the histogram end (dropped), heavy bin collisions."""
    rng = np.random.default_rng(seed)
    volumes = rng.standard_normal((m, 8)).astype(np.float32)
    volumes[rng.random(m) < drop_fraction] = 0.0
    positions = rng.standard_normal((m, 3)).astype(np.float32) * 3.0
    # ~1/8 of rows land past the histogram (drop), rest collide heavily
    times = (rng.random(m) * LENGTH * 1.15 / SAMPLE_RATE).astype(np.float32)
    times[rng.random(m) < 0.05] = 0.0
    return jnp.asarray(volumes), jnp.asarray(positions), jnp.asarray(times)


@pytest.mark.parametrize("spec_kind", ["speaker", "hrtf"])
@pytest.mark.parametrize("m", [1, 7, 513])
def test_sorted_matches_scatter(spec_kind, m):
    spec = speaker_spec() if spec_kind == "speaker" else hrtf_spec()
    mic = jnp.asarray([0.5, -0.25, 1.0], jnp.float32)
    vol, pos, tim = random_rows(m, seed=m)

    h_ref, mn_ref, mx_ref = _attenuate_and_bin(
        mic, vol, pos, tim, spec, LENGTH, SAMPLE_RATE, predelay=None
    )
    h_srt, mn_srt, mx_srt = _bin_rows_sorted(
        mic, vol, pos, tim, spec, LENGTH, SAMPLE_RATE
    )
    scale = max(float(jnp.max(jnp.abs(h_ref))), 1e-9)
    np.testing.assert_allclose(
        np.asarray(h_srt) / scale, np.asarray(h_ref) / scale, atol=2e-6
    )
    assert float(mn_srt) == pytest.approx(float(mn_ref), rel=1e-6)
    assert float(mx_srt) == pytest.approx(float(mx_ref), rel=1e-6)


def test_sorted_all_rows_dropped():
    """All-zero volumes: empty histogram, min=inf/max=0 exactly like the
    scatter path."""
    spec = speaker_spec()
    mic = jnp.zeros((3,), jnp.float32)
    vol = jnp.zeros((16, 8), jnp.float32)
    pos = jnp.ones((16, 3), jnp.float32)
    tim = jnp.full((16,), 0.01, jnp.float32)
    h_ref, mn_ref, mx_ref = _attenuate_and_bin(
        mic, vol, pos, tim, spec, LENGTH, SAMPLE_RATE, predelay=None
    )
    h_srt, mn_srt, mx_srt = _bin_rows_sorted(
        mic, vol, pos, tim, spec, LENGTH, SAMPLE_RATE
    )
    assert float(jnp.max(jnp.abs(h_srt))) == 0.0
    np.testing.assert_array_equal(np.asarray(h_srt), np.asarray(h_ref))
    assert np.isinf(float(mn_srt)) and np.isinf(float(mn_ref))
    assert float(mx_srt) == float(mx_ref) == 0.0


def test_sorted_init_hist_accumulates():
    spec = speaker_spec()
    mic = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    vol, pos, tim = random_rows(64, seed=5)
    base = jnp.asarray(
        np.random.default_rng(9).random((2, 8, LENGTH)), jnp.float32
    )
    h0, _, _ = _bin_rows_sorted(mic, vol, pos, tim, spec, LENGTH, SAMPLE_RATE)
    h1, _, _ = _bin_rows_sorted(
        mic, vol, pos, tim, spec, LENGTH, SAMPLE_RATE, init_hist=base
    )
    np.testing.assert_allclose(
        np.asarray(h1), np.asarray(h0 + base), rtol=1e-6, atol=1e-7
    )


def test_segmented_run_totals_exact():
    """Run-leading rows hold exact per-run sums (float64 check on values
    small enough that tree vs sequential order is exact)."""
    keys = jnp.asarray([0, 0, 0, 2, 2, 5, 7, 7, 7, 7], jnp.int32)
    vals = jnp.asarray(
        np.arange(10, dtype=np.float32)[:, None] * np.ones((10, 8), np.float32)
    )
    out = np.asarray(_segmented_run_totals(keys, vals))
    # run starts: rows 0 (sum 0+1+2), 3 (3+4), 5 (5), 6 (6+7+8+9)
    np.testing.assert_allclose(out[0], 3.0 * np.ones(8))
    np.testing.assert_allclose(out[3], 7.0 * np.ones(8))
    np.testing.assert_allclose(out[5], 5.0 * np.ones(8))
    np.testing.assert_allclose(out[6], 30.0 * np.ones(8))


def test_dense_from_runs_sentinel_drop():
    """Keys at/after `length` (the drop sentinel) never land in the dense
    histogram; missing bins are zero."""
    length = 8
    keys = jnp.asarray([1, 1, 4, 8, 8, 8], jnp.int32)  # 8 = sentinel
    vals = jnp.asarray(np.ones((6, 8), np.float32))
    totals = _segmented_run_totals(keys, vals)
    dense = np.asarray(_dense_from_runs(keys, totals, length))  # (8, length)
    assert dense.shape == (8, length)
    np.testing.assert_allclose(dense[:, 1], 2.0)
    np.testing.assert_allclose(dense[:, 4], 1.0)
    mask = np.ones(length, bool)
    mask[[1, 4]] = False
    assert np.abs(dense[:, mask]).max() == 0.0


@pytest.mark.parametrize("spec_kind", ["speaker", "hrtf"])
def test_multi_pair_sorted_matches_per_pair(spec_kind):
    """The flattened (pair*length + bin) multi-pair sort equals binning
    each pair's rows alone."""
    from rayverb_tpu.parallel.datagen import _bin_rows_sorted_multi

    spec = speaker_spec() if spec_kind == "speaker" else hrtf_spec()
    nbatch, per = 3, 40
    rng = np.random.default_rng(21)
    mics = jnp.asarray(rng.standard_normal((nbatch, 3)), jnp.float32)
    vol, pos, tim = random_rows(nbatch * per, seed=13)
    pair = jnp.asarray(np.repeat(np.arange(nbatch), per).astype(np.int32))

    hist = _bin_rows_sorted_multi(
        mics[pair], pair, vol, pos, tim, spec, LENGTH, SAMPLE_RATE, nbatch
    )
    assert hist.shape == (nbatch, spec.nchannels, 8, LENGTH)
    for b in range(nbatch):
        sl = slice(b * per, (b + 1) * per)
        h_ref, _, _ = _attenuate_and_bin(
            mics[b], vol[sl], pos[sl], tim[sl], spec, LENGTH, SAMPLE_RATE,
            predelay=None,
        )
        scale = max(float(jnp.max(jnp.abs(h_ref))), 1e-9)
        np.testing.assert_allclose(
            np.asarray(hist[b]) / scale,
            np.asarray(h_ref) / scale,
            atol=2e-6,
        )
