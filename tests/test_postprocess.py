"""Post-processing tests (mixdown/normalize/trim/predelay; the reference
had no unit tests for these — SURVEY.md §4 gap)."""

import numpy as np

from rayverb_tpu.config.schema import FilterType
from rayverb_tpu.ops.postprocess import (
    find_predelay,
    fix_predelay,
    mixdown,
    normalize,
    process,
    trim_tail,
    trim_tail_length,
)


def test_mixdown_sums_bands():
    x = np.arange(2 * 8 * 4, dtype=np.float32).reshape(2, 8, 4)
    out = np.asarray(mixdown(x))
    np.testing.assert_allclose(out, x.sum(axis=1))


def test_normalize_global_peak():
    x = np.array([[0.5, -2.0], [1.0, 0.25]], np.float32)
    out = np.asarray(normalize(x))
    np.testing.assert_allclose(np.abs(out).max(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(out, x / 2.0, rtol=1e-6)
    zero = np.asarray(normalize(np.zeros((2, 4))))
    assert np.all(zero == 0)


def test_trim_tail_reference_off_by_one():
    """trimTail keeps length == index of the last loud sample, dropping the
    sample itself (rayverb.cpp:96-122)."""
    x = np.zeros((1, 10), np.float32)
    x[0, 6] = 0.5
    assert trim_tail_length(x) == 6
    assert trim_tail(x).shape == (1, 6)
    # nothing loud -> empty
    assert trim_tail_length(np.full((1, 5), 1e-9, np.float32)) == 0


def test_trim_tail_max_over_channels():
    x = np.zeros((2, 10), np.float32)
    x[0, 3] = 1.0
    x[1, 8] = 1.0
    assert trim_tail_length(x) == 8


def test_predelay():
    t = np.array([[0.0, 0.5, 0.2], [0.0, 0.9, 0.3]], np.float32)
    pd = find_predelay(t)
    assert pd == np.float32(0.2)
    fixed = np.asarray(fix_predelay(t, pd))
    # times <= predelay clamp to 0 (rayverb.h:86-89)
    np.testing.assert_allclose(fixed[0], [0.0, 0.3, 0.0], atol=1e-6)
    assert find_predelay(np.zeros(4)) == 0.0


def test_process_pipeline(rng):
    bands = (rng.normal(size=(2, 8, 500)) * 0.1).astype(np.float32)
    out = process(
        bands,
        44100.0,
        filter_type=FilterType.LINKWITZ_RILEY,
        lo_cutoff=45.0,
        do_normalize=True,
        volume_scale=0.5,
        do_trim_tail=False,
    )
    assert out.shape == (2, 500)
    np.testing.assert_allclose(np.abs(out).max(), 0.5, rtol=1e-5)


def test_process_no_normalize(rng):
    bands = (rng.normal(size=(1, 8, 200)) * 0.01).astype(np.float32)
    out = process(
        bands,
        44100.0,
        filter_type=FilterType.BIQUAD_ONEPASS,
        lo_cutoff=45.0,
        do_normalize=False,
        do_trim_tail=False,
    )
    assert np.abs(out).max() < 0.5
