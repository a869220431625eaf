"""flattenImpulses tests (the reference had none — SURVEY.md §4 gap)."""

import numpy as np

from rayverb_tpu.ops.histogram import flatten_channels, flatten_impulses, max_sample


def test_basic_scatter():
    vol = np.array([[1.0] * 8, [2.0] * 8], np.float32)
    t = np.array([0.0, 0.001], np.float32)  # 44.1 samples -> idx 44
    out = np.asarray(flatten_impulses(vol, t, 44100.0, length=50))
    assert out.shape == (8, 50)
    assert out[0, 0] == 1.0
    assert out[0, 44] == 2.0
    assert out.sum() == 8 * 3.0


def test_same_bin_accumulates():
    vol = np.ones((3, 8), np.float32)
    t = np.zeros(3, np.float32)
    out = np.asarray(flatten_impulses(vol, t, 44100.0, length=4))
    assert out[0, 0] == 3.0


def test_round_half_away_from_zero():
    """C round(2.5) = 3 (away from zero), unlike numpy's round-half-even
    (rayverb.cpp:69)."""
    sr = 1000.0
    t = np.array([0.0025], np.float32)  # t*sr = 2.5
    vol = np.ones((1, 8), np.float32)
    out = np.asarray(flatten_impulses(vol, t, sr, length=5))
    assert out[0, 3] == 1.0
    assert out[0, 2] == 0.0


def test_max_sample():
    assert max_sample(np.array([0.0, 0.1]), 44100.0) == 4410 + 1
    assert max_sample(np.zeros(0), 44100.0) == 1


def test_channels_share_length():
    vol = np.ones((2, 1, 8), np.float32)
    t = np.array([[0.01], [0.02]], np.float32)
    out = np.asarray(flatten_channels(vol, t, 1000.0))
    assert out.shape == (2, 8, 21)
    assert out[0, 0, 10] == 1.0
    assert out[1, 0, 20] == 1.0


def test_out_of_range_dropped():
    vol = np.ones((1, 8), np.float32)
    t = np.array([10.0], np.float32)
    out = np.asarray(flatten_impulses(vol, t, 44100.0, length=8))
    assert out.sum() == 0.0
