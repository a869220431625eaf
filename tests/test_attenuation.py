"""Speaker attenuation property tests — the port of the reference's
attenuation_tests.h, plus HRTF lookup tests from hrtf_tests.cpp using the
identifiable synthetic table."""

import numpy as np
import pytest

from rayverb_tpu.config.schema import Speaker
from rayverb_tpu.ops.attenuate import (
    hrtf_attenuate,
    speaker_attenuate,
    speaker_attenuate_all,
)

MIC = np.zeros(3, np.float32)

# 6 cardinal impulses (attenuation_tests.h:20-29)
POSITIONS = np.array(
    [
        [-10, 0, 0],
        [10, 0, 0],
        [0, -10, 0],
        [0, 10, 0],
        [0, 0, -10],
        [0, 0, 10],
    ],
    np.float32,
)
VOLUMES = np.ones((6, 8), np.float32)
TIMES = np.linspace(0.1, 0.6, 6).astype(np.float32)


def run_speaker(shape):
    vol, t = speaker_attenuate(MIC, VOLUMES, POSITIONS, TIMES, [0, 0, 1], shape)
    vol = np.asarray(vol)
    # all 8 bands attenuate identically (attenuation_tests.h:40-42)
    for b in range(1, 8):
        np.testing.assert_allclose(vol[:, b], vol[:, 0], atol=1e-6)
    return vol[:, 0], np.asarray(t)


def test_omni():
    """shape 0 -> unity gain everywhere (attenuation_tests.h:67-72)."""
    g, _ = run_speaker(0.0)
    np.testing.assert_allclose(g, 1.0, atol=1e-6)


def test_cardioid():
    """shape 0.5 (attenuation_tests.h:73-82)."""
    g, _ = run_speaker(0.5)
    np.testing.assert_allclose(g[:4], 0.5, atol=1e-6)
    np.testing.assert_allclose(g[4], 0.0, atol=1e-6)
    np.testing.assert_allclose(g[5], 1.0, atol=1e-6)


def test_bidirectional():
    """shape 1 -> figure-8 with negative rear lobe
    (attenuation_tests.h:83-92)."""
    g, _ = run_speaker(1.0)
    np.testing.assert_allclose(g[:4], 0.0, atol=1e-6)
    np.testing.assert_allclose(g[4], -1.0, atol=1e-6)
    np.testing.assert_allclose(g[5], 1.0, atol=1e-6)


def test_times_pass_through():
    """(attenuation_tests.h:94-101)."""
    _, t = run_speaker(0.0)
    np.testing.assert_allclose(t, TIMES, atol=1e-7)


def test_zero_volume_zeroed():
    """Documented deviation: skipped impulses come back as zeros rather
    than uninitialised memory (SURVEY.md §3.3)."""
    vol = VOLUMES.copy()
    vol[2] = 0
    v, t = speaker_attenuate(MIC, vol, POSITIONS, TIMES, [0, 0, 1], 0.0)
    assert np.all(np.asarray(v)[2] == 0)
    assert float(t[2]) == 0.0


def test_multi_speaker_channels():
    speakers = (
        Speaker(direction=np.array([0, 0, 1], np.float32), shape=0.5),
        Speaker(direction=np.array([0, 0, -1], np.float32), shape=0.5),
    )
    vols, times = speaker_attenuate_all(MIC, VOLUMES, POSITIONS, TIMES, speakers)
    assert vols.shape == (2, 6, 8)
    # speaker 2 faces -z: front/back swap relative to speaker 1
    np.testing.assert_allclose(np.asarray(vols)[0, 5, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vols)[1, 5, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vols)[1, 4, 0], 1.0, atol=1e-6)


# ---------------------------------------------------------------------------
# HRTF lookups with the identifiable table (hrtf_tests.cpp:42-85)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def table():
    from rayverb_tpu.hrtf.table import test_table

    return test_table()


CONFIGS = {
    # facing -> impulse-slot : expected (azimuth, elevation) table entry
    (0, 0, 1): {5: (180, 90), 4: (0, 90), 0: (90, 90), 1: (270, 90)},
    (1, 0, 0): {1: (180, 90), 0: (0, 90), 5: (90, 90), 4: (270, 90)},
    (0, 0, -1): {4: (180, 90), 5: (0, 90), 1: (90, 90), 0: (270, 90)},
    (-1, 0, 0): {0: (180, 90), 1: (0, 90), 4: (90, 90), 5: (270, 90)},
}


@pytest.mark.parametrize("facing", list(CONFIGS))
def test_hrtf_lookup(table, facing):
    vols, _ = hrtf_attenuate(
        MIC,
        VOLUMES,
        POSITIONS,
        TIMES,
        np.asarray(facing, np.float32),
        np.asarray([0, 1, 0], np.float32),
        table=table,
    )
    left = np.asarray(vols)[0]
    for slot, (a, e) in CONFIGS[facing].items():
        np.testing.assert_allclose(left[slot], table[0, a, e], atol=1e-4)


def test_hrtf_itd_shift(table):
    """The +z impulse arrives earlier at the nearer (right, +x) ear when
    coming from +x (kernel.cpp:597-623)."""
    pos = np.array([[10, 0, 0]], np.float32)
    vol = np.ones((1, 8), np.float32)
    t = np.array([0.5], np.float32)
    vols, times = hrtf_attenuate(
        MIC, vol, pos, t,
        np.asarray([0, 0, 1], np.float32),
        np.asarray([0, 1, 0], np.float32),
        table=table,
    )
    t_left, t_right = float(times[0, 0]), float(times[1, 0])
    assert t_right < 0.5 < t_left  # +x is the channel-1 ear side
    # shift magnitude bounded by ear offset / c
    assert abs(t_left - 0.5) <= 0.1 / 340.0 + 1e-6


def test_hrtf_elevation_indexing(table):
    """Straight-up impulse maps to e = 0 (90 - 90)."""
    pos = np.array([[0, 10, 0]], np.float32)
    vols, _ = hrtf_attenuate(
        MIC, np.ones((1, 8), np.float32), pos, np.array([0.1], np.float32),
        np.asarray([0, 0, 1], np.float32),
        np.asarray([0, 1, 0], np.float32),
        table=table,
    )
    np.testing.assert_allclose(np.asarray(vols)[0, 0], table[0, 180, 0], atol=1e-4)
