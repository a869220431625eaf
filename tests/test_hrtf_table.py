"""HRTF table generation tests (analyse_hrtf.py pipeline parity)."""

import numpy as np

from rayverb_tpu.hrtf.table import (
    TABLE_SHAPE,
    band_energies,
    decode_ircam_filename,
    default_table,
    interpolate_measurements,
    synthetic_measurements,
    test_table as identifiable_table,
)


def test_test_table_identifiable():
    """Measured grid points carry their own (azimuth, elevation) as the
    first two bands (generate_test_hrtf_data.py:10)."""
    t = identifiable_table()
    assert t.shape == TABLE_SHAPE
    for a, e in [(0, 0), (15, 15), (180, 90), (345, 165), (90, 45)]:
        np.testing.assert_allclose(t[0, a, e, 0], a, atol=1e-4)
        np.testing.assert_allclose(t[0, a, e, 1], e, atol=1e-4)
        assert np.all(t[0, a, e, 2:] == 0)
    # both channels identical in the fixture
    np.testing.assert_allclose(t[0], t[1])


def test_test_table_bilinear_midpoints():
    t = identifiable_table()
    # halfway between measured azimuths: linear in the az band
    np.testing.assert_allclose(t[0, 7, 0, 0], (0 * 8 + 15 * 7) / 15, atol=1e-3)
    np.testing.assert_allclose(t[0, 0, 7, 1], 7.0, atol=1e-3)


def test_interpolation_missing_entries_read_zero():
    """get_entry falls back to zeros for absent measurements
    (analyse_hrtf.py:36-41)."""
    entries = [((0, 0), np.ones(8), np.ones(8))]
    t = interpolate_measurements(entries)
    np.testing.assert_allclose(t[0, 0, 0], 1.0)
    # bracketing defaults reach the (missing) 360/180 corners -> decay to 0
    assert t[0, 180, 90, 0] < 1.0


def test_band_energies_flat_spectrum():
    """A unit impulse has flat |FFT|^2 = 1 -> every band mean is 1."""
    x = np.zeros(512)
    x[0] = 1.0
    e = band_energies(x, 44100.0)
    np.testing.assert_allclose(e, 1.0, atol=1e-9)


def test_synthetic_table_head_shadow():
    """The default table must show interaural level difference: sounds from
    the left (-x, table az 90 when facing +z) are louder in the left ear
    (channel 0) than the right, and vice versa — in the shadowed top bands."""
    t = default_table()
    assert t.shape == TABLE_SHAPE
    assert np.all(t >= 0)
    left_src = t[:, 90, 90]    # arrival from -x
    right_src = t[:, 270, 90]  # arrival from +x
    band = 6  # well inside the head-shadow region
    assert left_src[0, band] > left_src[1, band]
    assert right_src[1, band] > right_src[0, band]
    # symmetry: left ear hearing left == right ear hearing right
    np.testing.assert_allclose(left_src[0], right_src[1], rtol=1e-5)


def test_synthetic_low_bands_nearly_unshadowed():
    t = default_table()
    # band 0 (< 190 Hz) passes around the head almost unattenuated
    ratio = t[0, 90, 90, 0] / t[1, 90, 90, 0]
    assert 1.0 <= ratio < 1.3


def test_decode_ircam_filename():
    r, a, e = decode_ircam_filename("IRC_1002_C_R0195_T030_P045.wav")
    assert (r, a, e) == (195, 30, 45)
    try:
        decode_ircam_filename("bogus.wav")
        assert False
    except ValueError:
        pass


def test_analyze_hrir_directory(tmp_path):
    """End-to-end: write synthetic IRCAM-named stereo WAVs, analyse them,
    check the measured gains land in the table."""
    from rayverb_tpu.io.audio import write_wav

    # impulse pairs with channel gains distinguishing az positions
    for az, gain in ((0, 0.5), (90, 0.25)):
        x = np.zeros((2, 256))
        x[0, 0] = gain
        x[1, 0] = gain / 2
        write_wav(
            str(tmp_path / f"IRC_1_C_R0195_T{az:03d}_P000.wav"),
            x,
            44100.0,
            16,
        )
    from rayverb_tpu.hrtf.table import analyze_hrir_directory

    table = analyze_hrir_directory(str(tmp_path))
    assert table.shape == TABLE_SHAPE
    # elevation 0 maps to table e = 90 (analyse_hrtf.py:129)
    got = table[0, 0, 90, 0]
    np.testing.assert_allclose(got, 0.5**2, rtol=0.05)
    got90 = table[0, 90, 90, 0]
    np.testing.assert_allclose(got90, 0.25**2, rtol=0.05)
