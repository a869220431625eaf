"""WAV/AIFF writer round-trip tests."""

import numpy as np
import pytest

from rayverb_tpu.io.audio import (
    AudioFormatError,
    read_audio,
    write_audio,
)


@pytest.mark.parametrize("ext", ["wav", "aif", "aiff"])
@pytest.mark.parametrize("bits", [16, 24])
def test_roundtrip(tmp_path, rng, ext, bits):
    x = (rng.normal(size=(2, 500)) * 0.5).clip(-0.99, 0.99).astype(np.float32)
    path = str(tmp_path / f"out.{ext}")
    write_audio(path, x, 44100.0, bits)
    y, sr, b = read_audio(path)
    assert sr == 44100.0
    assert b == bits
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=2.0 ** -(bits - 2))


def test_mono(tmp_path):
    x = np.linspace(-0.9, 0.9, 100, dtype=np.float32)[None, :]
    path = str(tmp_path / "m.wav")
    write_audio(path, x, 8000.0, 16)
    y, sr, _ = read_audio(path)
    assert y.shape == (1, 100)
    assert sr == 8000.0


def test_clipping(tmp_path):
    x = np.array([[2.0, -2.0, 0.0]], np.float32)
    path = str(tmp_path / "c.wav")
    write_audio(path, x, 8000.0, 16)
    y, _, _ = read_audio(path)
    np.testing.assert_allclose(y[0, 0], (2**15 - 1) / 2**15, atol=1e-6)
    np.testing.assert_allclose(y[0, 1], -1.0, atol=1e-6)


def test_invalid_formats(tmp_path):
    x = np.zeros((1, 4), np.float32)
    with pytest.raises(AudioFormatError):
        write_audio(str(tmp_path / "x.mp3"), x, 8000.0, 16)
    with pytest.raises(AudioFormatError):
        write_audio(str(tmp_path / "x.wav"), x, 8000.0, 8)
