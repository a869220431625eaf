"""Listening-demo convolver (scripts/convolve.py — the reference's
examples/test_convolver.maxpat equivalent)."""

import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def test_click_convolution_reproduces_ir(tmp_path):
    from rayverb_tpu.io.audio import read_audio, write_audio

    sr = 16000.0
    ir = np.zeros((2, 400), np.float32)
    ir[0, 10] = 0.5
    ir[1, 30] = -0.25
    ir_path = tmp_path / "ir.wav"
    write_audio(str(ir_path), ir, sr, 16)

    out = tmp_path / "wet.wav"
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "convolve.py"),
            str(ir_path),
            "--click",
            str(out),
        ],
        capture_output=True,
        text=True,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root"},
    )
    assert proc.returncode == 0, proc.stderr
    wet, wet_sr, _ = read_audio(str(out))
    assert wet_sr == sr
    # convolving with a unit click reproduces the IR (normalised to the
    # dry peak, which is 1.0; 16-bit quantisation tolerance)
    got = np.asarray(wet)
    assert got.shape[0] == 2
    ref = ir / np.abs(ir).max()
    np.testing.assert_allclose(got[:, :400], ref, atol=2e-3)
