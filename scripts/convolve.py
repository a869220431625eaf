#!/usr/bin/env python
"""Listening demo: convolve a dry sample with a rendered impulse response.

The reference ships a Max/MSP convolver patch for auditioning IRs
(reference examples/test_convolver.maxpat); this is the library-native
equivalent — overlap-free FFT convolution of any dry WAV/AIFF with a
rendered IR, normalised to the dry signal's peak.

Usage:
  python scripts/convolve.py ir.wav dry.wav out.wav [--wet 1.0] [--dry 0.0]
  python scripts/convolve.py ir.wav --click out.wav     # synthetic impulse
  python scripts/convolve.py ir.wav --burst out.wav     # 0.3 s noise burst

Mono dry signals fan out to the IR's channel count; channel counts
otherwise match pairwise.
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def synth(kind: str, sample_rate: float):
    import numpy as np

    n = int(0.35 * sample_rate)
    t = np.arange(n) / sample_rate
    if kind == "click":
        sig = np.zeros(n, np.float32)
        sig[0] = 1.0
    else:  # burst: enveloped noise
        rng = np.random.default_rng(5)
        env = np.exp(-t / 0.05)
        sig = (rng.standard_normal(n) * env).astype(np.float32)
        sig /= np.abs(sig).max()
    return sig[None, :]


def convolve(ir, dry):
    """FFT convolution per channel pair: (C, Ti) x (C, Td) -> (C, Ti+Td-1)."""
    import numpy as np

    out_len = ir.shape[1] + dry.shape[1] - 1
    nfft = 1 << (out_len - 1).bit_length()
    spec = np.fft.rfft(ir, n=nfft) * np.fft.rfft(dry, n=nfft)
    return np.fft.irfft(spec, n=nfft)[:, :out_len]


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("ir", help="rendered impulse response (.wav/.aif)")
    parser.add_argument("dry", nargs="?", help="dry sample to convolve")
    parser.add_argument("output", help="output audio file")
    parser.add_argument("--click", action="store_true",
                        help="use a synthetic unit impulse as the dry signal")
    parser.add_argument("--burst", action="store_true",
                        help="use a 0.3 s decaying noise burst")
    parser.add_argument("--wet", type=float, default=1.0)
    parser.add_argument("--dry-gain", type=float, default=0.0)
    parser.add_argument("--bit-depth", type=int, default=16)
    args = parser.parse_args(argv)

    import numpy as np

    sys.path.insert(0, REPO)
    from rayverb_tpu.io.audio import read_audio, write_audio

    ir, ir_sr, _ = read_audio(args.ir)
    ir = np.atleast_2d(np.asarray(ir, np.float64))

    if args.click or args.burst:
        dry = synth("click" if args.click else "burst", ir_sr).astype(
            np.float64
        )
        dry_sr = ir_sr
    else:
        if args.dry is None:
            parser.error("provide a dry sample or --click/--burst")
        dry, dry_sr, _ = read_audio(args.dry)
        dry = np.atleast_2d(np.asarray(dry, np.float64))
    if abs(dry_sr - ir_sr) > 1e-6:
        print(
            f"warning: sample-rate mismatch (ir {ir_sr}, dry {dry_sr}); "
            "output uses the IR's rate",
            file=sys.stderr,
        )

    c = max(ir.shape[0], dry.shape[0])
    if ir.shape[0] == 1:
        ir = np.repeat(ir, c, axis=0)
    if dry.shape[0] == 1:
        dry = np.repeat(dry, c, axis=0)
    if ir.shape[0] != dry.shape[0]:
        parser.error(
            f"channel mismatch: ir {ir.shape[0]} vs dry {dry.shape[0]}"
        )

    wet = convolve(ir, dry)
    peak = np.abs(wet).max()
    if peak > 0:
        wet = wet / peak * np.abs(dry).max()
    out = args.wet * wet
    if args.dry_gain:
        padded = np.zeros_like(out)
        padded[:, : dry.shape[1]] = dry
        out = out + args.dry_gain * padded
    out = np.clip(out, -1.0, 1.0)

    write_audio(args.output, out.astype(np.float32), ir_sr, args.bit_depth)
    print(
        f"wrote {args.output}: {out.shape[0]} ch x {out.shape[1]} samples "
        f"@ {ir_sr:g} Hz"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
