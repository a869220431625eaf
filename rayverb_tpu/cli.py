"""The `parallel_raytrace` command-line interface.

Same four-positional surface as the reference binary
(cmd/main.cpp:104-137):

    parallel_raytrace <config.json> <model> <materials.json> <out.{wav,aif[f]}>

plus framework extensions behind flags (deterministic seeding, path dumps,
filter method selection). Errors mirror the reference: message to stderr,
exit code 1.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="parallel_raytrace",
        description="Physically-modelled impulse-response renderer (TPU-native rayverb).",
    )
    p.add_argument("config", help="render configuration (.json)")
    p.add_argument("model", help="3D model file (.obj)")
    p.add_argument("materials", help="material definitions (.json)")
    p.add_argument("output", help="output audio file (.wav/.aif/.aiff)")
    p.add_argument("--seed", type=int, default=None,
                   help="PRNG seed for ray directions (default: from config, else 0)")
    p.add_argument("--dump-paths", metavar="FILE", default=None,
                   help="write per-ray reflection paths as JSONL (the reference's "
                        "DIAGNOSTIC impulse.dump, always available here)")
    p.add_argument("--filter-method", choices=("scan", "fft"), default="scan",
                   help="IIR filters as exact sequential scans or the FFT fast "
                        "path (modular pipeline only)")
    p.add_argument("--trace-impl", choices=("auto", "xla", "pallas"), default="auto")
    p.add_argument("--pipeline", choices=("fused", "modular"), default="fused",
                   help="fused: whole render on-device in two programs (fast "
                        "path); modular: reference-stage-structured pipeline "
                        "(exact scan filters, raw impulse access)")
    p.add_argument("--stats", action="store_true",
                   help="print phase timings and throughput to stderr")
    p.add_argument("--save-raw", metavar="FILE.npz", default=None,
                   help="persist raw impulses so post-processing can be "
                        "re-run without re-tracing (implies modular pipeline)")
    p.add_argument("--from-raw", metavar="FILE.npz", default=None,
                   help="skip the trace and post-process impulses saved "
                        "with --save-raw")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from .config.schema import ConfigError, load_config
    from .io.audio import (
        SUPPORTED_BIT_DEPTHS,
        SUPPORTED_EXTENSIONS,
        write_audio,
    )
    from .scene.compile import load_scene
    from .utils.directions import random_directions

    # input existence prechecks (cmd/main.cpp:119-127)
    for path in (args.config, args.model, args.materials):
        if not os.path.isfile(path):
            print(f"input file {path} does not exist", file=sys.stderr)
            return 1
    out_dir = os.path.dirname(os.path.abspath(args.output))
    if not os.path.isdir(out_dir) or not os.access(out_dir, os.W_OK):
        print(f"output file {args.output} cannot be written", file=sys.stderr)
        return 1

    try:
        config = load_config(args.config)
    except ConfigError as e:
        print("encountered error reading config file:", file=sys.stderr)
        print(e, file=sys.stderr)
        return 1

    # format prechecks (cmd/main.cpp:209-239)
    if config.bit_depth not in SUPPORTED_BIT_DEPTHS:
        print(
            "Invalid bitdepth - valid bitdepths are: "
            + " ".join(str(b) for b in SUPPORTED_BIT_DEPTHS),
            file=sys.stderr,
        )
        return 1
    ext = os.path.splitext(args.output)[1].lstrip(".").lower()
    if ext not in SUPPORTED_EXTENSIONS:
        print(
            "Invalid output file extension - valid extensions are: "
            + " ".join(SUPPORTED_EXTENSIONS),
            file=sys.stderr,
        )
        return 1

    try:
        import time as _time

        t0 = _time.perf_counter()
        scene = load_scene(args.model, args.materials, verbose=config.verbose)
        t1 = _time.perf_counter()

        seed = args.seed if args.seed is not None else config.seed
        directions = random_directions(config.rays, seed=seed)

        use_fused = (
            args.pipeline == "fused"
            and not args.dump_paths
            and not args.save_raw
            and not args.from_raw
        )
        if args.from_raw:
            from .engine import load_raw
            from .pipeline import render_from_raw

            result = render_from_raw(
                config, load_raw(args.from_raw), filter_method=args.filter_method
            )
            channels = result.channels
        elif use_fused:
            from .ops.render import render_fused

            channels, _info = render_fused(
                scene, config, directions, impl=args.trace_impl,
                stats=args.stats,
            )
        else:
            from .pipeline import render

            result = render(
                config,
                scene,
                directions=directions,
                filter_method=args.filter_method,
                trace_impl=args.trace_impl,
            )
            channels = result.channels
        t2 = _time.perf_counter()

        if args.dump_paths and not use_fused and result.raytracer is not None:
            from .utils.diagnostics import dump_paths

            dump_paths(
                args.dump_paths,
                config.rays,
                config.reflections,
                result.raytracer.outputs,
            )

        if args.save_raw and not args.from_raw:
            from .engine import save_raw

            save_raw(args.save_raw, result.raw)

        write_audio(
            args.output, channels, config.sample_rate, config.bit_depth
        )
        t3 = _time.perf_counter()

        if args.stats:
            bounces = config.rays * config.reflections
            print(
                f"scene load: {t1 - t0:.3f}s  render: {t2 - t1:.3f}s  "
                f"write: {t3 - t2:.3f}s  "
                f"({bounces / max(t2 - t1, 1e-9) / 1e6:.2f} M ray-bounces/s)",
                file=sys.stderr,
            )
            if use_fused and "timings" in _info:
                tm = _info["timings"]
                phases = "  ".join(
                    f"{k}: {v:.3f}s" for k, v in tm.items() if k != "total"
                )
                print(
                    f"phases [{phases}]  "
                    f"pair-tests: {_info['pair_tests_issued']:.3g} issued, "
                    f"{_info['pair_tests_per_s'] / 1e9:.2f} G/s",
                    file=sys.stderr,
                )
    except (ValueError, RuntimeError, OSError) as e:
        print("encountered runtime error:", file=sys.stderr)
        print(e, file=sys.stderr)
        return 1

    return 0


if __name__ == "__main__":
    sys.exit(main())
