#!/usr/bin/env python
"""Kernel-config probe: steady-state trace_bin + executed-pair counters.

Renders the north-star hall scene at a configurable ray count with
RAYVERB_SWEEP_STATS on and prints one JSON line. All kernel knobs come
from the environment (RAYVERB_RAY_BLOCK, RAYVERB_SWEEP_BLOCK,
RAYVERB_TRI_SUBS, RAYVERB_SORT_KEY, ...), so each variant runs in a fresh
process:

    RAYVERB_RAY_BLOCK=128 python scripts/probe.py --rays 65536

--rays > 65536 exercises the chunked multi-segment path (pass --chunk to
set the per-chunk width, default 262144 as in bench.py).
"""

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

os.environ.setdefault("RAYVERB_SWEEP_STATS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--chunk", type=int, default=262144)
    ap.add_argument("--runs", type=int, default=1, help="steady runs to time")
    ap.add_argument("--no-stats", action="store_true")
    args = ap.parse_args()
    if args.no_stats:
        os.environ.pop("RAYVERB_SWEEP_STATS", None)

    import bench

    cfg = dataclasses.replace(bench._north_star_config(), rays=args.rays)
    from rayverb_tpu import load_scene
    from rayverb_tpu.ops.render import render_fused
    from rayverb_tpu.utils.directions import random_directions

    scene = load_scene(
        bench._hall_path(), os.path.join(REPO, "assets/materials/mat.json")
    )
    dirs = random_directions(cfg.rays, seed=1234)

    t0 = time.perf_counter()
    render_fused(scene, cfg, dirs, ray_chunk=args.chunk, stats=True)
    compile_wall = time.perf_counter() - t0

    best = None
    for _ in range(args.runs):
        t0 = time.perf_counter()
        _, info = render_fused(scene, cfg, dirs, ray_chunk=args.chunk, stats=True)
        wall = time.perf_counter() - t0
        if best is None or wall < best[0]:
            best = (wall, info)
    wall, info = best

    out = {
        "rays": args.rays,
        "env": {
            k: v
            for k, v in os.environ.items()
            if k.startswith("RAYVERB_") and k != "RAYVERB_SWEEP_STATS"
        },
        "compile_wall_s": round(compile_wall, 2),
        "wall_s": round(wall, 3),
        "trace_bin_s": round(info["timings"]["trace_bin"], 3),
        "finalize_s": round(info["timings"].get("finalize", 0.0), 3),
    }
    if "pair_tests_executed" in info:
        out["executed_G"] = {
            k: round(v / 1e9, 1) for k, v in info["pair_tests_executed"].items()
        }
        out["executed_total_G"] = round(
            info["pair_tests_executed_total"] / 1e9, 1
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
