#!/usr/bin/env python
"""Backend health probe: one cached vault steady render, prints the wall.

The tunneled TPU backend intermittently degrades 5-60x on unchanged
cached programs (docs/perf.md measurement-hygiene note). Before trusting
any wall-clock measurement, run this; a healthy chip renders the vault
in ~2.6-3 s steady. Exit code 0 = healthy (wall below --threshold),
1 = degraded.
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=5.0)
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()
    if args.runs < 1:
        ap.error("--runs must be >= 1")

    from rayverb_tpu import load_config, load_scene
    from rayverb_tpu.ops.render import render_fused
    from rayverb_tpu.utils.directions import random_directions

    cfg = load_config(os.path.join(REPO, "assets/configs/vault.json"))
    scene = load_scene(
        os.path.join(REPO, "assets/test_models/vault.obj"),
        os.path.join(REPO, "assets/materials/vault.json"),
    )
    dirs = random_directions(cfg.rays, seed=1234)
    render_fused(scene, cfg, dirs, ray_chunk=4096)  # warm (cached compile)
    wall = float("inf")
    for _ in range(args.runs):
        t0 = time.perf_counter()
        render_fused(scene, cfg, dirs, ray_chunk=4096)
        wall = min(wall, time.perf_counter() - t0)
    healthy = wall < args.threshold
    print(
        f"vault steady {wall:.2f}s -> {'HEALTHY' if healthy else 'DEGRADED'}"
    )
    sys.exit(0 if healthy else 1)


if __name__ == "__main__":
    main()
