#!/usr/bin/env python
"""Batched IR datagen throughput: BASELINE.json config 5 — vmap over 64
source/receiver pairs in one jit on the current backend.

Usage: python scripts/bench_datagen.py [--pairs 64] [--rays 4096]
       [--reflections 16] [--model vault]
Prints one JSON line with pairs/s and ray-bounces/s.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--reflections", type=int, default=16)
    ap.add_argument("--model", default="vault")
    ap.add_argument("--materials", default="vault")
    ap.add_argument(
        "--microbatch", type=int, default=16,
        help="vmapped sub-batch size under one lax.map (memory bound)",
    )
    ap.add_argument(
        "--cpu", action="store_true", help="force the JAX CPU backend (smoke)"
    )
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, REPO)
    import numpy as np

    from rayverb_tpu import load_scene
    from rayverb_tpu.config.schema import parse_config
    from rayverb_tpu.parallel.datagen import render_irs_batched
    from rayverb_tpu.utils.directions import random_directions

    scene = load_scene(
        os.path.join(REPO, "assets/test_models", args.model + ".obj"),
        os.path.join(REPO, "assets/materials", args.materials + ".json"),
    )
    cfg = parse_config(
        json.dumps(
            {
                "rays": args.rays,
                "reflections": args.reflections,
                "sample_rate": 16000,
                "bit_depth": 16,
                "source_position": [0, 0, 0],  # overridden per pair
                "mic_position": [0, 0, 0],
                "attenuation_model": {
                    "hrtf": {"facing": [0, 0, 1], "up": [0, 1, 0]}
                },
                "trim_tail": False,
            }
        )
    )

    b = args.pairs
    rng = np.random.default_rng(17)
    lo, hi = np.asarray(scene.bounds)
    span = hi - lo
    sources = (lo + span * (0.2 + 0.6 * rng.random((b, 3)))).astype(np.float32)
    mics = (lo + span * (0.2 + 0.6 * rng.random((b, 3)))).astype(np.float32)
    dirs = np.stack(
        [random_directions(args.rays, seed=100 + i) for i in range(b)]
    )

    # warm-up compile
    irs, contents = render_irs_batched(
        scene, cfg, sources, mics, dirs, microbatch=args.microbatch
    )
    np.asarray(irs)

    t0 = time.perf_counter()
    irs, contents = render_irs_batched(
        scene, cfg, sources, mics, dirs, microbatch=args.microbatch
    )
    np.asarray(irs)
    wall = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": (
                    f"batched datagen: {b} source/receiver pairs x "
                    f"{args.rays} rays x {args.reflections} refl "
                    f"({args.model}), steady-state"
                ),
                "pairs_per_s": round(b / wall, 2),
                "ray_bounces_per_s": round(
                    b * args.rays * args.reflections / wall, 1
                ),
                "wall_s": round(wall, 3),
                "ir_shape": list(np.asarray(irs).shape),
            }
        )
    )


if __name__ == "__main__":
    main()
