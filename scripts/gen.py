#!/usr/bin/env python
"""Batch demo-corpus renderer: the reference's demo/gen.sh as a Python
driver over the new CLI.

Renders the same (config, model, material) combinations into
impulses/<model>/<model>_<config>_<material>.<ext>. The combination table
below is data extracted from demo/gen.sh:21-199.

Usage:
  python scripts/gen.py [--outdir impulses] [--ext wav] [--limit N]
      [--only MODEL] [--pipeline fused|modular] [--dry-run]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMBOS = [
    ('hrtf_vault', 'random_pillars', 'mat'),
    ('hrtf_vault_l', 'random_pillars', 'mat'),
    ('hrtf_vault_r', 'random_pillars', 'mat'),
    ('oct', 'random_pillars', 'mat'),
    ('near_c', 'echo_tunnel', 'mat'),
    ('far', 'echo_tunnel', 'mat'),
    ('bedroom', 'bedroom', 'mat'),
    ('near_c', 'small_square', 'mat'),
    ('near_c', 'large_pentagon', 'mat'),
    ('far', 'large_pentagon', 'mat'),
    ('vault', 'vault', 'vault'),
    ('vault_l', 'vault', 'vault'),
    ('vault_r', 'vault', 'vault'),
    ('hrtf_vault', 'vault', 'vault'),
    ('hrtf_vault_l', 'vault', 'vault'),
    ('hrtf_vault_r', 'vault', 'vault'),
    ('near_c', 'bedroom', 'mat'),
    ('near_l', 'bedroom', 'mat'),
    ('near_r', 'bedroom', 'mat'),
    ('near_c', 'random_pillars', 'mat'),
    ('near_l', 'random_pillars', 'mat'),
    ('near_r', 'random_pillars', 'mat'),
    ('medium', 'random_pillars', 'mat'),
    ('far_2', 'random_pillars', 'mat'),
    ('near_c', 'small_triangle', 'mat'),
    ('near_l', 'small_triangle', 'mat'),
    ('near_r', 'small_triangle', 'mat'),
    ('near_l', 'small_square', 'mat'),
    ('near_r', 'small_square', 'mat'),
    ('near_c', 'small_pentagon', 'mat'),
    ('near_l', 'small_pentagon', 'mat'),
    ('near_r', 'small_pentagon', 'mat'),
    ('near_c', 'small_heptagon', 'mat'),
    ('near_l', 'small_heptagon', 'mat'),
    ('near_r', 'small_heptagon', 'mat'),
    ('near_c', 'medium_triangle', 'mat'),
    ('near_l', 'medium_triangle', 'mat'),
    ('near_r', 'medium_triangle', 'mat'),
    ('near_c', 'medium_square', 'mat'),
    ('near_l', 'medium_square', 'mat'),
    ('near_r', 'medium_square', 'mat'),
    ('near_c', 'medium_pentagon', 'mat'),
    ('near_l', 'medium_pentagon', 'mat'),
    ('near_r', 'medium_pentagon', 'mat'),
    ('near_c', 'medium_heptagon', 'mat'),
    ('near_l', 'medium_heptagon', 'mat'),
    ('near_r', 'medium_heptagon', 'mat'),
    ('near_c', 'large_triangle', 'mat'),
    ('near_l', 'large_triangle', 'mat'),
    ('near_r', 'large_triangle', 'mat'),
    ('near_c', 'large_square', 'mat'),
    ('near_l', 'large_square', 'mat'),
    ('near_r', 'large_square', 'mat'),
    ('near_l', 'large_pentagon', 'mat'),
    ('near_r', 'large_pentagon', 'mat'),
    ('near_c', 'large_heptagon', 'mat'),
    ('near_l', 'large_heptagon', 'mat'),
    ('near_r', 'large_heptagon', 'mat'),
    ('medium', 'medium_triangle', 'mat'),
    ('medium', 'medium_square', 'mat'),
    ('medium', 'medium_pentagon', 'mat'),
    ('medium', 'medium_heptagon', 'mat'),
    ('medium', 'large_triangle', 'mat'),
    ('medium', 'large_square', 'mat'),
    ('medium', 'large_pentagon', 'mat'),
    ('medium', 'large_heptagon', 'mat'),
    ('far', 'large_triangle', 'mat'),
    ('far', 'large_square', 'mat'),
    ('far', 'large_heptagon', 'mat'),
    ('near_c', 'small_triangle', 'damped'),
    ('near_l', 'small_triangle', 'damped'),
    ('near_r', 'small_triangle', 'damped'),
    ('near_c', 'small_square', 'damped'),
    ('near_l', 'small_square', 'damped'),
    ('near_r', 'small_square', 'damped'),
    ('near_c', 'small_pentagon', 'damped'),
    ('near_l', 'small_pentagon', 'damped'),
    ('near_r', 'small_pentagon', 'damped'),
    ('near_c', 'small_heptagon', 'damped'),
    ('near_l', 'small_heptagon', 'damped'),
    ('near_r', 'small_heptagon', 'damped'),
    ('near_c', 'medium_triangle', 'damped'),
    ('near_l', 'medium_triangle', 'damped'),
    ('near_r', 'medium_triangle', 'damped'),
    ('near_c', 'medium_square', 'damped'),
    ('near_l', 'medium_square', 'damped'),
    ('near_r', 'medium_square', 'damped'),
    ('near_c', 'medium_pentagon', 'damped'),
    ('near_l', 'medium_pentagon', 'damped'),
    ('near_r', 'medium_pentagon', 'damped'),
    ('near_c', 'medium_heptagon', 'damped'),
    ('near_l', 'medium_heptagon', 'damped'),
    ('near_r', 'medium_heptagon', 'damped'),
    ('near_c', 'large_triangle', 'damped'),
    ('near_l', 'large_triangle', 'damped'),
    ('near_r', 'large_triangle', 'damped'),
    ('near_c', 'large_square', 'damped'),
    ('near_l', 'large_square', 'damped'),
    ('near_r', 'large_square', 'damped'),
    ('near_c', 'large_pentagon', 'damped'),
    ('near_l', 'large_pentagon', 'damped'),
    ('near_r', 'large_pentagon', 'damped'),
    ('near_c', 'large_heptagon', 'damped'),
    ('near_l', 'large_heptagon', 'damped'),
    ('near_r', 'large_heptagon', 'damped'),
    ('medium', 'medium_triangle', 'damped'),
    ('medium', 'medium_square', 'damped'),
    ('medium', 'medium_pentagon', 'damped'),
    ('medium', 'medium_heptagon', 'damped'),
    ('medium', 'large_triangle', 'damped'),
    ('medium', 'large_square', 'damped'),
    ('medium', 'large_pentagon', 'damped'),
    ('medium', 'large_heptagon', 'damped'),
    ('far', 'large_triangle', 'damped'),
    ('far', 'large_square', 'damped'),
    ('far', 'large_pentagon', 'damped'),
    ('far', 'large_heptagon', 'damped'),
    ('near_c', 'small_triangle', 'bright'),
    ('near_c', 'small_square', 'bright'),
    ('near_c', 'small_pentagon', 'bright'),
    ('near_c', 'small_heptagon', 'bright'),
    ('near_c', 'medium_triangle', 'bright'),
    ('near_c', 'medium_square', 'bright'),
    ('near_c', 'medium_pentagon', 'bright'),
    ('near_c', 'medium_heptagon', 'bright'),
    ('near_c', 'large_triangle', 'bright'),
    ('near_c', 'large_square', 'bright'),
    ('near_c', 'large_pentagon', 'bright'),
    ('near_c', 'large_heptagon', 'bright'),
    ('medium', 'medium_triangle', 'bright'),
    ('medium', 'medium_square', 'bright'),
    ('medium', 'medium_pentagon', 'bright'),
    ('medium', 'medium_heptagon', 'bright'),
    ('medium', 'large_triangle', 'bright'),
    ('medium', 'large_square', 'bright'),
    ('medium', 'large_pentagon', 'bright'),
    ('medium', 'large_heptagon', 'bright'),
    ('far', 'large_triangle', 'bright'),
    ('far', 'large_square', 'bright'),
    ('far', 'large_pentagon', 'bright'),
    ('far', 'large_heptagon', 'bright'),
    ('near_c', 'small_triangle', 'brighter'),
    ('near_c', 'small_square', 'brighter'),
    ('near_c', 'small_pentagon', 'brighter'),
    ('near_c', 'small_heptagon', 'brighter'),
    ('near_c', 'medium_triangle', 'brighter'),
    ('near_c', 'medium_square', 'brighter'),
    ('near_c', 'medium_pentagon', 'brighter'),
    ('near_c', 'medium_heptagon', 'brighter'),
    ('near_c', 'large_triangle', 'brighter'),
    ('near_c', 'large_square', 'brighter'),
    ('near_c', 'large_pentagon', 'brighter'),
    ('near_c', 'large_heptagon', 'brighter'),
    ('medium', 'medium_triangle', 'brighter'),
    ('medium', 'medium_square', 'brighter'),
    ('medium', 'medium_pentagon', 'brighter'),
    ('medium', 'medium_heptagon', 'brighter'),
    ('medium', 'large_triangle', 'brighter'),
    ('medium', 'large_square', 'brighter'),
    ('medium', 'large_pentagon', 'brighter'),
    ('medium', 'large_heptagon', 'brighter'),
    ('far', 'large_triangle', 'brighter'),
    ('far', 'large_square', 'brighter'),
    ('far', 'large_pentagon', 'brighter'),
    ('far', 'large_heptagon', 'brighter'),
]


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--outdir", default="impulses")
    parser.add_argument("--ext", default="wav", choices=("wav", "aif", "aiff"))
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--only", default=None, help="filter by model name")
    parser.add_argument("--pipeline", default="fused", choices=("fused", "modular"))
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--dry-run", action="store_true")
    parser.add_argument(
        "--subprocess", action="store_true",
        help="one CLI subprocess per render (the reference's gen.sh model; "
        "isolates wedged remote compiles at the cost of ~full JAX startup "
        "per render). Default is in-process: one JAX runtime, every "
        "compile shared via the persistent cache.",
    )
    parser.add_argument(
        "--per-render-timeout", type=int, default=1800,
        help="seconds before a render subprocess is killed and retried "
        "once (the tunneled TPU's remote compiler occasionally wedges; "
        "--subprocess mode only)",
    )
    args = parser.parse_args(argv)

    todo = [c for c in COMBOS if args.only is None or c[1] == args.only]
    if args.limit:
        todo = todo[: args.limit]

    failures = 0
    failed_combos = []
    t_start = time.time()
    walls = []
    for i, (config, model, material) in enumerate(todo):
        out_dir = os.path.join(args.outdir, model)
        os.makedirs(out_dir, exist_ok=True)
        out = os.path.join(out_dir, f"{model}_{config}_{material}.{args.ext}")
        cli_args = [
            os.path.join(REPO, "assets", "configs", f"{config}.json"),
            os.path.join(REPO, "assets", "test_models", f"{model}.obj"),
            os.path.join(REPO, "assets", "materials", f"{material}.json"),
            out,
            "--pipeline", args.pipeline,
            "--seed", str(args.seed + i),
        ]
        print(f"[{i + 1}/{len(todo)}] {model} x {config} x {material}", flush=True)
        if args.dry_run:
            continue
        t_render = time.time()
        if args.subprocess:
            import subprocess

            rc = None
            for attempt in (1, 2):
                try:
                    rc = subprocess.run(
                        [sys.executable, "-m", "rayverb_tpu.cli"] + cli_args,
                        cwd=REPO,
                        timeout=args.per_render_timeout,
                    ).returncode
                except subprocess.TimeoutExpired:
                    rc = -1
                    print(
                        f"  attempt {attempt} timed out after "
                        f"{args.per_render_timeout}s",
                        file=sys.stderr, flush=True,
                    )
                if rc == 0:
                    break
        else:
            # in-process: shapes are compile-key-quantised (histogram
            # length and triangle-block counts round to powers of two),
            # so the whole corpus shares a handful of compiled programs
            sys.path.insert(0, REPO)
            from rayverb_tpu.cli import main as cli_main

            try:
                rc = cli_main(cli_args)
            except SystemExit as e:  # argparse rejects (bad combo args)
                rc = e.code if isinstance(e.code, int) else 1
                print(f"  exit: {e.code}", file=sys.stderr, flush=True)
            except Exception as e:  # noqa: BLE001 - per-render isolation
                print(f"  exception: {e}", file=sys.stderr, flush=True)
                rc = 1
        walls.append(round(time.time() - t_render, 2))
        if rc != 0:
            failures += 1
            failed_combos.append(f"{model}_{config}_{material}")
            print(f"  FAILED (rc={rc})", file=sys.stderr)
    wall = time.time() - t_start
    print(f"done: {len(todo) - failures}/{len(todo)} rendered in {wall:.0f}s")
    if not args.dry_run:
        import json

        report = {
            "rendered": len(todo) - failures,
            "failures": failures,
            "failed_combos": failed_combos,
            "total": len(todo),
            "wall_seconds": round(wall, 1),
            "per_render_seconds": walls,
            "pipeline": args.pipeline,
            "mode": "subprocess" if args.subprocess else "in-process",
            "ext": args.ext,
        }
        os.makedirs(args.outdir, exist_ok=True)
        with open(os.path.join(args.outdir, "report.json"), "w") as fh:
            json.dump(report, fh, indent=1)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
