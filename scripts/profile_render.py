#!/usr/bin/env python
"""Device-trace profile of the north-star render, op-by-op.

Runs one compile pass + one steady render under jax.profiler.trace, then
parses the captured xplane via jax.profiler.ProfileData and aggregates
device time into the categories that matter for the r4+ wall accounting:

  kernel   — the Mosaic-compiled closest-hit sweep programs
  scatter  — histogram binning scatter-adds
  sort     — argsorts / lax.sort (resort keys, shadow order, dedup)
  fft      — finalize filter bank
  fusion   — everything else XLA fused (row building, permutes, glue)

Usage:
    python scripts/profile_render.py --rays 1000000 [--vault]

Prints one JSON line; keep the raw trace dir for manual digging.
"""

import argparse
import collections
import dataclasses
import glob
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def categorize(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "mosaic" in n or "tpu_custom_call" in n:
        return "kernel"
    if "scatter" in n:
        return "scatter"
    if "sort" in n:
        return "sort"
    if "fft" in n:
        return "fft"
    if "dynamic-update" in n or "dynamic_update" in n:
        return "dus"
    if "copy" in n or "transpose" in n:
        return "copy"
    if "while" in n:
        return "while_glue"
    if "fusion" in n:
        return "fusion"
    return "other"


def parse_trace(tdir):
    from jax.profiler import ProfileData

    files = glob.glob(
        os.path.join(tdir, "**", "*.xplane.pb"), recursive=True
    )
    if not files:
        return None
    files.sort(key=os.path.getmtime)
    data = ProfileData.from_file(files[-1])
    cat = collections.Counter()
    ops = collections.Counter()
    nev = collections.Counter()
    modules = collections.Counter()
    for plane in data.planes:
        pname = plane.name.lower()
        if "tpu" not in pname and "device" not in pname:
            continue
        if "host" in pname:
            continue
        for line in plane.lines:
            lname = line.name.lower()
            if "module" in lname:
                for ev in line.events:
                    modules[ev.name.split("(")[0]] += ev.duration_ns / 1e9
                continue
            # only XLA op lines (skip step lines / scopes)
            if "xla ops" not in lname and "ops" != lname:
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e9
                c = categorize(ev.name)
                cat[c] += dur
                key = ev.name if len(ev.name) < 80 else ev.name[:80]
                ops[(c, key)] += dur
                nev[(c, key)] += 1
    top = sorted(ops.items(), key=lambda kv: -kv[1])[:25]
    return {
        "categories_s": {k: round(v, 3) for k, v in cat.most_common()},
        "total_device_s": round(sum(cat.values()), 3),
        "modules_s": {k: round(v, 3) for k, v in modules.most_common(8)},
        "top_ops": [
            {
                "cat": c,
                "op": op,
                "s": round(v, 3),
                "n": nev[(c, op)],
            }
            for (c, op), v in top
        ],
    }


def parse_host_device_alignment(tdir):
    """Host/device timeline alignment from the trace.json export — the
    analysis that root-caused the r4 vault regression (device idle for
    21 s while host-side numpy built filter params). Reports the two
    planes' spans, when the device first ran relative to the host span,
    and the top host-side Python events."""
    import gzip

    files = glob.glob(
        os.path.join(tdir, "**", "*.trace.json.gz"), recursive=True
    )
    if not files:
        return None
    files.sort(key=os.path.getmtime)
    with gzip.open(files[-1]) as f:
        d = json.load(f)
    names = {}
    for e in d.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    host, dev = [], []
    for e in d.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        n = names.get(e["pid"], "")
        (dev if "device" in n.lower() else host).append(e)
    if not host or not dev:
        return None
    h0 = min(e["ts"] for e in host)
    h1 = max(e["ts"] + e.get("dur", 0) for e in host)
    d0 = min(e["ts"] for e in dev)
    d1 = max(e["ts"] + e.get("dur", 0) for e in dev)
    agg = collections.Counter()
    for e in host:
        agg[e["name"][:60]] += e.get("dur", 0) / 1e6
    return {
        "host_span_s": round((h1 - h0) / 1e6, 3),
        "device_span_s": round((d1 - d0) / 1e6, 3),
        "device_rel_start_s": round((d0 - h0) / 1e6, 3),
        "top_host_events_s": {
            k: round(v, 3) for k, v in agg.most_common(8)
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1000000)
    ap.add_argument("--chunk", type=int, default=262144)
    ap.add_argument("--vault", action="store_true")
    ap.add_argument("--keep", action="store_true", help="keep trace dir")
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()

    import bench
    import jax

    from rayverb_tpu import load_scene
    from rayverb_tpu.ops.render import render_fused
    from rayverb_tpu.utils.directions import random_directions

    if args.vault:
        from rayverb_tpu.config.schema import load_config

        cfg = load_config(os.path.join(REPO, "assets/configs/vault.json"))
        scene = load_scene(
            os.path.join(REPO, "assets/test_models/vault.obj"),
            os.path.join(REPO, "assets/materials/vault.json"),
        )
        chunk = 4096
    else:
        cfg = dataclasses.replace(bench._north_star_config(), rays=args.rays)
        scene = load_scene(
            bench._hall_path(), os.path.join(REPO, "assets/materials/mat.json")
        )
        chunk = args.chunk
    dirs = random_directions(cfg.rays, seed=1234)

    t0 = time.perf_counter()
    render_fused(scene, cfg, dirs, ray_chunk=chunk, stats=True)
    compile_wall = time.perf_counter() - t0

    tdir = args.outdir or tempfile.mkdtemp(prefix="rayverb_prof_")
    with jax.profiler.trace(tdir):
        t0 = time.perf_counter()
        _, info = render_fused(scene, cfg, dirs, ray_chunk=chunk, stats=True)
        wall = time.perf_counter() - t0

    parsed = parse_trace(tdir)
    out = {
        "rays": cfg.rays,
        "compile_wall_s": round(compile_wall, 2),
        "wall_s": round(wall, 3),
        "timings": {k: round(v, 3) for k, v in info["timings"].items()},
        "trace_dir": tdir,
        "profile": parsed,
        "alignment": parse_host_device_alignment(tdir),
    }
    print(json.dumps(out))
    if not args.keep and args.outdir is None:
        import shutil

        shutil.rmtree(tdir, ignore_errors=True)


if __name__ == "__main__":
    main()
