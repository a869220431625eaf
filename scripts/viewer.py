#!/usr/bin/env python
"""Ray-path viewer: plot the trace diagnostics dump over the scene.

Replaces the reference's Processing sketch (viewer/viewer.pde): reads the
same JSONL schema (one array per ray of {"position": [x,y,z], "volume": v})
produced by `parallel_raytrace --dump-paths` and renders the model
wireframe, source/mic markers, and a selection of ray paths coloured by
mean reflection volume. Writes PNG/PDF via matplotlib (headless-safe).

Usage:
  python scripts/viewer.py impulse.dump model.obj config.json out.png \
      [--rays 25] [--elev 20] [--azim -60]
"""

import argparse
import json
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dump", help="JSONL path dump (--dump-paths output)")
    parser.add_argument("model", help="OBJ model the trace ran against")
    parser.add_argument("config", help="render config (for mic/source markers)")
    parser.add_argument("output", help="output image (.png/.pdf/.svg)")
    parser.add_argument("--rays", type=int, default=25,
                        help="number of ray paths to draw (evenly sampled)")
    parser.add_argument("--elev", type=float, default=20.0)
    parser.add_argument("--azim", type=float, default=-60.0)
    args = parser.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from rayverb_tpu import load_config, load_obj

    mesh = load_obj(args.model)
    cfg = load_config(args.config)

    paths = []
    with open(args.dump) as fh:
        for line in fh:
            line = line.strip()
            if line:
                paths.append(json.loads(line))
    if not paths:
        print("dump contains no rays", file=sys.stderr)
        return 1

    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(111, projection="3d")

    # model wireframe
    tris = mesh.vertices[mesh.faces]
    for tri in tris:
        loop = np.vstack([tri, tri[:1]])
        ax.plot(loop[:, 0], loop[:, 2], loop[:, 1],
                color="0.75", linewidth=0.4, alpha=0.6)

    # ray paths, coloured by mean volume (viewer.pde volume->colour idea)
    step = max(1, len(paths) // args.rays)
    cmap = plt.get_cmap("viridis")
    src = np.asarray(cfg.source_position)
    for ray in paths[::step][: args.rays]:
        pts = [src] + [r["position"] for r in ray]
        vols = np.array([abs(r["volume"]) for r in ray])
        # a ray dies when positions stay at the origin sentinel
        alive = np.ones(len(ray), bool)
        for i, r in enumerate(ray):
            if i and r["position"] == [0.0, 0.0, 0.0] and vols[i] == 0.0:
                alive[i:] = False
                break
        n_alive = int(alive.sum())
        pts = np.asarray(pts[: n_alive + 1])
        if len(pts) < 2:
            continue
        v = float(vols[:n_alive].mean()) if n_alive else 0.0
        ax.plot(pts[:, 0], pts[:, 2], pts[:, 1],
                color=cmap(min(1.0, 20 * v)), linewidth=0.8, alpha=0.85)

    ax.scatter(*[[c] for c in (src[0], src[2], src[1])],
               color="red", s=60, label="source")
    mic = np.asarray(cfg.mic_position)
    ax.scatter(*[[c] for c in (mic[0], mic[2], mic[1])],
               color="blue", s=60, label="mic")
    ax.legend(loc="upper left")
    ax.view_init(elev=args.elev, azim=args.azim)
    ax.set_box_aspect((1, 1, 1))
    fig.tight_layout()
    fig.savefig(args.output, dpi=150)
    print(f"wrote {args.output} ({len(paths)} rays in dump)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
