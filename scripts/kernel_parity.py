#!/usr/bin/env python
"""On-TPU Pallas-kernel parity artifact (VERDICT r3 weak #6).

The unit suite exercises the sweep kernel in interpret mode on the CPU
backend (tests/conftest.py pins JAX_PLATFORMS=cpu); this script runs the
MOSAIC-COMPILED kernel on the real TPU backend and checks it against an
independent float64 numpy Möller–Trumbore reference over mixed sweep
kinds (open closest-hit rows, bounded point-to-point rows, any-hit decide
rows) on two scenes: the vault demo (reference headline scene) and the
100k-triangle hall (north-star scene, generated on demand).

Commit the printed log as docs/kernel_parity_tpu.log so the compiled
kernel's correctness is a checked-in artifact, not an implication of the
benchmark numbers.

Usage: python scripts/kernel_parity.py [--rays 2048] [--seed 3]

(The float64 reference is pure numpy at ~54 pair-flops each — the 2048
default keeps the hall check to a few minutes of host time; the sweep
itself is one TPU dispatch either way.)
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import numpy as np


def numpy_reference(o, d, v0, e0, e1, t_max, eps):
    """Float64 brute-force Möller–Trumbore closest hit with the
    reference's tolerances (kernel.cpp:62-88,161-192), chunked over
    triangles to bound memory."""
    n = o.shape[0]
    bt = np.full(n, np.inf)
    bi = np.full(n, -1, np.int64)
    o64 = o.astype(np.float64)
    d64 = d.astype(np.float64)
    for s0 in range(0, len(v0), 8192):
        sl = slice(s0, min(s0 + 8192, len(v0)))
        pv = np.cross(d64[:, None, :], e1[None, sl, :])
        det = np.einsum("tj,rtj->rt", e0[sl], pv)
        deg = np.abs(det) < eps
        inv = 1.0 / np.where(deg, 1.0, det)
        tv = o64[:, None, :] - v0[None, sl, :]
        u = inv * np.einsum("rtj,rtj->rt", tv, pv)
        qv = np.cross(tv, e0[None, sl, :])
        v = inv * np.einsum("rj,rtj->rt", d64, qv)
        t = inv * np.einsum("tj,rtj->rt", e1[sl], qv)
        ok = (
            (~deg)
            & (u >= 0) & (u <= 1)
            & (v >= 0) & (u + v <= 1)
            & (t > eps)
        )
        t = np.where(ok, t, np.inf)
        ti = np.argmin(t, axis=1)
        tm = t[np.arange(n), ti]
        upd = tm < bt
        bt = np.where(upd, tm, bt)
        bi = np.where(upd, ti + s0, bi)
    if t_max is not None:
        out = bt <= t_max
        bt = np.where(out, bt, np.inf)
        bi = np.where(out, bi, -1)
    return bt, bi


def check_scene(name, scene, nrays, seed):
    import jax.numpy as jnp

    from rayverb_tpu.constants import EPSILON
    from rayverb_tpu.ops.intersect import soup_from_scene
    from rayverb_tpu.ops.intersect_pallas import closest_hit_pallas

    soup = soup_from_scene(scene)
    rng = np.random.default_rng(seed)
    lo, hi = np.asarray(scene.bounds)
    center = 0.5 * (lo + hi)
    span = np.maximum(hi - lo, 1.0)
    o = (center + (rng.random((nrays, 3)) - 0.5) * 0.6 * span).astype(
        np.float32
    )
    d = rng.normal(size=(nrays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    # mixed kinds: first third open closest-hit, second third bounded
    # point-to-point, last third bounded + any-hit decide
    third = nrays // 3
    mag = (0.3 + 0.6 * np.linalg.norm(span) * rng.random(nrays)).astype(
        np.float32
    )
    t_max = np.full(nrays, np.inf, np.float32)
    t_max[third:] = mag[third:] * 1.001 + 0.01
    decide = np.zeros(nrays, np.float32)
    decide[2 * third:] = mag[2 * third:]

    print(f"[{name}] compiling+running TPU sweep...", file=sys.stderr)
    t0 = time.time()
    got = closest_hit_pallas(
        jnp.asarray(o), jnp.asarray(d), soup,
        t_max=jnp.asarray(t_max), t_decide=jnp.asarray(decide),
    )
    got.t.block_until_ready()
    wall = time.time() - t0
    print(f"[{name}] sweep done in {wall:.1f}s; float64 host reference "
          f"({nrays} x {soup.num_padded} pairs)...", file=sys.stderr)

    v0 = np.asarray(soup.v0, np.float64)
    e0 = np.asarray(soup.e0, np.float64)
    e1 = np.asarray(soup.e1, np.float64)
    rt, ri = numpy_reference(o, d, v0, e0, e1, t_max, EPSILON)

    gt = np.asarray(got.t)
    gi = np.where(np.asarray(got.hit), np.asarray(got.index), -1)
    rh = np.isfinite(rt)
    gh = np.asarray(got.hit)

    # exact rows: everything except any-hit decide rows, whose contract is
    # verdict-only (a locked row may return any witness blocker)
    exact = np.ones(nrays, bool)
    exact[2 * third:] = False
    hit_agree = float((gh[exact] == rh[exact]).mean())
    both = exact & gh & rh
    idx_agree = float((gi[both] == ri[both]).mean())
    t_rel = float(
        np.max(np.abs(gt[both] - rt[both]) / np.maximum(rt[both], 1e-9))
    )
    # decide rows: the visibility verdict must match the exact sweep
    dec = ~exact
    vis_ref = (~rh[dec]) | (rt[dec] > mag[dec])
    vis_got = (~gh[dec]) | (gt[dec] > mag[dec])
    vis_agree = float((vis_got == vis_ref).mean())

    rec = {
        "scene": name,
        "triangles": int(soup.num_padded),
        "rays": nrays,
        "hit_agree": hit_agree,
        "index_agree": idx_agree,
        "max_t_rel_err": t_rel,
        "decide_verdict_agree": vis_agree,
        "sweep_wall_s": round(wall, 3),
    }
    ok = (
        hit_agree == 1.0
        and idx_agree >= 0.9995  # knife-edge ties may break differently
        and t_rel < 5e-6
        and vis_agree == 1.0
    )
    rec["ok"] = ok
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args()

    import jax

    from rayverb_tpu import load_scene

    backend = jax.default_backend()
    records = {
        "backend": backend,
        "devices": [str(d) for d in jax.devices()],
        "interpret": backend != "tpu",
    }

    vault = load_scene(
        os.path.join(REPO, "assets/test_models/vault.obj"),
        os.path.join(REPO, "assets/materials/vault.json"),
    )
    from gen_hall import generate  # noqa: E402

    hall_path = os.path.join(REPO, "assets/test_models/hall100k.obj")
    if not os.path.exists(hall_path):
        generate(hall_path, 100_000)
    hall = load_scene(
        hall_path, os.path.join(REPO, "assets/materials/mat.json")
    )

    records["scenes"] = [
        check_scene("vault", vault, args.rays, args.seed),
        check_scene("hall100k", hall, args.rays, args.seed + 1),
    ]
    records["ok"] = all(s["ok"] for s in records["scenes"])
    print(json.dumps(records, indent=1))
    return 0 if records["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
