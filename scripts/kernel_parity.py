#!/usr/bin/env python
"""On-TPU Pallas-kernel parity artifact (VERDICT r3 weak #6).

The unit suite exercises the sweep kernel in interpret mode on the CPU
backend (tests/conftest.py pins JAX_PLATFORMS=cpu); this script runs the
MOSAIC-COMPILED kernel on the real TPU backend and checks it against the
XLA f32 brute-force sweep (the same-precision contract reference) plus an
independent float64 numpy Möller–Trumbore oracle, over mixed sweep kinds
(open closest-hit rows, bounded point-to-point rows, any-hit decide rows)
on two scenes: the vault demo (reference headline scene) and the
100k-triangle hall (north-star scene, generated on demand).

The PRIMARY gate is Pallas-vs-XLA at equal (f32) precision. The vault
mesh contains OVERLAPPING coplanar triangles (e.g. a large face with a
smaller face lying in the same plane), where two triangles produce the
same hit t and f32 rounding order legitimately picks either index — both
f32 sweeps disagree with the float64 oracle on ~7% of vault hits for
exactly those rows (measured: XLA 92.9% / Pallas 94.2% index agreement
vs f64, hit/visibility verdicts 100%). Index mismatches are therefore
accepted only when the two t values tie to within 2e-4 relative; a
wrong-block kernel bug would surface as a different t. On agreeing
indices the t gate is a tight p99 (1e-5) plus a loose max (5e-4): the
kernel's Woop affine forms and the XLA sweep's classic Möller–Trumbore
round differently, and the vault's sliver faces push isolated rows to
~1e-4 relative (each sweep shows the same-sized deviation vs float64).

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
    from rayverb_tpu.ops.intersect import closest_hit_xla, soup_from_scene
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

    print(f"[{name}] compiling+running TPU sweeps...", file=sys.stderr)
    t0 = time.time()
    got = closest_hit_pallas(
        jnp.asarray(o), jnp.asarray(d), soup,
        t_max=jnp.asarray(t_max), t_decide=jnp.asarray(decide),
    )
    got.t.block_until_ready()
    wall = time.time() - t0
    # the same-precision reference: the XLA f32 brute-force sweep (exact —
    # no decide thresholds; visibility verdicts must still agree). Chunked
    # over rays: unfused (M, T, 3) intermediates at 2048 x 101k exhaust HBM
    xt_l, xi_l, xh_l = [], [], []
    for s0 in range(0, nrays, 256):
        sl = slice(s0, min(s0 + 256, nrays))
        xc = closest_hit_xla(
            jnp.asarray(o[sl]), jnp.asarray(d[sl]), soup,
            t_max=jnp.asarray(t_max[sl]),
        )
        xt_l.append(np.asarray(xc.t))
        xi_l.append(np.asarray(xc.index))
        xh_l.append(np.asarray(xc.hit))
    print(f"[{name}] sweeps done in {wall:.1f}s; float64 host reference "
          f"({nrays} x {soup.num_padded} pairs)...", file=sys.stderr)

    v0 = np.asarray(soup.v0, np.float64)
    e0 = np.asarray(soup.e0, np.float64)
    e1 = np.asarray(soup.e1, np.float64)
    rt, ri = numpy_reference(o, d, v0, e0, e1, t_max, EPSILON)

    gt = np.asarray(got.t)
    gi = np.where(np.asarray(got.hit), np.asarray(got.index), -1)
    gh = np.asarray(got.hit)
    xt = np.concatenate(xt_l)
    xh = np.concatenate(xh_l)
    xi = np.where(xh, np.concatenate(xi_l), -1)
    rh = np.isfinite(rt)

    # exact rows: everything except any-hit decide rows, whose contract is
    # verdict-only (a locked row may return any witness blocker)
    exact = np.ones(nrays, bool)
    exact[2 * third:] = False
    dec = ~exact

    # ---- primary gate: compiled Pallas vs XLA f32 (same precision) ----
    hit_agree = float((gh[exact] == xh[exact]).mean())
    both = exact & gh & xh
    idx_same = gi[both] == xi[both]
    idx_agree = float(idx_same.mean())
    rel_all = np.abs(gt[both] - xt[both]) / np.maximum(xt[both], 1e-9)
    t_rel = float(np.max(rel_all))
    # the kernel evaluates Woop affine forms, the XLA sweep classic MT:
    # equal values in exact arithmetic, different f32 rounding paths. On
    # well-conditioned triangles they agree to ~1e-6; the vault's sliver/
    # overlapping faces push single rows to ~1e-4 (its Pallas-vs-f64 and
    # XLA-vs-f64 deviations are the same size there) — so the gate is a
    # tight p99 plus a loose max, not a tight max
    t_rel_p99 = float(np.percentile(rel_all, 99)) if rel_all.size else 0.0
    # index mismatches must be coplanar/knife-edge ties (same t): demo
    # meshes (vault) contain OVERLAPPING coplanar triangles, where f32
    # rounding order legitimately picks either — a wrong-block bug would
    # return a different t instead
    mism = both.copy()
    mism[both] = ~idx_same
    tie_rel = float(
        np.max(
            np.abs(gt[mism] - xt[mism]) / np.maximum(xt[mism], 1e-9),
            initial=0.0,
        )
    )
    vis_x = (~xh[dec]) | (xt[dec] > mag[dec])
    vis_got = (~gh[dec]) | (gt[dec] > mag[dec])
    vis_agree = float((vis_got == vis_x).mean())

    # ---- informational: both f32 sweeps vs the float64 oracle ----
    both64 = exact & gh & rh
    f64 = {
        "pallas_hit_agree": float((gh[exact] == rh[exact]).mean()),
        "pallas_index_agree": float((gi[both64] == ri[both64]).mean()),
        "xla_index_agree": float(
            (xi[exact & xh & rh] == ri[exact & xh & rh]).mean()
        ),
        "pallas_max_t_rel_err": float(
            np.max(np.abs(gt[both64] - rt[both64]) / np.maximum(rt[both64], 1e-9))
        ),
    }

    rec = {
        "scene": name,
        "triangles": int(soup.num_padded),
        "rays": nrays,
        "pallas_vs_xla": {
            "hit_agree": hit_agree,
            "index_agree": idx_agree,
            "max_t_rel_err": t_rel,
            "p99_t_rel_err": t_rel_p99,
            "index_mismatch_max_t_rel": tie_rel,
            "decide_verdict_agree": vis_agree,
        },
        "vs_float64": f64,
        "sweep_wall_s": round(wall, 3),
    }
    ok = (
        hit_agree == 1.0
        and t_rel_p99 < 2e-5      # bulk: f32 rounding only
        and t_rel < 5e-4          # tail: ill-conditioned slivers
        and tie_rel < 2e-4        # mismatching indices: coplanar ties
        and idx_agree >= 0.9      # vault's overlap region is ~7% of hits
        and vis_agree == 1.0
        and f64["pallas_hit_agree"] == 1.0
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
