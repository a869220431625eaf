"""Closest-hit ray/triangle queries — the framework's one hot primitive.

The reference device code answers three kinds of geometric question
(reference rayverb/kernel.cpp):
  - closest hit over the whole scene   (ray_triangle_intersection, :161-192)
  - point-to-point visibility          (point_intersection, :267-296)
  - single mirrored-triangle hits      (triangle_vert_intersection, :62-88)

All three reduce to Möller–Trumbore evaluations; on TPU the entire trace is
phrased as *batched* closest-hit sweeps so that one tiled kernel carries all
of the FLOPs. This module provides the XLA reference implementation (pure
jnp, fully fused by the compiler) and the common data layout; a Pallas
kernel with the same contract lives in intersect_pallas.py.

Math and tolerances follow the reference exactly: |det| < EPSILON rejects,
u in [0,1], u+v in [0,1] with the same strict comparisons, hits require
t > EPSILON, ties keep the lowest triangle index (kernel.cpp:62-88,176-190).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EPSILON


class TriangleSoup(NamedTuple):
    """Device-resident scene geometry in pre-gathered SoA form.

    Padding rows are all-zero => zero-area => |det| < EPSILON => never hit.

    The last three fields are the Pallas sweep's acceleration table, built
    host-side once per scene (soup_from_scene): triangles Morton-ordered by
    centroid so that consecutive SWEEP_BLOCK-triangle blocks are spatially compact,
    packed as [v0, e0, e1, orig_index, 0...] rows, with a conservative AABB
    per block. The sweep kernel slab-tests each ray block against a
    triangle block's AABB and skips the Möller-Trumbore work for blocks no
    ray can improve in — the reference has no such structure (its sweep is
    explicitly brute force, kernel.cpp:176-190).
    """

    v0: jax.Array        # (T, 3)
    e0: jax.Array        # (T, 3) = v1 - v0
    e1: jax.Array        # (T, 3) = v2 - v0
    normal: jax.Array    # (T, 3) unit face normal (normalize(cross(e0, e1)))
    surface: jax.Array   # (T,) int32 row into specular/diffuse
    specular: jax.Array  # (S, 8)
    diffuse: jax.Array   # (S, 8)
    packed: jax.Array    # (Tp, 16) f32 Morton-sorted [v0,e0,e1,orig_idx,0..]
    block_aabb: jax.Array  # (Tp/SWEEP_BLOCK, 8) f32 per-block [lo, hi, 0, 0]
    bounds: jax.Array    # (2, 3) scene AABB

    @property
    def num_padded(self) -> int:
        return self.v0.shape[0]

    def verts(self, idx: jax.Array) -> jax.Array:
        """Gather (..., 3, 3) triangle vertices for triangle indices."""
        v0 = self.v0[idx]
        return jnp.stack([v0, v0 + self.e0[idx], v0 + self.e1[idx]], axis=-2)


# Triangle rows per sweep-kernel block (and per-block AABB). Measured on
# v5e at the 1M-ray x 100k-tri north star (kernel TRI_SUBS scaled to keep
# 4096 triangle rows per grid step, i.e. constant grid-step count):
# 128 beats 256 beats 512 — trace_bin 17.1 / 18.9 / (r2: +2 s) — because
# finer per-block AABBs cull more Möller-Trumbore work at the SAME fixed
# cost; 64 regresses (18.9 s at 289 G executed: doubled in-step region
# count outweighs the extra cull). Env-tunable for granularity
# experiments (must stay a multiple of 8 = f32 sublane tiling).
SWEEP_BLOCK = int(__import__("os").environ.get("RAYVERB_SWEEP_BLOCK", "128"))


def _morton3(q: np.ndarray) -> np.ndarray:
    """Interleave 3x10-bit quantized coordinates into 30-bit Morton codes.
    q: (T, 3) uint32 in [0, 1024)."""
    def spread(x):
        x = x.astype(np.uint64)
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) | (
        spread(q[:, 2]) << np.uint64(2)
    )


def build_sweep_table(v0, e0, e1, block: int = SWEEP_BLOCK):
    """Host-side sweep acceleration table: Morton order + packed rows +
    per-block AABBs. Returns (packed (Tp, 16), aabbs (Tp/block, 8)) numpy.

    Packed rows carry a PRECOMPUTED world->barycentric affine transform
    (Woop-style unit-triangle transform) instead of raw vertices: for a
    triangle (v0, e0, e1) with unnormalised normal n = e0 x e1 the rows are

      cols 0:3  row_u = (e1 x n) / |n|^2     cols 10  bu = -row_u . v0
      cols 3:6  row_v = (n x e0) / |n|^2     cols 11  bv = -row_v . v0
      cols 6:9  n                            cols 12  bw = -n . v0
      col  9    original triangle index

    so a pair test is three affine forms per ray point/direction:
    t = -(n.o + bw)/(n.d), u = row_u.(o + t d) + bu, v likewise — the same
    (t, u, v) Möller–Trumbore produces (kernel.cpp:62-88) at ~30% fewer
    in-kernel flops. n.d equals minus the Möller–Trumbore determinant, so
    the |n.d| < EPSILON degeneracy rejection is the reference's own check.
    The transforms are computed in float64 and rounded once, keeping the
    kernel's (t, u, v) within ~1e-6 relative of the f32 MT reference path.

    The original triangle index rides in packed[:, 9] as float32 (exact
    for scenes below 2^24 triangles) so the kernel can report hits in the
    caller's index space, preserving the reference's lowest-index tie rule.
    """
    v0 = np.asarray(v0, np.float32)
    e0 = np.asarray(e0, np.float32)
    e1 = np.asarray(e1, np.float32)
    t = v0.shape[0]
    if t >= (1 << 24):
        raise ValueError("sweep table supports < 2^24 triangles")

    centroid = v0 + (e0 + e1) / 3.0
    lo = centroid.min(axis=0)
    hi = centroid.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    q = np.clip(((centroid - lo) / span * 1023.0), 0, 1023).astype(np.uint32)
    order = np.argsort(_morton3(q), kind="stable").astype(np.int64)

    # block count rounds up to a power of two: the packed table's shape is
    # a compile key of every sweep program, and remote TPU compiles cost
    # minutes — quantising it lets differently-sized scenes share compiled
    # programs. Padding blocks carry far-away AABBs (below) so the kernel
    # culls them outright; their zero-area rows can never hit.
    # minimum 8 blocks so the Pallas kernel's TRI_SUBS-wide super-steps
    # (up to 8 sub-blocks per grid step) always divide evenly
    nb = max(8, -(-t // block))
    nb = 1 << (nb - 1).bit_length()
    tp = nb * block

    a64 = v0[order].astype(np.float64)
    e064 = e0[order].astype(np.float64)
    e164 = e1[order].astype(np.float64)
    nvec = np.cross(e064, e164)
    den = np.einsum("ij,ij->i", nvec, nvec)
    safe = np.where(den > 0, den, 1.0)[:, None]
    row_u = np.where(den[:, None] > 0, np.cross(e164, nvec) / safe, 0.0)
    row_v = np.where(den[:, None] > 0, np.cross(nvec, e064) / safe, 0.0)

    packed = np.zeros((tp, 16), np.float32)
    packed[:t, 0:3] = row_u.astype(np.float32)
    packed[:t, 3:6] = row_v.astype(np.float32)
    packed[:t, 6:9] = nvec.astype(np.float32)
    packed[:t, 9] = order.astype(np.float32)
    packed[:t, 10] = -np.einsum("ij,ij->i", row_u, a64).astype(np.float32)
    packed[:t, 11] = -np.einsum("ij,ij->i", row_v, a64).astype(np.float32)
    packed[:t, 12] = -np.einsum("ij,ij->i", nvec, a64).astype(np.float32)

    # conservative per-block AABB over all three vertices; padding rows are
    # empty (excluded); fully-empty blocks get a far-away point AABB that
    # no practical ray intersects (skipping them is pure optimization —
    # their zero-area rows can never produce a hit anyway)
    p0 = np.zeros((tp, 3), np.float32)
    p1 = np.zeros((tp, 3), np.float32)
    p2 = np.zeros((tp, 3), np.float32)
    p0[:t] = v0[order]
    p1[:t] = v0[order] + e0[order]
    p2[:t] = v0[order] + e1[order]
    allp = np.stack([p0, p1, p2], axis=1)  # (Tp, 3, 3)
    real = np.zeros((tp,), bool)
    real[:t] = True
    big = np.float32(1e30)
    lo_rows = np.where(real[:, None, None], allp, big).reshape(
        tp // block, block * 3, 3
    )
    hi_rows = np.where(real[:, None, None], allp, -big).reshape(
        tp // block, block * 3, 3
    )
    pad = np.float32(1e-4)
    aabbs = np.zeros((tp // block, 8), np.float32)
    aabbs[:, 0:3] = lo_rows.min(axis=1) - pad
    aabbs[:, 3:6] = hi_rows.max(axis=1) + pad
    empty = ~real.reshape(tp // block, block).any(axis=1)
    aabbs[empty, 0:3] = big
    aabbs[empty, 3:6] = big
    return packed, aabbs


def soup_from_arrays(v0, e0, e1, surface, specular, diffuse) -> TriangleSoup:
    """Build a TriangleSoup (including the sweep acceleration table) from
    host triangle arrays."""
    v0 = np.asarray(v0, np.float32)
    e0 = np.asarray(e0, np.float32)
    e1 = np.asarray(e1, np.float32)
    n = np.cross(e0, e1)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = np.where(norm > 0, n / np.where(norm == 0, 1, norm), 0.0)
    packed, aabbs = build_sweep_table(v0, e0, e1)
    p_all = np.concatenate([v0, v0 + e0, v0 + e1], axis=0)
    bounds = np.stack([p_all.min(axis=0), p_all.max(axis=0)])
    return TriangleSoup(
        v0=jnp.asarray(v0),
        e0=jnp.asarray(e0),
        e1=jnp.asarray(e1),
        normal=jnp.asarray(n, dtype=jnp.float32),
        surface=jnp.asarray(surface, dtype=jnp.int32),
        specular=jnp.asarray(specular, dtype=jnp.float32),
        diffuse=jnp.asarray(diffuse, dtype=jnp.float32),
        packed=jnp.asarray(packed),
        block_aabb=jnp.asarray(aabbs),
        bounds=jnp.asarray(bounds, dtype=jnp.float32),
    )


def soup_from_scene(scene) -> TriangleSoup:
    """Build a device TriangleSoup from a compiled host Scene."""
    return soup_from_arrays(
        scene.v0,
        scene.e0,
        scene.e1,
        scene.tri_surface,
        scene.specular,
        scene.diffuse,
    )


class Hit(NamedTuple):
    """Result of a closest-hit sweep. Misses have t = +inf and hit = False."""

    t: jax.Array     # (M,) float32 distance along the (unit or not) direction
    index: jax.Array  # (M,) int32 triangle index (0 on miss)
    hit: jax.Array   # (M,) bool


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _cross(a, b):
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def moller_trumbore(origins, dirs, v0, e0, e1):
    """Vectorised Möller–Trumbore (kernel.cpp:62-88).

    origins/dirs: (..., 3) broadcastable against v0/e0/e1 (..., 3).
    Returns (t, valid): t is the raw signed distance; valid mirrors the
    reference's in-triangle + non-degenerate checks (t sign NOT checked
    here — callers apply their own t thresholds, as the reference does).
    """
    pvec = _cross(dirs, e1)
    det = _dot(e0, pvec)
    degenerate = jnp.abs(det) < EPSILON
    invdet = 1.0 / jnp.where(degenerate, 1.0, det)
    tvec = origins - v0
    u = invdet * _dot(tvec, pvec)
    qvec = _cross(tvec, e0)
    v = invdet * _dot(dirs, qvec)
    t = invdet * _dot(e1, qvec)
    valid = (
        ~degenerate
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
    )
    return t, valid


def intersect_triangle(origins, dirs, tri_verts):
    """Single-triangle intersection used by image-source path validation
    (triangle_vert_intersection, kernel.cpp:62-88): returns raw t, with 0
    where the reference would return 0 (degenerate or outside)."""
    v0 = tri_verts[..., 0, :]
    e0 = tri_verts[..., 1, :] - v0
    e1 = tri_verts[..., 2, :] - v0
    t, valid = moller_trumbore(origins, dirs, v0, e0, e1)
    return jnp.where(valid, t, 0.0)


def closest_hit_xla(origins, dirs, soup: TriangleSoup, t_max=None) -> Hit:
    """Closest hit of M rays against all T triangles (brute force sweep,
    matching ray_triangle_intersection kernel.cpp:161-192).

    origins, dirs: (M, 3). The (M, T) candidate plane is never materialised
    past XLA fusion; the min+argmin reduction keeps the first (lowest-index)
    triangle on exact ties like the reference's strict '<' update.

    t_max (M,), optional: drop hits strictly beyond the bound. Used by
    point-to-point queries (mic shadow rays, image path validation) whose
    verdicts only depend on hits at or before the target — see
    trace._sweep_bound for why the verdicts are unchanged.
    """
    t, valid = moller_trumbore(
        origins[:, None, :],
        dirs[:, None, :],
        soup.v0[None, :, :],
        soup.e0[None, :, :],
        soup.e1[None, :, :],
    )
    keep = valid & (t > EPSILON)
    if t_max is not None:
        keep = keep & (t <= t_max[:, None])
    t = jnp.where(keep, t, jnp.inf)
    idx = jnp.argmin(t, axis=1).astype(jnp.int32)
    best = jnp.min(t, axis=1)
    return Hit(t=best, index=idx, hit=jnp.isfinite(best))


def closest_hit(
    origins,
    dirs,
    soup: TriangleSoup,
    *,
    impl: str = "auto",
    t_max=None,
    t_decide=None,
    with_stats: bool = False,
):
    """Dispatch between the XLA sweep and the Pallas kernel.

    impl: 'auto' | 'xla' | 'pallas'. 'auto' prefers the Pallas kernel on
    TPU backends when the batch is large enough to fill a tile.

    t_decide (M,), optional any-hit thresholds: rows whose best drops
    strictly below the threshold stop refining (verdict already locked);
    only valid when the caller reads a visibility verdict, not the
    closest hit itself. The XLA sweep ignores it (always exact) — the
    verdicts agree by construction.

    with_stats=True returns (Hit, executed_pairs (ntiles,) float32): the
    pair tests actually run post-cull, per 512-lane ray tile (the
    brute-force XLA sweep executes everything issued).
    """
    if impl in ("pallas", "auto") and impl != "xla":
        from . import intersect_pallas

        if impl == "pallas" or intersect_pallas.should_use_pallas(
            origins.shape[0], soup.num_padded
        ):
            return intersect_pallas.closest_hit_pallas(
                origins,
                dirs,
                soup,
                t_max=t_max,
                t_decide=t_decide,
                with_stats=with_stats,
            )
    hit = closest_hit_xla(origins, dirs, soup, t_max)
    if not with_stats:
        return hit
    m = origins.shape[0]
    ntiles = -(-m // 512)
    per = np.float32(m * soup.num_padded / max(ntiles, 1))
    return hit, jnp.full((ntiles,), per, jnp.float32)


def visible(begin, point, soup: TriangleSoup, *, impl: str = "auto") -> jax.Array:
    """Mutual visibility of two points (point_intersection,
    kernel.cpp:267-296): true when no triangle lies strictly between them."""
    diff = point - begin
    mag = jnp.linalg.norm(diff, axis=-1)
    safe = jnp.where(mag[..., None] > 0, mag[..., None], 1.0)
    hit = closest_hit(
        begin, diff / safe, soup, impl=impl, t_max=mag * 1.001 + 0.01
    )
    return (~hit.hit) | (hit.t > mag)
