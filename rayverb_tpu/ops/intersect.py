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
    """

    v0: jax.Array        # (T, 3)
    e0: jax.Array        # (T, 3) = v1 - v0
    e1: jax.Array        # (T, 3) = v2 - v0
    normal: jax.Array    # (T, 3) unit face normal (normalize(cross(e0, e1)))
    surface: jax.Array   # (T,) int32 row into specular/diffuse
    specular: jax.Array  # (S, 8)
    diffuse: jax.Array   # (S, 8)

    @property
    def num_padded(self) -> int:
        return self.v0.shape[0]

    def verts(self, idx: jax.Array) -> jax.Array:
        """Gather (..., 3, 3) triangle vertices for triangle indices."""
        v0 = self.v0[idx]
        return jnp.stack([v0, v0 + self.e0[idx], v0 + self.e1[idx]], axis=-2)


def soup_from_scene(scene) -> TriangleSoup:
    """Build a device TriangleSoup from a compiled host Scene."""
    e0 = np.asarray(scene.e0)
    e1 = np.asarray(scene.e1)
    n = np.cross(e0, e1)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = np.where(norm > 0, n / np.where(norm == 0, 1, norm), 0.0)
    return TriangleSoup(
        v0=jnp.asarray(scene.v0, dtype=jnp.float32),
        e0=jnp.asarray(e0, dtype=jnp.float32),
        e1=jnp.asarray(e1, dtype=jnp.float32),
        normal=jnp.asarray(n, dtype=jnp.float32),
        surface=jnp.asarray(scene.tri_surface, dtype=jnp.int32),
        specular=jnp.asarray(scene.specular, dtype=jnp.float32),
        diffuse=jnp.asarray(scene.diffuse, dtype=jnp.float32),
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


def closest_hit_xla(origins, dirs, soup: TriangleSoup) -> Hit:
    """Closest hit of M rays against all T triangles (brute force sweep,
    matching ray_triangle_intersection kernel.cpp:161-192).

    origins, dirs: (M, 3). The (M, T) candidate plane is never materialised
    past XLA fusion; the min+argmin reduction keeps the first (lowest-index)
    triangle on exact ties like the reference's strict '<' update.
    """
    t, valid = moller_trumbore(
        origins[:, None, :],
        dirs[:, None, :],
        soup.v0[None, :, :],
        soup.e0[None, :, :],
        soup.e1[None, :, :],
    )
    t = jnp.where(valid & (t > EPSILON), t, jnp.inf)
    idx = jnp.argmin(t, axis=1).astype(jnp.int32)
    best = jnp.min(t, axis=1)
    return Hit(t=best, index=idx, hit=jnp.isfinite(best))


def closest_hit(origins, dirs, soup: TriangleSoup, *, impl: str = "auto") -> Hit:
    """Dispatch between the XLA sweep and the Pallas kernel.

    impl: 'auto' | 'xla' | 'pallas'. 'auto' prefers the Pallas kernel on
    TPU backends when the batch is large enough to fill a tile.
    """
    if impl == "xla":
        return closest_hit_xla(origins, dirs, soup)
    if impl in ("pallas", "auto"):
        from . import intersect_pallas

        if impl == "pallas" or intersect_pallas.should_use_pallas(
            origins.shape[0], soup.num_padded
        ):
            return intersect_pallas.closest_hit_pallas(origins, dirs, soup)
    return closest_hit_xla(origins, dirs, soup)


def visible(begin, point, soup: TriangleSoup, *, impl: str = "auto") -> jax.Array:
    """Mutual visibility of two points (point_intersection,
    kernel.cpp:267-296): true when no triangle lies strictly between them."""
    diff = point - begin
    mag = jnp.linalg.norm(diff, axis=-1)
    safe = jnp.where(mag[..., None] > 0, mag[..., None], 1.0)
    hit = closest_hit(begin, diff / safe, soup, impl=impl)
    return (~hit.hit) | (hit.t > mag)
