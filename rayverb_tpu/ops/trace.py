"""The acoustic trace: specular bounce loop + image-source early reflections.

TPU-native restructuring of the reference's `raytrace` OpenCL kernel
(reference rayverb/kernel.cpp:304-503) and its host driver
(rayverb/rayverb.cpp:538-714):

  - one work-item per ray  ->  batched arrays over N rays
  - iterative bounce loop  ->  statically-unrolled image-source phase
    (bounces 0..NUM_IMAGE_SOURCE-2) followed by a lax.scan diffuse phase
  - every geometric query (bounce hit, mic shadow ray, image-source
    path-validation segments, image mic visibility) is packed into batched
    closest-hit sweeps so a single tiled kernel carries all the FLOPs
  - the reference's early-exit validation loop (kernel.cpp:401-429) is
    order-independent in its result, so all segments are validated in one
    parallel sweep (the final AND is identical)
  - `break` on miss (kernel.cpp:372-375) becomes an `alive` mask; dead rays
    leave zeros in the output, exactly like the zero-initialised buffers the
    reference never writes (rayverb.cpp:600-616)

Faithfully kept quirks (documented in SURVEY.md §7):
  - per-bounce volume sign flip: newVol = -volume * specular
    (kernel.cpp:461)
  - image-source impulses use the *pre-bounce* volume, i.e. the chain's last
    surface is not applied (kernel.cpp:444-455 runs before volume update)
  - the diffuse Lambert term uses |dot(n, incident_dir)| (kernel.cpp:478)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from ..constants import (
    AIR_COEFFICIENT,
    EPSILON,
    NUM_BANDS,
    NUM_IMAGE_SOURCE,
    SECONDS_PER_METER,
)
from .intersect import (
    Hit,
    TriangleSoup,
    closest_hit,
    intersect_triangle,
    soup_from_scene,
)

from ..runtime import enable_compilation_cache

enable_compilation_cache()

DEFAULT_RAY_CHUNK = 4096  # mirrors the reference's RAY_GROUP_SIZE (rayverb.h:199)

# Origin far outside every scene block's AABB: sweep rows parked here (with
# bound 0) fail the kernel's slab test against every triangle block, so
# whole lane-tiles of neutralized rows cost no Möller-Trumbore work at all.
_DEAD_ORIGIN = np.float32(3.0e8)


def _spread9(x):
    """Spread the low 9 bits of a uint32 to every third bit position."""
    x = x & np.uint32(0x1FF)
    x = (x | (x << 16)) & np.uint32(0x030000FF)
    x = (x | (x << 8)) & np.uint32(0x0300F00F)
    x = (x | (x << 4)) & np.uint32(0x030C30C3)
    x = (x | (x << 2)) & np.uint32(0x09249249)
    return x


def _dir_morton(d):
    """(N,) uint32: 27-bit Morton code of a unit direction mapped into the
    [0,1]^3 cube — a hierarchical direction-locality sort key. Nearby codes
    are nearby directions, so 512-row sweep tiles sorted by this key share
    a narrow cone."""
    q = jnp.clip((d * 0.5 + 0.5) * 511.0, 0.0, 511.0).astype(jnp.uint32)
    return (
        _spread9(q[:, 0])
        | (_spread9(q[:, 1]) << np.uint32(1))
        | (_spread9(q[:, 2]) << np.uint32(2))
    )


# Between-bounce resort key variant (RAYVERB_SORT_KEY):
#   octant — direction octant major, then position Morton (the r3 key)
#   cell8  — scene-octant position cell major, then FULL direction Morton
#   cell64 — 64-cell position major, then direction Morton
#   mix6   — 6-D Morton: position and direction bits interleaved 1:1, so
#            every level of the sort hierarchy halves BOTH the origin
#            cell and the cone — the split adapts to population size
#            (more rays per tile -> finer cells AND narrower cones
#            simultaneously), where the cell variants fix the position
#            granularity regardless of scale
# The cell variants spend fewer bits on origin locality and many more on
# direction: a 512-ray tile then covers a small origin cell AND a narrow
# cone, shrinking the swept corridor (executed block set) of the kernel's
# per-tile cull at large populations where each (cell, cone) bucket still
# fills whole tiles. Ray order is semantically free (the reference's RNG
# order carries no meaning).
# Default mix6: measured best at the 1M-ray north star (bounce executed
# pairs 497 G octant / 430 G cell64 / 405 G mix6; trace_bin 26.3 / 24.8 /
# 23.7 s with stats on). At 64k-probe scale the variants are within a few
# % of each other — the adaptive key's advantage shows up at scale.
_SORT_KEY_VARIANT = __import__("os").environ.get("RAYVERB_SORT_KEY", "mix6")


def _ray_sort_key(pos, direction, lo, inv_span):
    """(N,) uint32 spatial sort key (see _SORT_KEY_VARIANT above).
    Re-sorting rays by this key between bounces restores the bundle
    coherence that specular reflection gradually destroys, which is what
    the sweep kernel's per-tile AABB cull feeds on."""
    q = jnp.clip(
        (pos - lo) * inv_span * 511.0, 0.0, 511.0
    ).astype(jnp.uint32)
    m = (
        _spread9(q[:, 0])
        | (_spread9(q[:, 1]) << np.uint32(1))
        | (_spread9(q[:, 2]) << np.uint32(2))
    )
    if _SORT_KEY_VARIANT == "cell8":
        # top 3 position-Morton bits (scene octant cell), then the full
        # 27-bit direction Morton — tiles are narrow cones per cell
        return ((m >> np.uint32(24)) << np.uint32(27)) | _dir_morton(
            direction
        )
    if _SORT_KEY_VARIANT == "cell64":
        # top 6 position bits (64 cells), then 26 direction bits
        return ((m >> np.uint32(21)) << np.uint32(26)) | (
            _dir_morton(direction) >> np.uint32(1)
        )
    if _SORT_KEY_VARIANT == "mix6":
        # 1:1 interleave of the top 16 position-Morton and top 16
        # direction-Morton bits (position at the higher bit of each pair,
        # so position splits first at equal depth)
        def _spread16(x):
            x = x & np.uint32(0xFFFF)
            x = (x | (x << 8)) & np.uint32(0x00FF00FF)
            x = (x | (x << 4)) & np.uint32(0x0F0F0F0F)
            x = (x | (x << 2)) & np.uint32(0x33333333)
            x = (x | (x << 1)) & np.uint32(0x55555555)
            return x

        dm = _dir_morton(direction)
        return (_spread16(m >> np.uint32(11)) << np.uint32(1)) | _spread16(
            dm >> np.uint32(11)
        )
    # octant-MAJOR (r3 default): a 512-ray tile shares a direction cone
    # as well as an origin cluster. (A finer 64-cone direction split in
    # the TOP bits was measured WORSE on the 64k-ray hall probe — it
    # fragments the origin clusters faster than it narrows the cones.)
    octant = (
        (direction[:, 0] > 0).astype(jnp.uint32)
        | ((direction[:, 1] > 0).astype(jnp.uint32) << np.uint32(1))
        | ((direction[:, 2] > 0).astype(jnp.uint32) << np.uint32(2))
    )
    return (octant << np.uint32(27)) | m


class TraceOutputs(NamedTuple):
    """Dense per-ray trace results (struct-of-arrays Impulse records,
    clstructs.h:37-44)."""

    diffuse_volume: jax.Array    # (N, R, 8)
    diffuse_position: jax.Array  # (N, R, 3)
    diffuse_time: jax.Array      # (N, R)
    image_volume: jax.Array      # (N, NUM_IMAGE_SOURCE, 8)
    image_position: jax.Array    # (N, NUM_IMAGE_SOURCE, 3)
    image_time: jax.Array        # (N, NUM_IMAGE_SOURCE)
    image_index: jax.Array       # (N, NUM_IMAGE_SOURCE) int32, triangle+1


def _air_attenuation(distance):
    """Per-band exponential air absorption (kernel.cpp:194-198)."""
    return jnp.exp(distance[..., None] * jnp.asarray(AIR_COEFFICIENT))


def _safe_normalize(v):
    mag = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.where(mag > 0, mag, 1.0)


def _tri_normal(tri):
    """Unit normal of (..., 3, 3) triangle verts (kernel.cpp:109-116)."""
    e0 = tri[..., 1, :] - tri[..., 0, :]
    e1 = tri[..., 2, :] - tri[..., 0, :]
    return _safe_normalize(jnp.cross(e0, e1))


def _mirror_point(p, tri):
    """Reflect points (..., 3) through the plane of (..., 3, 3)
    (mirror_point, kernel.cpp:216-221)."""
    n = _tri_normal(tri)
    return p - n * (2.0 * jnp.sum(n * (p - tri[..., 0, :]), axis=-1, keepdims=True))


def _mirror_tri(tri, plane):
    """Reflect all three vertices of `tri` through `plane`
    (mirror_verts, kernel.cpp:223-229)."""
    return _mirror_point(tri, plane[..., None, :, :])


def _visible_from_hit(hit: Hit, mag):
    """point_intersection acceptance (kernel.cpp:295): no blocker strictly
    before the target."""
    return (~hit.hit) | (hit.t > mag)


def _inv_permutation(perm):
    """Inverse permutation by scatter — one O(n) pass where argsort(perm)
    would run a second full sort (measured ~ms each at 1M rows, two sites
    per bounce)."""
    return (
        jnp.zeros_like(perm)
        .at[perm]
        .set(jnp.arange(perm.shape[0], dtype=perm.dtype), unique_indices=True)
    )


# Horizon-split bounce sweeps (RAYVERB_HORIZON = fraction of the scene
# bbox diagonal, 0/unset = off): the executed-pair floor of the tiled
# sweep is the UNION of a tile's per-ray corridors, so one far-flying ray
# drags its whole tile through a long corridor of triangle blocks. With a
# horizon h, the bounce closest-hit runs as two sweeps:
#   pass 1: per-ray bound capped at h — a hit found under a t_max cap is
#           the true closest hit (the cap only culls blocks that could
#           not beat it), so rays resolving within h are DONE;
#   pass 2: rays unresolved within h (typically few) are PARTITIONED to
#           the front of a fresh sort and re-swept unbounded; everyone
#           else parks dead (bound 0), so almost every pass-2 tile is
#           fully dead (no triangle DMA, one culled region per step).
# Long-corridor work thus runs in compact tiles of long-corridor rays
# instead of inflating every mixed tile's union — the "wavefront with
# compaction between depths" structure of docs/perf.md r5 notes item 1,
# expressed in two fixed-shape sweeps. Results are bit-identical.
_HORIZON_FRAC = float(__import__("os").environ.get("RAYVERB_HORIZON", "0"))


# Mic shadow rays run REVERSED (origin at the mic, direction toward the
# bounce point) unless this env opts back into the reference's
# surface-to-mic orientation. Rationale: every shadow row of a bounce
# targets the SAME mic, so reversing gives all rows one exact shared
# origin; sorted by direction Morton code, each 512-row sweep tile then
# covers a razor-thin cone from the mic and the kernel's per-tile
# near-to-far traversal + per-ray bound cull almost everything outside
# it. Verdict parity: the forward test "no blocker with t in (EPS, mag]"
# becomes "no blocker with t_rev in (EPS, mag_eff]" where
# mag_eff = mag*(1-4e-6) - EPSILON excludes the bounce surface itself
# (the point lies ON a scene triangle, which the reversed ray reaches at
# t ~ mag); the EPSILON-sized exclusion zone sits at the bounce point in
# both orientations, so verdicts agree except for geometry within
# EPSILON of the mic itself (a mic embedded in a wall).
_SHADOW_REVERSED = not bool(__import__("os").environ.get("RAYVERB_SHADOW_FWD"))


def _shadow_rows(mic, intersection, alive, mag, pair=None):
    """Build the reversed, direction-sorted mic-shadow sweep rows.

    mic: (3,) or per-row (N, 3). pair (N,) int32 (multi-pair traces): rows
    sort pair-major so each tile keeps a single shared mic origin, then by
    direction within the pair.

    Returns (origins, dirs, bounds, decide, inv_perm, mag_eff); the sweep's
    Hit rows must be gathered through inv_perm before computing
    vis = (~hit) | (t > mag_eff)."""
    d = _safe_normalize(intersection - mic)
    key = jnp.where(alive, _dir_morton(d), np.uint32(0xFFFFFFFF))
    if pair is None:
        perm = jnp.argsort(key)
    else:
        dead = jnp.where(alive, pair, np.int32(0x7FFFFFFF))
        perm = jnp.lexsort((key, dead))
    inv_perm = _inv_permutation(perm)
    mag_eff = mag * (1.0 - 4e-6) - EPSILON
    al1 = alive[:, None]
    zhat = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    origins = jnp.where(al1, mic, _DEAD_ORIGIN)[perm]
    dirs = jnp.where(al1, d, zhat)[perm]
    bounds = jnp.where(alive, _sweep_bound(mag), 0.0)[perm]
    decide = jnp.where(alive, mag_eff, 0.0)[perm]
    return origins, dirs, bounds, decide, inv_perm, mag_eff


def _sweep_bound(mag):
    """Per-ray t_max for point-to-point sweeps (shadow rays, image path
    validation, image mic visibility): their verdicts depend only on hits
    at or slightly beyond the target distance `mag` —

      - visibility: a blocker found in (mag, bound] still reads as
        'beyond the target' (visible); one beyond the bound reads as
        'no hit' (also visible); blockers at t <= mag are inside the bound
      - segment validation: a closest hit past the segment endpoint fails
        the endpoint check whether it is found or culled

    so initialising the sweep's best-t at the bound changes no result
    while letting the kernel cull every triangle block beyond the target.
    The slack comfortably covers the EPSILON endpoint tolerance.
    """
    return mag * 1.001 + 0.01


def _direct_image(soup, mic, source, impl):
    """Slot-0 direct-path image impulse (kernel.cpp:335-357).

    Accepts one (3,) mic/source pair or batched (B, 3) pairs (multi-pair
    traces); returns per-pair (vol (…,8), pos (…,3), time (…,))."""
    single = jnp.ndim(mic) == 1
    mic2 = jnp.atleast_2d(mic)
    src2 = jnp.atleast_2d(source)
    diff = src2 - mic2
    dist = jnp.linalg.norm(diff, axis=-1)
    hit = closest_hit(
        src2,
        _safe_normalize(mic2 - src2),
        soup,
        impl=impl,
        t_max=_sweep_bound(dist),
    )
    vis = _visible_from_hit(hit, dist)
    vol = jnp.where(vis[:, None], _air_attenuation(dist), 0.0)
    pos = jnp.where(vis[:, None], mic2 + diff, 0.0)
    time = jnp.where(vis, SECONDS_PER_METER * dist, 0.0)
    if single:
        return vol[0], pos[0], time[0]
    return vol, pos, time


class _RayState(NamedTuple):
    pos: jax.Array       # (N, 3)
    dir: jax.Array       # (N, 3)
    distance: jax.Array  # (N,)
    volume: jax.Array    # (N, 8)
    alive: jax.Array     # (N,) bool
    # multi-pair traces only (None otherwise): per-row mic/source and the
    # row's source/receiver-pair index
    mic: jax.Array | None = None   # (N, 3)
    src: jax.Array | None = None   # (N, 3)
    pair: jax.Array | None = None  # (N,) int32


def _diffuse_impulse(soup, mic, state, hit, vis, t_safe):
    """Per-bounce diffuse Impulse fields (kernel.cpp:459-490).

    Returns (new state pieces, output row). `vis` is the mic shadow-ray
    verdict for the intersection point.
    """
    alive_new = state.alive & hit.hit
    intersection = state.pos + state.dir * t_safe[:, None]
    new_dist = state.distance + t_safe
    surf = soup.surface[hit.index]
    new_vol = -state.volume * soup.specular[surf]
    n = soup.normal[hit.index]
    to_mic_dist = jnp.linalg.norm(mic - intersection, axis=-1)
    DIST = jnp.where(vis, new_dist + to_mic_dist, 0.0)
    DIFF = jnp.abs(jnp.sum(n * state.dir, axis=-1))
    volume_out = (
        new_vol
        * _air_attenuation(DIST)
        * soup.diffuse[surf]
        * DIFF[:, None]
    )
    emit = (alive_new & vis)[:, None]
    volume_out = jnp.where(emit, volume_out, 0.0)
    position_out = jnp.where(alive_new[:, None], intersection, 0.0)
    time_out = jnp.where(alive_new & vis, SECONDS_PER_METER * DIST, 0.0)

    # reflect (kernel.cpp:129-139, 492-501)
    new_dir = state.dir - n * (2.0 * jnp.sum(state.dir * n, axis=-1, keepdims=True))
    next_state = _RayState(
        pos=jnp.where(alive_new[:, None], intersection, state.pos),
        dir=jnp.where(alive_new[:, None], new_dir, state.dir),
        distance=jnp.where(alive_new, new_dist, state.distance),
        volume=jnp.where(alive_new[:, None], new_vol, state.volume),
        alive=alive_new,
        mic=state.mic,
        src=state.src,
        pair=state.pair,
    )
    return next_state, alive_new, intersection, (volume_out, position_out, time_out)


def _trace_impl(
    soup: TriangleSoup,
    mic,
    source,
    directions,
    *,
    nreflections: int,
    impl: str = "auto",
    consume_row=None,
    aux0=None,
    nvalid=None,
    resort: bool = False,
    sweep_stats: bool = False,
    pair_id=None,
    seg_budget_rows: int | None = None,
):
    """The trace loop. With `consume_row=None`, collects every diffuse
    bounce row and returns TraceOutputs (the reference's dense impulse
    buffers). With a consumer, each (volume (N,8), position (N,3),
    time (N,)) row is folded into `aux` the moment it is produced —
    aux = consume_row(aux, row) — and the (N, R) impulse arrays never
    materialise; returns (aux, image-slot TraceOutputs fields).
    The fused renderer uses this to scatter rows straight into the energy
    histogram, which removes the need for ray chunking entirely.

    pair_id (N,) int32 (consume path only) puts the trace in MULTI-PAIR
    mode — the batched-datagen path that replaces the reference's
    one-process-per-render corpus loop (demo/gen.sh) with ONE program:
    `mic` and `source` become (B, 3) per-pair arrays, row i belongs to
    pair pair_id[i], and every sweep carries all B pairs' rays at full
    width (per-row mic/source ride _RayState).
    Consumed rows then carry two extra columns (mic_row (N,3),
    pair_row (N,)) so the consumer can attenuate and bin per pair, and
    the returned image slots line up with the ORIGINAL row order (use
    pair_id to attribute them).

    seg_budget_rows (static int, consume path only): cap on the rows a
    bounce's image-validation sweep may issue (see the phase-A g_cap
    comment). The consume path's return gains an `overflow` bool — True
    means some gate-passing ray was denied validation rows and the
    render must be re-run uncapped to be exact.

    nvalid (int32 scalar, consume path only): rays at or beyond this index
    are lane padding — their starting volume is zeroed so every impulse
    they would emit is dropped by the binner's nonzero check, with no
    per-row masking downstream.

    resort=True (consume path only) feeds each bounce sweep its rows in
    position-Morton/direction-octant sorted order (see _sorted_bounce_hit)
    — a sweep-local permutation, semantically invisible, that restores the
    tile coherence the kernel's AABB cull feeds on. The ray STATE stays in
    original row order throughout.
    """
    mic = jnp.asarray(mic, jnp.float32)
    source = jnp.asarray(source, jnp.float32)
    directions = jnp.asarray(directions, jnp.float32)
    n = directions.shape[0]
    aux = aux0
    overflow = jnp.bool_(False)
    if seg_budget_rows is not None:
        assert consume_row is not None, "seg budget requires the consume path"
    multi = pair_id is not None
    if multi:
        assert consume_row is not None, "multi-pair requires the consume path"
        pair_id = jnp.asarray(pair_id, jnp.int32)
    if resort:
        assert consume_row is not None, "resort requires the consume path"
        lo_b = soup.bounds[0]
        inv_span = 1.0 / jnp.maximum(soup.bounds[1] - soup.bounds[0], 1e-6)
        horizon = (
            _HORIZON_FRAC
            * jnp.linalg.norm(
                jnp.asarray(soup.bounds[1], jnp.float32)
                - jnp.asarray(soup.bounds[0], jnp.float32)
            )
            if _HORIZON_FRAC > 0
            else None
        )

    volume0 = jnp.ones((n, NUM_BANDS), jnp.float32)
    if nvalid is not None:
        assert consume_row is not None, "nvalid requires the consume path"
        volume0 = jnp.where(
            (jnp.arange(n) < nvalid)[:, None], volume0, 0.0
        )

    state = _RayState(
        pos=jnp.broadcast_to(source[pair_id] if multi else source, (n, 3)),
        dir=directions,
        distance=jnp.zeros((n,), jnp.float32),
        volume=volume0,
        alive=jnp.ones((n,), bool),
        mic=mic[pair_id] if multi else None,
        src=source[pair_id] if multi else None,
        pair=pair_id if multi else None,
    )

    stats = (
        {
            "bounce": jnp.float32(0),
            "shadow": jnp.float32(0),
            "seg": jnp.float32(0),
            "imgvis": jnp.float32(0),
        }
        if sweep_stats
        else None
    )

    def _hit(origins, dirs, t_max, st_acc, kinds, t_decide=None):
        """closest_hit + executed-pair attribution by row range. kinds =
        [(name, start_row, end_row), ...]. Both sweep impls report counts
        per 512-row group of the UNPADDED row order (padding rows only
        extend the final groups), so row ranges map to groups exactly;
        only non-512-aligned kind boundaries are approximate (ADVICE r3)."""
        if st_acc is None:
            return (
                closest_hit(
                    origins,
                    dirs,
                    soup,
                    impl=impl,
                    t_max=t_max,
                    t_decide=t_decide,
                ),
                None,
            )
        hit, counts = closest_hit(
            origins,
            dirs,
            soup,
            impl=impl,
            t_max=t_max,
            t_decide=t_decide,
            with_stats=True,
        )
        lanes = 512  # fixed stats-group width for every impl
        out = dict(st_acc)
        for name, s, e in kinds:
            out[name] = out[name] + jnp.sum(counts[s // lanes : -(-e // lanes)])
        return hit, out

    def _sorted_bounce_hit(pos, dirv, alive, st_acc, *, do_sort):
        """Closest-hit bounce sweep with SWEEP-LOCAL spatial sorting.

        Re-sorting between bounces restores the bundle coherence that
        specular reflection destroys — but only the 7 sweep inputs need
        the sorted order, and only the 3 hit outputs need unsorting. The
        r3 implementation permuted the whole ray state instead (volumes,
        ids, per-pair mic/source, and in the image phase the O(bounce)
        mirrored-chain planes — up to ~45 gathered floats per ray per
        bounce) and then scattered every emission back through carried
        ray ids; keeping the state in original row order deletes all of
        that per-bounce gather/scatter work while feeding the kernel the
        identical sorted populations. Dead rays park at _DEAD_ORIGIN with
        bound 0 exactly as before (their sort keys are their stale state,
        as in r3 — where they land among the tiles is irrelevant because
        zero-bound rows cull every block)."""
        o = jnp.where(alive[:, None], pos, _DEAD_ORIGIN)
        b = jnp.where(alive, jnp.inf, 0.0)
        if not (resort and do_sort):
            return _hit(o, dirv, b, st_acc, [("bounce", 0, n)])
        key = _ray_sort_key(pos, dirv, lo_b, inv_span)
        perm = jnp.argsort(key)
        if horizon is None:
            hs, st_acc = _hit(
                o[perm], dirv[perm], b[perm], st_acc, [("bounce", 0, n)]
            )
            inv = _inv_permutation(perm)
            return (
                Hit(t=hs.t[inv], index=hs.index[inv], hit=hs.hit[inv]),
                st_acc,
            )
        # horizon split (see the _HORIZON_FRAC comment): pass 1 caps every
        # ray's bound at h — a hit found under a t_max cap IS the true
        # closest (the cap only culls blocks that could not beat it)
        b1 = jnp.where(alive, horizon, 0.0)
        hs1, st_acc = _hit(
            o[perm], dirv[perm], b1[perm], st_acc, [("bounce", 0, n)]
        )
        inv = _inv_permutation(perm)
        h1 = Hit(t=hs1.t[inv], index=hs1.index[inv], hit=hs1.hit[inv])
        unresolved = alive & ~h1.hit
        # pass 2: unresolved rays partition to the front (sorted by the
        # same spatial key among themselves); everyone else parks dead, so
        # nearly all pass-2 tiles cull outright
        key2 = jnp.where(unresolved, key, np.uint32(0xFFFFFFFF))
        perm2 = jnp.argsort(key2)
        u = unresolved[perm2]
        hs2, st_acc = _hit(
            jnp.where(u[:, None], pos[perm2], _DEAD_ORIGIN),
            dirv[perm2],
            jnp.where(u, jnp.inf, 0.0),
            st_acc,
            [("bounce", 0, n)],
        )
        inv2 = _inv_permutation(perm2)
        h2 = Hit(t=hs2.t[inv2], index=hs2.index[inv2], hit=hs2.hit[inv2])
        return (
            Hit(
                t=jnp.where(unresolved, h2.t, h1.t),
                index=jnp.where(unresolved, h2.index, h1.index),
                hit=jnp.where(unresolved, h2.hit, h1.hit),
            ),
            st_acc,
        )

    # ---- direct path (image slot 0), identical for every ray of a pair
    # (one B-row sweep in multi mode, gathered back onto rows) ----
    d_vol, d_pos, d_time = _direct_image(soup, mic, source, impl)
    if multi:
        image_vol = [d_vol[pair_id]]
        image_pos = [d_pos[pair_id]]
        image_time = [d_time[pair_id]]
    else:
        image_vol = [jnp.broadcast_to(d_vol, (n, NUM_BANDS))]
        image_pos = [jnp.broadcast_to(d_pos, (n, 3))]
        image_time = [jnp.broadcast_to(d_time, (n,))]
    image_idx = [jnp.zeros((n,), jnp.int32)]

    mic_reflection = jnp.broadcast_to(
        state.mic if multi else mic, (n, 3)
    )
    prev_tris: list = []  # mirrored triangle chain, grows per unrolled bounce

    diffuse_rows = []

    # ---- phase A: bounces that participate in the image-source search ----
    n_image_bounces = min(nreflections, NUM_IMAGE_SOURCE - 1)
    for index in range(n_image_bounces):
        # per-row mic/source (multi-pair mode); (3,)-broadcast otherwise —
        # downstream math is shape-agnostic
        smic = state.mic if multi else mic
        ssrc = state.src if multi else source
        src_col = jnp.broadcast_to(ssrc, (n, 3))[:, None, :]
        # dead rays (shot into empty space, kernel.cpp:372-375) keep their
        # state forever; parking their sweep rows far outside the scene
        # with bound 0 lets the kernel cull every triangle block for them.
        # Bounce 0 rides the caller's Morton direction sort (all origins
        # coincide at the source), later bounces sort sweep-locally.
        bounce, stats = _sorted_bounce_hit(
            state.pos, state.dir, state.alive, stats, do_sort=index > 0
        )
        t_safe = jnp.where(bounce.hit, bounce.t, 0.0)
        alive_new = state.alive & bounce.hit
        intersection = state.pos + state.dir * t_safe[:, None]

        # mirror the hit triangle through the accumulated chain
        # (kernel.cpp:379-394)
        cur = soup.verts(bounce.index)
        for plane in prev_tris:
            cur = _mirror_tri(cur, plane)
        prev_tris = prev_tris + [cur]
        mic_reflection_new = _mirror_point(mic_reflection, cur)

        # image-source path validation (kernel.cpp:396-429):
        # all segments are checked in one batch; the AND is identical to the
        # reference's early-exit loop.
        DIR = _safe_normalize(mic_reflection_new - ssrc)
        chain = jnp.stack(prev_tris, axis=1)            # (N, k+1, 3, 3)
        t_k = intersect_triangle(src_col, DIR[:, None, :], chain)
        seg_front = t_k > EPSILON                        # (N, k+1)
        k1 = index + 1
        to_mic_diffuse = smic - intersection
        mag_diffuse = jnp.linalg.norm(to_mic_diffuse, axis=-1)

        # cheap admission gate (EXACT): emitting this bounce's image needs
        # all(seg_ok), and seg_ok <= seg_front, which cost only the k+1
        # single-triangle tests above — no scene sweep. Rays failing it
        # (the vast majority after a couple of bounces) cannot emit no
        # matter what the occlusion sweeps below would say, so their
        # segment + image-visibility rows are neutralized and sorted to
        # the tail of the row population, where whole lane-tiles cull
        # every triangle block. The reference re-attempts validation at
        # every bounce (kernel.cpp:396-429 resets `intersects = true`), so
        # this must be — and is — a per-bounce implication, never a
        # carried dead-chain flag.
        maybe = alive_new & jnp.all(seg_front, axis=-1)
        # stable partition (gated-in rays pack first) via two cumsums +
        # one scatter — the row destination IS the inverse permutation,
        # so this replaces argsort(~maybe) + a second sort with O(n) work
        csum = jnp.cumsum(maybe.astype(jnp.int32))
        inv_perm = jnp.where(
            maybe, csum - 1, csum[-1] + jnp.cumsum((~maybe).astype(jnp.int32)) - 1
        )
        perm = _inv_permutation(inv_perm)
        zhat = jnp.array([0.0, 0.0, 1.0], jnp.float32)

        # static row cap for the validation population: gate-passing rays
        # collapse to <<1% after a few bounces on large scenes, yet their
        # DEAD sweep rows still cost ~1us of grid sequencing per tile-step
        # (measured r4) — so later bounces only issue rows for the first
        # g_cap gated rays and flag overflow when the gate admits more
        # (the caller re-runs the uncapped program; see render_fused).
        if seg_budget_rows is not None and k1 >= 3:
            g_cap = min(n, max(512, seg_budget_rows) // (k1 + 1))
        else:
            g_cap = n
        sel = perm[:g_cap]
        if g_cap < n:
            in_cap = inv_perm < g_cap
            overflow = overflow | jnp.any(maybe & ~in_cap)

        # the O(k^2) un-mirroring and all segment geometry run COMPACTED
        # to the g_cap admitted rows: the admission gate above needs only
        # t_k, so everything downstream of it — mirrored-space hits,
        # world-space un-mirrors, segment vectors, the image
        # mic-visibility geometry, and the post-sweep endpoint checks —
        # is gathered onto sel once and computed at g_cap width instead
        # of full width (3-10x fewer rows at north-star scale; exact: the
        # rows left behind could only ever produce img_ok = False).
        maybe_s = maybe[sel]                              # (g_cap,)
        src_col_s = src_col[sel]                          # (g_cap, 1, 3)
        DIR_s = DIR[sel]
        t_k_s = t_k[sel]                                  # (g_cap, k+1)
        chain_s = chain[sel]                              # (g_cap, k+1, 3, 3)
        ip_s = src_col_s + DIR_s[:, None, :] * t_k_s[..., None]
        # un-mirror each segment point back to world space through planes
        # l = k-1 .. 0 (kernel.cpp:412-414)
        ip_world_cols = []
        for k in range(index + 1):
            p = ip_s[:, k]
            for l in range(k - 1, -1, -1):
                p = _mirror_point(p, chain_s[:, l])
            ip_world_cols.append(p)
        ip_world_s = jnp.stack(ip_world_cols, axis=1)     # (g_cap, k+1, 3)
        prev_pts_s = jnp.concatenate(
            [src_col_s, ip_world_s[:, :-1]], axis=1
        )
        seg_vec_s = ip_world_s - prev_pts_s
        seg_dir_s = _safe_normalize(seg_vec_s)
        seg_len_s = jnp.linalg.norm(seg_vec_s, axis=-1)
        final_ip_s = ip_world_s[:, index]
        smic_s = smic[sel] if multi else smic
        to_mic_image_s = smic_s - final_ip_s
        mag_image_s = jnp.linalg.norm(to_mic_image_s, axis=-1)
        g1 = maybe_s[:, None]
        g2 = maybe_s[:, None, None]

        seg_origin = jnp.where(g2, prev_pts_s, _DEAD_ORIGIN)
        seg_d = jnp.where(g2, seg_dir_s, zhat)
        seg_bound = jnp.where(g1, _sweep_bound(seg_len_s), 0.0)
        img_origin = jnp.where(g1, final_ip_s, _DEAD_ORIGIN)
        img_d = jnp.where(g1, _safe_normalize(to_mic_image_s), zhat)
        img_bound = jnp.where(maybe_s, _sweep_bound(mag_image_s), 0.0)
        # a dead ray's shadow verdict is never read (emit = alive & vis)
        if _SHADOW_REVERSED:
            (
                sh_origin,
                sh_d,
                sh_bound,
                sh_decide,
                sh_inv,
                sh_mag_eff,
            ) = _shadow_rows(
                smic, intersection, alive_new, mag_diffuse, pair=state.pair
            )
        else:
            al1 = alive_new[:, None]
            sh_origin = jnp.where(al1, intersection, _DEAD_ORIGIN)
            sh_d = jnp.where(al1, _safe_normalize(to_mic_diffuse), zhat)
            sh_bound = jnp.where(alive_new, _sweep_bound(mag_diffuse), 0.0)
            sh_decide = jnp.where(alive_new, mag_diffuse, 0.0)

        origins = jnp.concatenate(
            [sh_origin, seg_origin.reshape(g_cap * k1, 3), img_origin], axis=0
        )
        dirs = jnp.concatenate(
            [sh_d, seg_d.reshape(g_cap * k1, 3), img_d], axis=0
        )
        bounds = jnp.concatenate(
            [sh_bound, seg_bound.reshape(g_cap * k1), img_bound], axis=0
        )
        # any-hit decide thresholds: shadow + image-visibility rows only
        # read a verdict; validation segments need the true closest hit
        # (their endpoint-match check) so they stay exact (decide 0)
        decide = jnp.concatenate(
            [
                sh_decide,
                jnp.zeros((g_cap * k1,), jnp.float32),
                jnp.where(maybe_s, mag_image_s, 0.0),
            ],
            axis=0,
        )
        sweep, stats = _hit(
            origins,
            dirs,
            bounds,
            stats,
            [
                ("shadow", 0, n),
                ("seg", n, n + g_cap * k1),
                ("imgvis", n + g_cap * k1, n + g_cap * (k1 + 1)),
            ],
            t_decide=decide,
        )
        # validation results stay at g_cap width; only the final boolean
        # verdict scatters back onto full-width rows (rays beyond the cap
        # read "not validated"; overflow re-runs)
        seg_t_s = sweep.t[n : n + g_cap * k1].reshape(g_cap, k1)
        seg_hit_s = sweep.hit[n : n + g_cap * k1].reshape(g_cap, k1)
        imgvis_t_s = sweep.t[n + g_cap * k1 :]
        imgvis_hit_s = sweep.hit[n + g_cap * k1 :]

        if _SHADOW_REVERSED:
            h_shadow = Hit(
                sweep.t[:n][sh_inv], sweep.index[:n][sh_inv], sweep.hit[:n][sh_inv]
            )
            vis = _visible_from_hit(h_shadow, sh_mag_eff)
        else:
            h_shadow = Hit(sweep.t[:n], sweep.index[:n], sweep.hit[:n])
            vis = _visible_from_hit(h_shadow, mag_diffuse)

        # validation: the scene hit along each segment must land on the
        # segment's endpoint (kernel.cpp:418-428)
        new_ip_s = (
            prev_pts_s
            + seg_dir_s * jnp.where(seg_hit_s, seg_t_s, 0.0)[..., None]
        )
        seg_ok_s = (
            (t_k_s > EPSILON)
            & seg_hit_s
            & jnp.all(jnp.abs(new_ip_s - ip_world_s) < EPSILON, axis=-1)
        )
        img_vis_s = _visible_from_hit(
            Hit(
                imgvis_t_s,
                jnp.zeros_like(imgvis_t_s, jnp.int32),
                imgvis_hit_s,
            ),
            mag_image_s,
        )
        img_ok_s = maybe_s & jnp.all(seg_ok_s, axis=-1) & img_vis_s
        img_ok = (
            jnp.zeros((n,), bool).at[sel].set(img_ok_s, unique_indices=True)
        )

        # emit the image impulse with the PRE-bounce volume
        # (kernel.cpp:442-455; volume updated only afterwards at :501)
        init_diff = ssrc - mic_reflection_new
        init_dist = jnp.linalg.norm(init_diff, axis=-1)
        image_vol.append(
            jnp.where(
                img_ok[:, None],
                state.volume * _air_attenuation(init_dist),
                0.0,
            )
        )
        image_pos.append(jnp.where(img_ok[:, None], smic + init_diff, 0.0))
        image_time.append(
            jnp.where(img_ok, SECONDS_PER_METER * init_dist, 0.0)
        )
        image_idx.append(
            jnp.where(img_ok, bounce.index.astype(jnp.int32) + 1, 0)
        )

        mic_reflection = mic_reflection_new
        state, alive_new, intersection, row = _diffuse_impulse(
            soup, smic, state, bounce, vis, t_safe
        )
        if consume_row is None:
            diffuse_rows.append(row)
        else:
            if multi:
                # rows carry their (current-order) mic + pair so the
                # consumer can attenuate and bin per pair
                row = row + (state.mic, state.pair)
            aux = consume_row(aux, row)

    # ---- phase B: pure diffuse bounces (no image-source bookkeeping) ----
    # (A pipelined variant merging each bounce's shadow ray into the next
    # bounce's sweep was benchmarked 12% SLOWER on v5e — the larger scan
    # carry cost more than the halved launch count bought.)
    n_tail = nreflections - n_image_bounces
    tail_vol = tail_pos = tail_time = None
    if n_tail > 0:

        def step(carry, _):
            st, ax, st_acc = carry
            smic = st.mic if multi else mic
            bounce, st_acc = _sorted_bounce_hit(
                st.pos, st.dir, st.alive, st_acc, do_sort=True
            )
            t_safe = jnp.where(bounce.hit, bounce.t, 0.0)
            intersection = st.pos + st.dir * t_safe[:, None]
            alive2 = st.alive & bounce.hit
            to_mic = smic - intersection
            mag = jnp.linalg.norm(to_mic, axis=-1)
            if _SHADOW_REVERSED:
                (
                    sh_origin,
                    sh_d,
                    sh_bound,
                    sh_decide,
                    sh_inv,
                    sh_mag_eff,
                ) = _shadow_rows(smic, intersection, alive2, mag, pair=st.pair)
                shadow, st_acc = _hit(
                    sh_origin,
                    sh_d,
                    sh_bound,
                    st_acc,
                    [("shadow", 0, n)],
                    t_decide=sh_decide,
                )
                vis = _visible_from_hit(
                    Hit(shadow.t[sh_inv], shadow.index[sh_inv], shadow.hit[sh_inv]),
                    sh_mag_eff,
                )
            else:
                shadow, st_acc = _hit(
                    jnp.where(alive2[:, None], intersection, _DEAD_ORIGIN),
                    _safe_normalize(to_mic),
                    jnp.where(alive2, _sweep_bound(mag), 0.0),
                    st_acc,
                    [("shadow", 0, n)],
                    t_decide=jnp.where(alive2, mag, 0.0),
                )
                vis = _visible_from_hit(shadow, mag)
            st2, _, _, row = _diffuse_impulse(soup, smic, st, bounce, vis, t_safe)
            if consume_row is None:
                return (st2, ax, st_acc), row
            if multi:
                row = row + (st2.mic, st2.pair)
            return (st2, consume_row(ax, row), st_acc), None

        (state, aux, stats), tail_rows = jax.lax.scan(
            step, (state, aux, stats), None, length=n_tail
        )
        if consume_row is None:
            tail_vol, tail_pos, tail_time = tail_rows

    # pad image slots when nreflections < NUM_IMAGE_SOURCE - 1
    while len(image_vol) < NUM_IMAGE_SOURCE:
        image_vol.append(jnp.zeros((n, NUM_BANDS), jnp.float32))
        image_pos.append(jnp.zeros((n, 3), jnp.float32))
        image_time.append(jnp.zeros((n,), jnp.float32))
        image_idx.append(jnp.zeros((n,), jnp.int32))

    images = (
        jnp.stack(image_vol, axis=1),
        jnp.stack(image_pos, axis=1),
        jnp.stack(image_time, axis=1),
        jnp.stack(image_idx, axis=1),
    )

    if consume_row is not None:
        if sweep_stats:
            return aux, images, overflow, stats
        return aux, images, overflow

    head_vol = jnp.stack([r[0] for r in diffuse_rows], axis=1) if diffuse_rows else None
    head_pos = jnp.stack([r[1] for r in diffuse_rows], axis=1) if diffuse_rows else None
    head_time = jnp.stack([r[2] for r in diffuse_rows], axis=1) if diffuse_rows else None

    def _join(head, tail, move):
        parts = []
        if head is not None:
            parts.append(head)
        if tail is not None:
            parts.append(jnp.moveaxis(tail, 0, 1) if move else tail)
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)

    return TraceOutputs(
        diffuse_volume=_join(head_vol, tail_vol, True),
        diffuse_position=_join(head_pos, tail_pos, True),
        diffuse_time=_join(head_time, tail_time, True),
        image_volume=images[0],
        image_position=images[1],
        image_time=images[2],
        image_index=images[3],
    )


@partial(jax.jit, static_argnames=("nreflections", "impl"))
def trace_chunk(
    soup: TriangleSoup,
    mic,
    source,
    directions,
    *,
    nreflections: int,
    impl: str = "auto",
) -> TraceOutputs:
    """Trace one chunk of rays end to end (jitted; N and R static)."""
    return _trace_impl(
        soup, mic, source, directions, nreflections=nreflections, impl=impl
    )


def trace(
    scene_or_soup,
    mic,
    source,
    directions,
    nreflections: int,
    *,
    ray_chunk: int = DEFAULT_RAY_CHUNK,
    impl: str = "auto",
) -> TraceOutputs:
    """Host driver: chunk rays (the reference's RAY_GROUP_SIZE batching,
    rayverb.cpp:587-684) through the jitted trace and reassemble.

    Unlike the reference, chunking exists purely to bound device memory; the
    chunk size never changes results.
    """
    soup = (
        scene_or_soup
        if isinstance(scene_or_soup, TriangleSoup)
        else soup_from_scene(scene_or_soup)
    )
    directions = np.asarray(directions, dtype=np.float32)
    n = directions.shape[0]
    if n == 0:
        raise ValueError("need at least one ray")

    if n <= ray_chunk:
        return trace_chunk(
            soup, mic, source, directions, nreflections=nreflections, impl=impl
        )

    # pad to a chunk multiple so one compiled program serves every chunk
    nchunks = -(-n // ray_chunk)
    padded = nchunks * ray_chunk
    if padded != n:
        pad_dirs = np.zeros((padded - n, 3), dtype=np.float32)
        pad_dirs[:, 2] = 1.0
        directions = np.concatenate([directions, pad_dirs], axis=0)

    # chunk outputs stay on device: host<->device transfers are the real
    # bottleneck on tunneled TPU backends, so only the caller decides when
    # (and whether) results ever leave HBM
    pieces = [
        trace_chunk(
            soup,
            mic,
            source,
            directions[c * ray_chunk : (c + 1) * ray_chunk],
            nreflections=nreflections,
            impl=impl,
        )
        for c in range(nchunks)
    ]
    return TraceOutputs(
        *[jnp.concatenate([p[i] for p in pieces], axis=0)[:n] for i in range(7)]
    )
