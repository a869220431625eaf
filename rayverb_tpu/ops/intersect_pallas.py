"""Pallas TPU kernel for the closest-hit sweep — the framework's hot loop.

Replaces the reference's per-work-item triangle loop
(ray_triangle_intersection, reference rayverb/kernel.cpp:161-192) with a
hierarchically-culled tiled (triangle-block x ray-block) sweep:

  - grid (ray_blocks, tri_blocks), triangle axis minormost: each ray
    block's running (best_t, best_index) output block stays VMEM-resident
    across the whole triangle sweep (standard reduction-grid pattern)
  - triangle blocks are visited NEAR-TO-FAR from the sweep's mean origin
    (a scalar-prefetched traversal order drives the block index_map), so
    the running best-t bound culls most far blocks after the first hits
    resolve — the front-to-back early-out of a classic ray tracer,
    expressed as a data-driven Pallas grid walk
  - triangles arrive Morton-ordered (intersect.build_sweep_table) so every
    TRI_BLOCK-row grid step is spatially compact and carries a conservative
    AABB. Each step slab-tests the ray block against its AABB — bounded
    above by the per-ray running best t — and SKIPS the whole
    Möller-Trumbore tile unless some ray could improve. This is the
    acceleration structure the reference never had (its sweep is explicitly
    brute force); culling is conservative, so results are bit-identical to
    the XLA reference sweep. (Variants measured on v5e: sub-block loops via
    lax.fori_loop + pl.when inside one big tile ran 7x SLOWER than the
    plain grid — dynamic control flow defeats Mosaic's pipelining — and a
    16x unrolled sub-block tile blew the 16 MB scoped-VMEM stack.)
  - pair planes are laid out (TRI_BLOCK sublanes, LANE_GATE lanes):
    triangle constants broadcast from (TB, 1) columns, ray components from
    (1, L) rows — no transposes inside the kernel. Within a surviving
    sub-block the per-pair math is additionally gated per LANE_GATE-lane
    chunk, so cull granularity is 128 rays even at RAY_BLOCK=512.
  - the pair test uses precomputed Woop unit-triangle transforms
    (build_sweep_table): three affine forms recover the exact
    Möller–Trumbore (t, u, v) with ~30% fewer flops, and the degeneracy
    term n.d IS the Möller–Trumbore determinant, so tolerances are the
    reference's own (|det| < EPSILON, strict barycentric bounds,
    t > EPSILON) — results agree with the XLA MT sweep to float32
    rounding (~1e-6 relative on t; identical verdicts away from
    knife-edge geometry). Original triangle indices ride in packed[:, 9],
    and ties resolve to the lowest ORIGINAL index — the reference's
    strict '<' update order (kernel.cpp:176-190) — despite the Morton
    reordering.

Padding: rays are padded with +inf-miss rows, triangles with zero rows
(n.d == 0 -> degenerate -> rejected), so block alignment never changes
results.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EPSILON

# Tile sizes: lanes (rays) must be a multiple of 128, sublanes (triangles)
# a multiple of 8. (TB, RB) f32 planes of 512x512 = 1 MB; the kernel keeps
# ~8 live planes well under the ~16 MB VMEM budget. TRI_BLOCK must match
# the soup's sweep-table block (intersect.SWEEP_BLOCK).
from .intersect import SWEEP_BLOCK as TRI_BLOCK

import os as _os

# Lanes (rays) per tile. 128 = native VPU lane width = the finest cull
# granularity: each tile's swept corridor is the union of its rays'
# corridors, so fewer rays per tile -> smaller executed block set per
# tile (at more grid steps, which TRI_SUBS batching absorbs).
RAY_BLOCK = int(_os.environ.get("RAYVERB_RAY_BLOCK", "512"))

# Traversal orders are shared per 512-ray GROUP regardless of RAY_BLOCK:
# the (super-steps, groups) order table must fit SMEM (1 MB), and order
# quality at 512-ray granularity is indistinguishable — only the cull
# (slab `possible`) needs the finer tile. Rays are padded to 512-row
# multiples, so RAY_BLOCK must divide the group evenly (ADVICE r3).
ORDER_GROUP_RAYS = 512

# SMEM budget for the scalar-prefetched order table. Mosaic pads the
# table's minor dim to 128 lanes and SMEM is 1 MB total (order + live
# flags + register spills); a (groups, steps) layout at 1M sweep rows x
# 64 super-steps padded 64->128 lanes was EXACTLY 1.00 MB and the
# compile died 9 KB over budget. The table is therefore laid out
# (steps, groups) — the groups axis is the large one and lane padding
# on it is cheap — and when even that exceeds this budget the order
# granularity coarsens to 1024/2048/...-ray groups (quality loss is
# marginal: neighbouring 512-groups share octant-major sort locality).
SMEM_ORDER_BYTES = 512 * 1024
if RAY_BLOCK < 128 or ORDER_GROUP_RAYS % RAY_BLOCK:
    raise ValueError(
        f"RAYVERB_RAY_BLOCK={RAY_BLOCK} must be a >=128 divisor of "
        f"{ORDER_GROUP_RAYS} (rays are padded to {ORDER_GROUP_RAYS}-row "
        "multiples and lanes come in 128s)"
    )
_OG = ORDER_GROUP_RAYS // RAY_BLOCK

# Sub-blocks per grid step: each step carries TRI_SUBS x TRI_BLOCK
# triangle rows and slab-tests all TRI_SUBS sub-AABBs as ONE vectorized
# (TRI_SUBS, RAY_BLOCK) computation, then runs Möller-Trumbore only for
# sub-blocks some ray can improve in. Culling granularity stays at
# TRI_BLOCK; what shrinks is the number of grid steps (fixed per-step
# cost, DMA batches) and the VPU waste of (1, RB)-shaped slab math —
# measured on the 100k-tri hall probe, ~75% of steps cull everything, so
# per-step overhead was the bottleneck once the admission gates starved
# the Möller-Trumbore work itself. Per sweep the effective value clamps
# to the scene's block count (small scenes keep their compiled programs).
# Default 32 pairs with SWEEP_BLOCK=128 to keep 4096 triangle rows per
# grid step — the r4 granularity sweep's 1M-ray optimum (see the ladder
# in docs/perf.md: (128, 32) 17.1 s / (256, 16) 18.9 s / (64, 64) 18.9 s).
TRI_SUBS = int(_os.environ.get("RAYVERB_TRI_SUBS", "32"))

# Minimum grid steps per sweep: caps the per-sweep effective TRI_SUBS at
# blocks/MIN_SWEEP_STEPS so small scenes keep a near-to-far traversal
# instead of collapsing into one brute-force step (see closest_hit_pallas).
MIN_SWEEP_STEPS = int(_os.environ.get("RAYVERB_MIN_STEPS", "4"))

# Lanes per Woop-evaluation gate: inside a surviving sub-block, the
# per-pair work can additionally run per LANE_GATE-lane chunk, each chunk
# skipped outright unless one of ITS rays could improve — decoupling CULL
# granularity from the RAY_BLOCK tile size. Measured on the v5e 64k-ray
# hall probe: LANE_GATE=128 cut executed pairs 1.6x (49 G -> 31 G) but ran
# 1.6x SLOWER (3.1 s -> 5.0 s trace) — 16 pl.when regions per grid step
# cost more than the culled Woop work saved (in-tile branching defeats
# Mosaic's pipelining, the same lesson as r2's fori_loop variant). Default
# therefore stays at whole-tile gating; the chunked path is kept behind
# this env for re-evaluation on future toolchains.
LANE_GATE = int(_os.environ.get("RAYVERB_LANE_GATE", str(RAY_BLOCK)))
if RAY_BLOCK % LANE_GATE or LANE_GATE % 128:
    raise ValueError(
        f"RAYVERB_LANE_GATE={LANE_GATE} must be a multiple of 128 dividing "
        f"RAY_BLOCK={RAY_BLOCK}"
    )

_BIG_I32 = np.int32(0x7FFFFFFF)


def _kernel(
    order_ref,
    live_ref,
    aabb_ref,
    super_ref,
    rays_ref,
    tmax_ref,
    decide_ref,
    tris_ref,
    best_t_ref,
    best_i_ref,
    cnt_ref=None,
    *,
    og=_OG,
    subs=TRI_SUBS,
    rblk=RAY_BLOCK,
    lgate=LANE_GATE,
):
    # order_ref (n super steps, ray groups) and live_ref (ray tiles,) are
    # scalar-prefetched (SMEM-resident). order_ref holds a PER-RAY-TILE
    # near-to-far traversal order of the TRI_STEP-row super-blocks from
    # that tile's own mean origin: each tile visits its close blocks
    # first, so its running best-t bound skips most of the remaining
    # blocks' Möller-Trumbore work — front-to-back traversal, the way a
    # BVH ray tracer earns its keep, localized per 512-ray bundle. The
    # final (best_t, best_i) is order-independent (ties resolve by
    # original index), so any traversal order is correct; a good one is
    # just faster. live_ref marks ray tiles with at least one row of
    # positive bound: dead tiles (padding, or rows neutralized by the
    # trace's admission gates) skip slab tests AND their triangle DMAs
    # (the index_map pins them to super-block 0, so the pipeline never
    # re-fetches). aabb_ref is the WHOLE (nb, 8) AABB table, VMEM-resident
    # across the sweep (constant index map -> one DMA); each step slices
    # its TRI_SUBS sub-block rows so all sub-blocks slab-test in one
    # vectorized (TRI_SUBS, RAY_BLOCK) computation.
    rb = pl.program_id(0)
    tb = pl.program_id(1)
    ob = order_ref[tb, rb // og]

    @pl.when(tb == 0)
    def _init():
        # best_t starts at the caller's per-ray bound (inf for open-ended
        # closest-hit; the target distance for point-to-point queries, so
        # every block beyond the target culls immediately). best_i = -1
        # marks "no hit yet" — a kept hit always has a real index.
        best_t_ref[...] = tmax_ref[...]
        best_i_ref[...] = jnp.full_like(best_i_ref, -1)
        if cnt_ref is not None:
            cnt_ref[...] = jnp.zeros_like(cnt_ref)

    live = live_ref[rb] > 0

    # ray components: (1, RB) rows; inverse direction components are
    # precomputed host-side (rows 6:9) so no step pays the VPU divides
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    ivx = rays_ref[6:7, :]
    ivy = rays_ref[7:8, :]
    ivz = rays_ref[8:9, :]

    def slab_axis(o, dv, iv, lo, hi):
        # lo/hi are (k, 1) columns; o/dv/iv are (1, RB) rows — a step's
        # sub-AABB tests happen as (k, RB) vector ops (iv carries +-inf on
        # zero components; the select keeps those exact)
        near = (lo - o) * iv
        far = (hi - o) * iv
        tn = jnp.minimum(near, far)
        tf = jnp.maximum(near, far)
        zero = jnp.abs(dv) < 1e-30
        inside = (o >= lo) & (o <= hi)
        tn = jnp.where(zero, jnp.where(inside, -jnp.inf, jnp.inf), tn)
        tf = jnp.where(zero, jnp.where(inside, jnp.inf, -jnp.inf), tf)
        return tn, tf

    # a triangle hit t lies within [tn, tf]; only blocks that could beat
    # the running best (ties included — a tie may resolve to a lower
    # original index) and clear the t > EPSILON gate matter. best_t is
    # taken at step entry: a within-step update could cull later
    # sub-blocks slightly harder, but conservatism only costs work.
    # decide_ref (any-hit mode, per row): once a visibility row's running
    # best drops strictly below its decide threshold, its verdict
    # ("blocker before the target") is locked — the row stops pulling
    # blocks in. Rows with decide 0 (closest-hit semantics) never lock.
    undecided = best_t_ref[...] >= decide_ref[...]  # (1, RB)

    # hierarchical gate: ONE (1, RB) slab test against the step's SUPER
    # AABB (the union of its TRI_SUBS sub-blocks) decides whether the
    # (subs, RB) sub-AABB slab math runs at all. ~75% of steps cull
    # everything (measured on the hall), so the super test turns the
    # dominant per-step fixed cost from subs x RB ops into RB ops. The
    # sub tests are subsets of the super test (interval containment), so
    # results and executed-pair counters are bit-identical.
    sab = super_ref[pl.ds(ob, 1), :]  # (1, 8)
    tnsx, tfsx = slab_axis(ox, dx, ivx, sab[:, 0:1], sab[:, 3:4])
    tnsy, tfsy = slab_axis(oy, dy, ivy, sab[:, 1:2], sab[:, 4:5])
    tnsz, tfsz = slab_axis(oz, dz, ivz, sab[:, 2:3], sab[:, 5:6])
    tns = jnp.maximum(jnp.maximum(tnsx, tnsy), tnsz)
    tfs = jnp.minimum(jnp.minimum(tfsx, tfsy), tfsz)
    sup = (
        live
        & (tfs >= jnp.maximum(tns, EPSILON))
        & (tns <= best_t_ref[...])
        & undecided
    )  # (1, RB)

    # the sub-block/lane-chunk regions nest under one per-STEP region:
    # fully-culled steps (the majority — dead tiles and resolved
    # corridors) evaluate ONE branch instead of subs x chunks. Measured
    # region-entry cost is ~0.1-0.2 us (the LANE_GATE=128 experiment:
    # 4x regions cost ~2 s on the 64k probe), so collapsing ~75% of the
    # ~1M regions per 1M-row sweep is seconds at north-star scale.
    @pl.when(jnp.any(sup))
    def _step():
        ab = aabb_ref[pl.ds(ob * subs, subs), :]  # (subs, 8)
        tnx, tfx = slab_axis(ox, dx, ivx, ab[:, 0:1], ab[:, 3:4])
        tny, tfy = slab_axis(oy, dy, ivy, ab[:, 1:2], ab[:, 4:5])
        tnz, tfz = slab_axis(oz, dz, ivz, ab[:, 2:3], ab[:, 5:6])
        tn = jnp.maximum(jnp.maximum(tnx, tny), tnz)
        tf = jnp.minimum(jnp.minimum(tfx, tfy), tfz)
        possible = (
            live
            & (tf >= jnp.maximum(tn, EPSILON))
            & (tn <= best_t_ref[...])
            & undecided
        )  # (TRI_SUBS, RB)
        for j in range(subs):
            sub = slice(j * TRI_BLOCK, (j + 1) * TRI_BLOCK)
            for c in range(rblk // lgate):
                lanes = slice(c * lgate, (c + 1) * lgate)

                @pl.when(jnp.any(possible[j, lanes]))
                def _mt(sub=sub, lanes=lanes):
                    if cnt_ref is not None:
                        # SURVIVING (executed) TRI_BLOCK x LANE_GATE units,
                        # broadcast across the chunk's lanes — the post-cull
                        # work observability SURVEY.md §5 calls for
                        cnt_ref[0:1, lanes] = cnt_ref[0:1, lanes] + 1
                    # triangle transform constants: (TB, 1) columns
                    # (build_sweep_table packs [row_u, row_v, n, idx, bu bv bw])
                    aux = tris_ref[sub, 0:1]
                    auy = tris_ref[sub, 1:2]
                    auz = tris_ref[sub, 2:3]
                    avx = tris_ref[sub, 3:4]
                    avy = tris_ref[sub, 4:5]
                    avz = tris_ref[sub, 5:6]
                    nx = tris_ref[sub, 6:7]
                    ny = tris_ref[sub, 7:8]
                    nz = tris_ref[sub, 8:9]
                    oidx = tris_ref[sub, 9:10].astype(jnp.int32)  # original idx
                    bu = tris_ref[sub, 10:11]
                    bv = tris_ref[sub, 11:12]
                    bw = tris_ref[sub, 12:13]

                    # fresh (1, LANE_GATE) loads straight from the ref: slicing
                    # the already-loaded (1, RAY_BLOCK) vectors instead gives
                    # Mosaic an offset-lane layout it cannot broadcast to the
                    # (TB, LANE_GATE) planes ("Invalid input layout")
                    oxl = rays_ref[0:1, lanes]
                    oyl = rays_ref[1:2, lanes]
                    ozl = rays_ref[2:3, lanes]
                    dxl = rays_ref[3:4, lanes]
                    dyl = rays_ref[4:5, lanes]
                    dzl = rays_ref[5:6, lanes]

                    # barycentric-space ray: three affine forms for the origin,
                    # three linear for the direction — (TB, LANE_GATE) planes
                    ou = aux * oxl + auy * oyl + auz * ozl + bu
                    ov = avx * oxl + avy * oyl + avz * ozl + bv
                    ow = nx * oxl + ny * oyl + nz * ozl + bw
                    du = aux * dxl + auy * dyl + auz * dzl
                    dv = avx * dxl + avy * dyl + avz * dzl
                    dw = nx * dxl + ny * dyl + nz * dzl

                    # dw = n.d = -det(Möller–Trumbore): the reference's own
                    # |det| < EPSILON degeneracy rejection (kernel.cpp:68-70)
                    degenerate = jnp.abs(dw) < EPSILON
                    t = -ow / jnp.where(degenerate, 1.0, dw)
                    u = ou + t * du
                    v = ov + t * dv

                    valid = (
                        (~degenerate)
                        & (u >= 0.0) & (u <= 1.0)
                        & (v >= 0.0) & (u + v <= 1.0)
                        & (t > EPSILON)
                    )
                    t = jnp.where(valid, t, jnp.inf)

                    # per-ray reduction over the triangle sublanes; ties keep
                    # the lowest original triangle index (reference strict '<'
                    # update)
                    tmin = jnp.min(t, axis=0, keepdims=True)    # (1, LANE_GATE)
                    cand = jnp.min(
                        jnp.where(t <= tmin, oidx, _BIG_I32),
                        axis=0,
                        keepdims=True,
                    )

                    bt = best_t_ref[0:1, lanes]
                    bi = best_i_ref[0:1, lanes]
                    # ties resolve to the lowest original index; a first hit
                    # exactly AT the initial bound is kept (the XLA sweep's
                    # t <= t_max is inclusive). The isfinite guard keeps
                    # hitless blocks (tmin = inf, where cand degenerates to
                    # the block's min index) from recording a bogus hit when
                    # the running best is also inf.
                    better = (tmin < bt) | (
                        (tmin == bt)
                        & jnp.isfinite(tmin)
                        & ((cand < bi) | (bi < 0))
                    )
                    best_t_ref[0:1, lanes] = jnp.where(better, tmin, bt)
                    best_i_ref[0:1, lanes] = jnp.where(better, cand, bi)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _order_group_rays(m: int, nsteps: int) -> int:
    """Rays per traversal-order group: ORDER_GROUP_RAYS, doubled while the
    SMEM-resident (nsteps, groups) table — sublanes padded to 8, lanes to
    128, 4 B each — would exceed SMEM_ORDER_BYTES (big sweeps x many
    super-steps). Any order is correct; coarser sharing only costs cull
    quality, and neighbouring 512-groups are already octant-sort-local."""
    og_rays = ORDER_GROUP_RAYS
    while True:
        mp = _round_up(max(m, og_rays), og_rays)
        ngroups = mp // og_rays
        tbl = _round_up(nsteps, 8) * _round_up(ngroups, 128) * 4
        if tbl <= SMEM_ORDER_BYTES or og_rays >= mp:
            return og_rays
        og_rays *= 2


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "with_stats", "og", "subs", "ray_block", "lane_gate",
    ),
)
def _closest_hit_padded(
    rays_t,
    tmax_row,
    decide_row,
    tris,
    aabbs,
    super_aabbs,
    order,
    live,
    *,
    interpret: bool,
    with_stats: bool = False,
    og: int = _OG,
    subs: int = TRI_SUBS,
    ray_block: int = RAY_BLOCK,
    lane_gate: int = LANE_GATE,
):
    """rays_t: (16, Mp) f32 [o, d, 1/d, pad]; tmax_row: (1, Mp) f32
    per-ray initial bound; tris: (Tp, 16) f32 Morton-packed; aabbs:
    (Tp/TRI_BLOCK, 8); super_aabbs: (Tp/(TRI_BLOCK*subs), 8) per-grid-step
    union AABBs; order: (Tp/(TRI_BLOCK*subs), Mp/(og*RAY_BLOCK)) i32
    per-ray-group super-step traversal order (steps-major so SMEM lane
    padding rides the groups axis); live: (Mp/RAY_BLOCK,) i32 per-ray-tile
    any-positive-bound flags; og: ray tiles per order group (static);
    subs: TRI_BLOCK sub-blocks per grid step (static, <= the scene's
    block count). Returns ((1, Mp) t, (1, Mp) original idx, -1 = miss)."""
    mp = rays_t.shape[1]
    tp = tris.shape[0]
    tri_step = TRI_BLOCK * subs
    grid = (mp // ray_block, tp // tri_step)
    flops_per_pair = 40
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # super-step traversal order + tile flags
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                aabbs.shape,
                # whole AABB table resident in VMEM (it is tiny — 32 B per
                # 256 triangles); constant index -> single DMA per sweep
                lambda r, t, order, live: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                super_aabbs.shape,
                lambda r, t, order, live: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (16, ray_block),
                lambda r, t, order, live: (0, r),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ray_block),
                lambda r, t, order, live: (0, r),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ray_block),
                lambda r, t, order, live: (0, r),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tri_step, 16),
                # dead ray tiles pin their triangle operand to block 0, so
                # the pipeline issues no fresh DMA across their whole sweep
                lambda r, t, order, live: (
                    jnp.where(live[r] > 0, order[t, r // og], 0),
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, ray_block),
                lambda r, t, order, live: (0, r),
                memory_space=pltpu.VMEM,
            ),
        ]
        * (3 if with_stats else 2),
    )
    out_shape = [
        jax.ShapeDtypeStruct((1, mp), jnp.float32),
        jax.ShapeDtypeStruct((1, mp), jnp.int32),
    ]
    if with_stats:
        out_shape.append(jax.ShapeDtypeStruct((1, mp), jnp.int32))
    return pl.pallas_call(
        functools.partial(
            _kernel, og=og, subs=subs, rblk=ray_block, lgate=lane_gate
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * mp * tp,
            bytes_accessed=rays_t.size * 4 + tris.size * 4 * grid[0] + mp * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(order, live, aabbs, super_aabbs, rays_t, tmax_row, decide_row, tris)


def _block_padded(soup):
    """The soup's Morton table (already a TRI_BLOCK multiple)."""
    return soup.packed, soup.block_aabb


def should_use_pallas(num_rays: int, num_triangles: int) -> bool:
    """Dispatch policy for impl='auto': prefer this kernel on TPU whenever
    the sweep is big enough to fill a tile.

    Measured on v5e (vault scene, sequential-sweep methodology that defeats
    async-dispatch timing artifacts): the fused-XLA sweep sustains ~5 G
    pair-tests/s regardless of batch; this kernel reaches 15.5 G at
    M=4096 and 42.5 G at M=49k — 3.9x end-to-end on the vault headline
    render (11.8 s -> 3.0 s), before AABB culling. RAYVERB_NO_PALLAS=1
    opts out.
    """
    import os

    if jax.default_backend() not in ("tpu",):
        return False
    if os.environ.get("RAYVERB_NO_PALLAS"):
        return False
    return num_rays * num_triangles >= 256 * 256


def closest_hit_pallas(
    origins,
    dirs,
    soup,
    *,
    interpret: bool | None = None,
    t_max=None,
    t_decide=None,
    with_stats: bool = False,
    ray_block: int | None = None,
):
    """Contract-identical to intersect.closest_hit_xla (incl. t_max).

    ray_block, optional: lanes per cull tile for THIS sweep (>=128
    divisor of ORDER_GROUP_RAYS); defaults to the module-level
    RAYVERB_RAY_BLOCK. Finer tiles shrink each tile's swept corridor
    (fewer executed pairs) at more grid steps per sweep.

    t_decide (M,), optional: per-row any-hit thresholds. A row whose
    running best drops strictly below its threshold stops refining — its
    visibility VERDICT (hit before the threshold) is already locked, but
    the returned (t, index) may then be any witness blocker rather than
    the true closest. Pass only for rows whose consumer reads the verdict
    (mic shadow rays, image mic-visibility), never for rows that need the
    closest hit itself.

    with_stats=True additionally returns the ray-triangle pair tests the
    kernel actually EXECUTED after AABB/best-t/lane-gate culling, per
    512-row ray GROUP (ORDER_GROUP_RAYS lanes each, independent of
    RAY_BLOCK/LANE_GATE): (Hit, executed_pairs (ngroups,) float32)."""
    from .intersect import Hit

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rb = RAY_BLOCK if ray_block is None else int(ray_block)
    if rb < 128 or ORDER_GROUP_RAYS % rb:
        raise ValueError(
            f"ray_block={rb} must be a >=128 divisor of {ORDER_GROUP_RAYS}"
        )
    lg = min(LANE_GATE, rb)

    m = origins.shape[0]
    tris, aabbs = _block_padded(soup)
    # sub-blocks per grid step clamp so every sweep gets at least
    # MIN_SWEEP_STEPS near-to-far grid steps: on small scenes (e.g. the
    # 32-block vault) TRI_SUBS used to swallow the whole scene into one
    # step, turning the sweep brute-force — 4 steps re-engage the
    # traversal order + best-t cull (vault 50k x 128: trace_bin
    # 2.19 -> 2.09 s measured; large scenes are unchanged since
    # blocks/4 >= TRI_SUBS there). Block counts are powers of two
    # (build_sweep_table), so the clamp always divides evenly.
    subs = min(TRI_SUBS, max(aabbs.shape[0] // MIN_SWEEP_STEPS, 1))
    nsteps = aabbs.shape[0] // subs
    og_rays = _order_group_rays(m, nsteps)
    # pad to the order-group width so the (steps, groups) order table
    # tiles evenly over RAY_BLOCK-lane cull tiles
    mp = _round_up(max(m, og_rays), og_rays)
    ngroups = mp // og_rays
    dirs_t = jnp.asarray(dirs, jnp.float32).T
    rays_t = jnp.concatenate(
        [
            jnp.asarray(origins, jnp.float32).T,
            dirs_t,
            # inverse directions precomputed once per sweep (the kernel's
            # slab tests would otherwise pay 3 VPU divides per grid step);
            # +-inf on zero components, exactly like the old in-kernel
            # 1/dv — the zero-component select keeps those rows exact
            1.0 / dirs_t,
            jnp.zeros((7, m), jnp.float32),
        ],
        axis=0,
    )
    if t_max is None:
        tmax_row = jnp.full((1, m), jnp.inf, jnp.float32)
    else:
        tmax_row = jnp.asarray(t_max, jnp.float32).reshape(1, m)
    if t_decide is None:
        decide_row = jnp.zeros((1, m), jnp.float32)
    else:
        decide_row = jnp.asarray(t_decide, jnp.float32).reshape(1, m)
    if mp != m:
        rays_t = jnp.concatenate(
            [rays_t, jnp.zeros((16, mp - m), jnp.float32)], axis=1
        )
        # padded rays get bound 0: they skip every block outright
        tmax_row = jnp.concatenate(
            [tmax_row, jnp.zeros((1, mp - m), jnp.float32)], axis=1
        )
        decide_row = jnp.concatenate(
            [decide_row, jnp.zeros((1, mp - m), jnp.float32)], axis=1
        )

    # PER-RAY-TILE traversal order: each tile walks the blocks front-to-
    # back along its own mean ray — ordered by the projection of the
    # block center onto the tile's mean direction from the tile's mean
    # origin. With direction-coherent tiles (the trace's octant-major
    # sort) this resolves the forward corridor's first wall immediately,
    # so the best-t bound culls everything beyond it; blocks behind the
    # cone are slab-culled regardless of order. Lateral distance breaks
    # ties so near-perpendicular geometry still orders sanely. Means run
    # over LIVE rows only: neutralized rows are parked far outside the
    # scene and would otherwise wreck the order (their tiles are dead
    # anyway; empty padding blocks sit at 1e30 and sort last).
    centers = 0.5 * (aabbs[:, 0:3] + aabbs[:, 3:6])

    def _pad_rows(x):
        x = jnp.asarray(x, jnp.float32)
        if mp == m:
            return x
        return jnp.concatenate([x, jnp.zeros((mp - m, 3), jnp.float32)], 0)

    o_pad = _pad_rows(origins).reshape(ngroups, og_rays, 3)
    d_pad = _pad_rows(dirs).reshape(ngroups, og_rays, 3)
    w_t = (
        (tmax_row[0] > 0)
        .astype(jnp.float32)
        .reshape(ngroups, og_rays)
    )
    wsum = jnp.maximum(jnp.sum(w_t, axis=1, keepdims=True), 1.0)
    centroid = jnp.sum(o_pad * w_t[..., None], axis=1) / wsum  # (ngroups, 3)
    mean_dir = jnp.sum(d_pad * w_t[..., None], axis=1)
    mean_dir = mean_dir / jnp.maximum(
        jnp.linalg.norm(mean_dir, axis=-1, keepdims=True), 1e-6
    )
    rel = centers[None, :, :] - centroid[:, None, :]  # (ngroups, nb, 3)
    proj = jnp.sum(rel * mean_dir[:, None, :], axis=-1)
    lateral2 = jnp.maximum(jnp.sum(rel * rel, axis=-1) - proj * proj, 0.0)
    rank = jnp.where(
        proj > 0, proj + 0.25 * jnp.sqrt(lateral2), 1e30 + lateral2
    )
    # super-step order: a grid step ranks by its best sub-block
    rank_super = jnp.min(rank.reshape(ngroups, -1, subs), axis=2)
    # steps-major layout: SMEM lane padding (minor dim -> 128) lands on
    # the groups axis, which is large and cheap to pad
    order = jnp.argsort(rank_super, axis=1).astype(jnp.int32).T
    live = (
        (tmax_row > 0)
        .reshape(mp // rb, rb)
        .any(axis=1)
        .astype(jnp.int32)
    )
    # per-grid-step SUPER AABBs: the union of each step's TRI_SUBS
    # sub-block boxes, excluding empty padding blocks (whose lo = hi =
    # +1e30 would otherwise blow the union open). All-empty steps get an
    # inverted box that fails every slab test.
    big = np.float32(1e30)
    ab3 = aabbs.reshape(-1, subs, 8)
    ab_empty = ab3[:, :, 0:1] >= big
    super_aabbs = jnp.concatenate(
        [
            ab3[:, :, 0:3].min(axis=1),
            jnp.where(ab_empty, -big, ab3[:, :, 3:6]).max(axis=1),
            jnp.zeros((ab3.shape[0], 2), jnp.float32),
        ],
        axis=-1,
    )
    outs = _closest_hit_padded(
        rays_t,
        tmax_row,
        decide_row,
        tris,
        aabbs,
        super_aabbs,
        order,
        live,
        interpret=interpret,
        with_stats=with_stats,
        og=og_rays // rb,
        subs=subs,
        ray_block=rb,
        lane_gate=lg,
    )
    best_t, best_i = outs[0], outs[1]
    idx = best_i[0, :m]
    found = idx >= 0
    t = jnp.where(found, best_t[0, :m], jnp.inf)
    # padded triangle rows can never win (zero area => rejected), so idx
    # always points at a real triangle when hit is set
    hit = Hit(t=t, index=jnp.maximum(idx, 0), hit=found)
    if not with_stats:
        return hit
    # executed-unit counts are broadcast across each LANE_GATE chunk; one
    # lane per chunk suffices. Chunk counts aggregate to fixed 512-row
    # groups so callers can attribute work by row range without knowing
    # the kernel's tile shape (ADVICE r3). float32 keeps the counts
    # overflow-free (stats are reported at ~1e-7 relative precision,
    # plenty for observability).
    cnt = outs[2][0, ::lg].astype(jnp.float32)
    executed_per_group = cnt.reshape(
        -1, ORDER_GROUP_RAYS // lg
    ).sum(axis=1) * np.float32(TRI_BLOCK * lg)
    return hit, executed_per_group
