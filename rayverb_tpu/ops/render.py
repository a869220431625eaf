"""Fused device-resident render: trace -> attenuate -> histogram -> filter
in two compiled programs, with nothing but the finished IR leaving HBM.

Motivation (and the reason this is the production path): the modular
pipeline mirrors the reference's stage structure (trace, getRawX,
attenuate, flatten, process — cmd/main.cpp:241-336), which on a tunneled
TPU backend costs a host<->device round trip per stage. Here:

  chunk program   = trace_chunk + per-channel diffuse attenuation +
                    scatter-add into the (C, 8, L) energy histogram,
                    plus compact per-ray image-source records with
                    on-device chain hashes
  finalize program = cross-ray image dedup (sort by chain hash, keep
                    first — the std::map insert of rayverb.cpp:653-676),
                    image attenuation + scatter, crossover filter bank,
                    mixdown, normalize, volume scale, trim-length scalar

Documented deviations from the reference (beyond those in trace.py):
  - chain identity uses two independent 32-bit mixes of the surface-index
    prefix instead of exact vector keys; a collision would merge two
    distinct early reflections (probability ~2^-64 per pair)
  - trim_predelay shifts whole histogram bins by round(predelay*sr)
    rather than per-impulse time subtraction: each impulse may land one
    sample away from the reference's placement
  - the histogram length is a static scene-derived upper bound
    ((R+2) * bbox diagonal + slack), truncated to the real IR length after
    the fact
"""

from __future__ import annotations

import os
from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import FilterType, OutputMode, RenderConfig
from ..constants import (
    NUM_BANDS,
    NUM_IMAGE_SOURCE,
    SECONDS_PER_METER,
    TRIM_TAIL_FLOOR,
)
from .filters import _band_coeffs, _fft_len
from .intersect import TriangleSoup, soup_from_scene
from .trace import DEFAULT_RAY_CHUNK, trace_chunk

from ..runtime import enable_compilation_cache

enable_compilation_cache()

MAX_HIST_LEN = 1 << 23  # ~190 s at 44.1 kHz; hard cap on the static bound

RAY_BLOCK_SORT = 512  # Morton-sort rays when several sweep tiles are in play

# Issued pair tests per dispatched trace segment. The tunneled TPU worker
# kills single programs that execute for minutes, so the chunk scan is
# split — but each dispatch boundary costs ~1 s of fixed work (sorts, row
# building, slab math on culled steps, launch latency), so segments should
# be as FAT as the kill bound allows. Budgeted on EXECUTED work (r3 ran 16
# segments where 4 sufficed because this was sized pre-gating, ADVICE r3):
# at the measured ~4% executed fraction and ~20-45 G executed pairs/s,
# 4.5e12 issued pairs ≈ 8-9 s of device time per segment (north star = 2
# segments, measured trace_bin 17.1 s -> 16.8 s vs the 4-segment split;
# the observed worker kills were at minutes, not tens of seconds).
SEG_PAIR_BUDGET = int(
    float(os.environ.get("RAYVERB_SEG_PAIR_BUDGET", "4.5e12"))
)

# Ray populations up to this size trace as ONE single-pass program (full-
# width sweeps, rows binned in place); larger populations fall back to the
# chunked multi-dispatch path to bound per-program working set.
RAY_PROGRAM_LIMIT = 1 << 16


# ---------------------------------------------------------------------------
# chain hashing (device-side identity for the dedup map keys)
# ---------------------------------------------------------------------------

def _mix32(h):
    h = h ^ (h >> 16)
    h = h * np.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * np.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h


def chain_hashes(image_index):
    """(N, S) int32 chains -> two (N, S) uint32 cumulative prefix hashes.
    Prefix equality (the reference's map key, rayverb.cpp:662-666) becomes
    hash-pair equality."""
    idx = image_index.astype(jnp.uint32)
    h1 = jnp.full(idx.shape[:-1], np.uint32(0x9E3779B9))
    h2 = jnp.full(idx.shape[:-1], np.uint32(0x85EBCA6B))
    out1, out2 = [], []
    for k in range(idx.shape[-1]):
        h1 = _mix32(h1 ^ idx[..., k])
        h2 = _mix32((h2 + idx[..., k]) ^ np.uint32(0x27D4EB2F))
        out1.append(h1)
        out2.append(h2)
    return jnp.stack(out1, axis=-1), jnp.stack(out2, axis=-1)


# ---------------------------------------------------------------------------
# attenuation helpers shared with ops.attenuate (same math, jit-inline)
# ---------------------------------------------------------------------------

def _safe_normalize(v):
    mag = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.where(mag > 0, mag, 1.0)


def _speaker_gain(mic, positions, direction, coefficient):
    """(1-c) + c*cos (kernel.cpp:505-513)."""
    return (1.0 - coefficient) + coefficient * jnp.sum(
        _safe_normalize(positions - mic) * _safe_normalize(direction), axis=-1
    )


def _hrtf_channel(mic, positions, times, table, basis, channel: int):
    """Gain + ITD-shifted time for one ear (kernel.cpp:586-625)."""
    from ..constants import HRTF_EAR_OFFSET
    from .attenuate import hrtf_lookup_indices

    width = -HRTF_EAR_OFFSET if channel == 0 else HRTF_EAR_OFFSET
    ear = basis @ jnp.array([width, 0.0, 0.0], jnp.float32) + mic
    direction = _safe_normalize(positions - mic)
    a, e = hrtf_lookup_indices(direction @ basis.T)
    gains = table[channel, a, e]
    diff = jnp.linalg.norm(positions - ear, axis=-1) - jnp.linalg.norm(
        positions - mic, axis=-1
    )
    return gains, times + diff * SECONDS_PER_METER


class AttenSpec(NamedTuple):
    """Static attenuation mode + device parameter arrays."""

    is_hrtf: bool
    nchannels: int
    speaker_dirs: jax.Array | None   # (C, 3)
    speaker_coeffs: jax.Array | None  # (C,)
    table: jax.Array | None          # (2, 360, 180, 8)
    facing: jax.Array | None
    up: jax.Array | None


def make_atten_spec(model, table=None) -> AttenSpec:
    if model.is_hrtf:
        if table is None:
            from ..hrtf.table import default_table

            table = default_table()
        return AttenSpec(
            is_hrtf=True,
            nchannels=2,
            speaker_dirs=None,
            speaker_coeffs=None,
            table=jnp.asarray(table, jnp.float32),
            facing=jnp.asarray(model.hrtf.facing, jnp.float32),
            up=jnp.asarray(model.hrtf.up, jnp.float32),
        )
    dirs = jnp.asarray(
        np.stack([np.asarray(s.direction, np.float32) for s in model.speakers]),
    )
    coeffs = jnp.asarray(
        np.asarray([s.shape for s in model.speakers], np.float32)
    )
    return AttenSpec(
        is_hrtf=False,
        nchannels=len(model.speakers),
        speaker_dirs=dirs,
        speaker_coeffs=coeffs,
        table=None,
        facing=None,
        up=None,
    )


def _attenuate_and_bin(
    mic, volumes, positions, times, spec: AttenSpec, length: int,
    sample_rate, predelay, weight=None, init_hist=None,
):
    """(M, 8) impulses -> ((C, 8, length) histogram, min post-attenuation
    time, max post-attenuation time); fused attenuation + scatter
    (flattenImpulses, rayverb.cpp:48-77).

    The time stats are over the *attenuated* (ITD-shifted for HRTF) times
    of contributing impulses, matching findPredelay over AttenuatedImpulse
    (rayverb.h:49-73): min over t > 0, max over all nonzero rows.

    `weight` (M,) optionally masks rows (image dedup selection). Zero-volume
    impulses contribute nothing, matching the skip in kernel.cpp:524,607.
    `init_hist` accumulates into an existing histogram (the cross-chunk
    carry) instead of zeros.
    """
    nonzero = jnp.any(volumes != 0, axis=-1)
    if weight is not None:
        nonzero = nonzero & (weight > 0)
    basis = None
    if spec.is_hrtf:
        from .attenuate import head_basis

        basis = head_basis(spec.facing, spec.up)

    hists = []
    min_t = jnp.float32(jnp.inf)
    max_t = jnp.float32(0.0)
    for c in range(spec.nchannels):
        if spec.is_hrtf:
            gains, t_c = _hrtf_channel(
                mic, positions, times, spec.table, basis, c
            )
            vol_c = volumes * gains
        else:
            gain = _speaker_gain(
                mic, positions, spec.speaker_dirs[c], spec.speaker_coeffs[c]
            )
            vol_c = volumes * gain[:, None]
            t_c = times
        min_t = jnp.minimum(
            min_t, jnp.min(jnp.where(nonzero & (t_c > 0), t_c, jnp.inf))
        )
        max_t = jnp.maximum(max_t, jnp.max(jnp.where(nonzero, t_c, 0.0)))
        t_c = jnp.maximum(t_c - predelay, 0.0) if predelay is not None else t_c
        idx = jnp.floor(t_c * sample_rate + 0.5).astype(jnp.int32)
        idx = jnp.where(nonzero, idx, length)  # out of range -> dropped
        vol_c = jnp.where(nonzero[:, None], vol_c, 0.0)
        hist = (
            jnp.zeros((NUM_BANDS, length), jnp.float32)
            if init_hist is None
            else init_hist[c]
        )
        hists.append(hist.at[:, idx].add(vol_c.T, mode="drop"))
    return jnp.stack(hists), min_t, max_t


# Histogram binning strategy for the fused trace's diffuse rows:
#   sorted  — collect every bounce's rows into dense (R, n) buffers (one
#             contiguous dynamic-update-slice per bounce) and bin them all
#             at once post-trace WITHOUT a scatter: sort rows by bin,
#             segmented suffix-sum over equal-bin runs, then build the
#             dense histogram by searchsorted + gather. XLA's TPU
#             scatter-add serialises per update row (~105 ns/row measured
#             on the 64k probe), which at north-star scale is ~3.5 s of
#             the render; the sort pipeline is bandwidth-bound instead.
#   scatter — the r3/r4 path: per-bounce fused attenuate + scatter-add
#             into the carried histogram (kept for A/B and as the
#             reference semantics anchor; bit-order of within-bin f32
#             sums differs between the two, results agree to scatter-
#             order noise).
# The mode is read per render (render_fused's bin_mode argument defaults
# to it) and travels as a STATIC jit argument — the two modes are
# different compiled programs, so bench.py can A/B them in one process.


def _bin_mode() -> str:
    return os.environ.get("RAYVERB_BIN", "sorted")


def _segmented_run_totals(sorted_keys, sorted_vals):
    """Inclusive segmented SUFFIX sums over equal-key runs of an
    ascending-sorted key array: afterwards, row i holds the sum of vals
    over rows i..end-of-run, so the FIRST row of each run holds the run
    total. Hillis–Steele with a same-key carry mask — ceil(log2(m))
    vectorized passes, no scatter, no cross-run cancellation (each run's
    total is a balanced pairwise tree like the scatter path's adds)."""
    m = sorted_keys.shape[0]
    d = 1
    while d < m:
        same = sorted_keys == jnp.concatenate(
            [sorted_keys[d:], jnp.full((d,), -1, sorted_keys.dtype)]
        )
        shifted = jnp.concatenate(
            [sorted_vals[d:], jnp.zeros((d,) + sorted_vals.shape[1:],
                                        sorted_vals.dtype)]
        )
        sorted_vals = sorted_vals + jnp.where(same[:, None], shifted, 0.0)
        d *= 2
    return sorted_vals


def _dense_from_runs(sorted_keys, run_totals, length: int):
    """(8, length) dense histogram from run-start totals: bin j's value
    sits at searchsorted(sorted_keys, j) when that row's key is j (runs
    start at their leftmost row), else the bin is empty. Keys >= length
    (the drop sentinel) live past every query, matching the scatter
    path's mode='drop'."""
    j = jnp.arange(length, dtype=sorted_keys.dtype)
    pos = jnp.searchsorted(sorted_keys, j, side="left")
    posc = jnp.minimum(pos, sorted_keys.shape[0] - 1)
    found = (pos < sorted_keys.shape[0]) & (sorted_keys[posc] == j)
    return jnp.where(found[:, None], run_totals[posc], 0.0).T


def _bin_rows_sorted(
    mic, volumes, positions, times, spec: AttenSpec, length: int,
    sample_rate, init_hist=None,
):
    """Batched scatter-free equivalent of _attenuate_and_bin over the
    whole trace's diffuse rows at once (volumes (M, 8), positions (M, 3),
    times (M,)). Returns ((C, 8, length) histogram, min post-attenuation
    time, max post-attenuation time) with identical row-admission rules
    (zero-volume rows contribute nothing; out-of-range bins drop);
    within-bin f32 sums run in a different (tree) order, so histograms
    match the scatter path to float rounding."""
    nonzero = jnp.any(volumes != 0, axis=-1)
    basis = None
    if spec.is_hrtf:
        from .attenuate import head_basis

        basis = head_basis(spec.facing, spec.up)

    sentinel = jnp.int32(length)

    def _key_for(t_c):
        idx = jnp.floor(t_c * sample_rate + 0.5).astype(jnp.int32)
        return jnp.where(nonzero & (idx >= 0) & (idx < length), idx, sentinel)

    hists = []
    min_t = jnp.float32(jnp.inf)
    max_t = jnp.float32(0.0)
    if spec.is_hrtf:
        # ITD shifts make bins channel-specific: one sort per ear
        for c in range(spec.nchannels):
            gains, t_c = _hrtf_channel(
                mic, positions, times, spec.table, basis, c
            )
            min_t = jnp.minimum(
                min_t, jnp.min(jnp.where(nonzero & (t_c > 0), t_c, jnp.inf))
            )
            max_t = jnp.maximum(max_t, jnp.max(jnp.where(nonzero, t_c, 0.0)))
            key = _key_for(t_c)
            perm = jnp.argsort(key)
            sk = key[perm]
            sv = (volumes * gains)[perm]
            hists.append(
                _dense_from_runs(sk, _segmented_run_totals(sk, sv), length)
            )
    else:
        # speaker times carry no per-channel shift: one shared sort, the
        # per-channel gains ride the same permutation
        min_t = jnp.min(jnp.where(nonzero & (times > 0), times, jnp.inf))
        max_t = jnp.max(jnp.where(nonzero, times, 0.0))
        key = _key_for(times)
        perm = jnp.argsort(key)
        sk = key[perm]
        svol = volumes[perm]
        spos = positions[perm]
        for c in range(spec.nchannels):
            gain = _speaker_gain(
                mic, spos, spec.speaker_dirs[c], spec.speaker_coeffs[c]
            )
            hists.append(
                _dense_from_runs(
                    sk,
                    _segmented_run_totals(sk, svol * gain[:, None]),
                    length,
                )
            )
    hist = jnp.stack(hists)
    if init_hist is not None:
        hist = init_hist + hist
    return hist, min_t, max_t


def _row_buffers(nreflections: int, n: int):
    """Per-bounce row collection buffers for the sorted-binning consume
    path: (R, n, 8) volumes, (R, n, 3) positions, (R, n) times, bounce
    counter."""
    return (
        jnp.zeros((nreflections, n, NUM_BANDS), jnp.float32),
        jnp.zeros((nreflections, n, 3), jnp.float32),
        jnp.zeros((nreflections, n), jnp.float32),
        jnp.int32(0),
    )


def _collect_row(bufs, row):
    bv, bp, bt, b = bufs
    vol, pos, tim = row
    return (
        jax.lax.dynamic_update_index_in_dim(bv, vol, b, 0),
        jax.lax.dynamic_update_index_in_dim(bp, pos, b, 0),
        jax.lax.dynamic_update_index_in_dim(bt, tim, b, 0),
        b + 1,
    )


class ChunkOut(NamedTuple):
    hist: jax.Array          # (C, 8, L) diffuse contribution
    img_volume: jax.Array    # (N, S, 8)
    img_position: jax.Array  # (N, S, 3)
    img_time: jax.Array      # (N, S)
    img_slot: jax.Array      # (N, S) int32 slot number
    img_valid: jax.Array     # (N, S) bool (reference map-admission rule)
    img_h1: jax.Array        # (N, S) uint32
    img_h2: jax.Array        # (N, S) uint32
    max_time: jax.Array      # () diffuse max time
    min_time: jax.Array      # () earliest non-zero diffuse time (predelay)
    overflow: jax.Array      # () bool: seg-budget overflow (re-run uncapped)
    tstats: object = None    # dict of per-kind executed-pair scalars, or None


def _chunk_core(
    soup,
    mic,
    source,
    directions,
    nvalid,
    spec: AttenSpec,
    *,
    nreflections: int,
    length: int,
    sample_rate,
    impl: str,
    include_diffuse: bool,
    init_hist=None,
    resort: bool = False,
    sweep_stats: bool = False,
    seg_budget_rows: int | None = None,
    bin_mode: str = "sorted",
) -> ChunkOut:
    """Trace one ray chunk and bin its diffuse contribution (accumulating
    into `init_hist` when given). Shared by the jitted single-chunk entry
    and the whole-render lax.scan.

    Uses the consume-path trace: each bounce's rows scatter into the
    carried histogram the moment they exist (the (N, R) impulse arrays
    never materialise), padding rays are silenced by nvalid volume
    zeroing, and with resort=True each bounce sweep runs over a
    sweep-local spatially-sorted permutation of its rows to keep sweep
    tiles coherent (the ray state and all emissions stay in original row
    order, see trace._sorted_bounce_hit)."""
    from .trace import _trace_impl

    mic = jnp.asarray(mic, jnp.float32)
    source = jnp.asarray(source, jnp.float32)
    n = directions.shape[0]

    sorted_bin = include_diffuse and bin_mode != "scatter"
    if sorted_bin:
        consume = _collect_row
        aux0 = _row_buffers(nreflections, n)
    else:

        def consume(aux, row):
            hist, mx, mn = aux
            vol, pos, tim = row
            if include_diffuse:
                hist, row_mn, row_mx = _attenuate_and_bin(
                    mic, vol, pos, tim, spec, length, sample_rate,
                    predelay=None, init_hist=hist,
                )
                mx = jnp.maximum(mx, row_mx)
                mn = jnp.minimum(mn, row_mn)
            # with include_diffuse False the diffuse population is outside
            # the output set and does not participate in predelay
            return hist, mx, mn

    hist0 = (
        jnp.zeros((spec.nchannels, NUM_BANDS, length), jnp.float32)
        if init_hist is None
        else init_hist
    )
    if not sorted_bin:
        aux0 = (hist0, jnp.float32(0.0), jnp.float32(jnp.inf))
    out = _trace_impl(
        soup,
        mic,
        source,
        directions,
        nreflections=nreflections,
        impl=impl,
        consume_row=consume,
        aux0=aux0,
        nvalid=nvalid,
        resort=resort,
        sweep_stats=sweep_stats,
        seg_budget_rows=seg_budget_rows,
    )
    aux_out, images, overflow = out[0], out[1], out[2]
    tstats = out[3] if sweep_stats else None
    if sorted_bin:
        bv, bp, bt, _ = aux_out
        hist, min_t, max_t = _bin_rows_sorted(
            mic,
            bv.reshape(-1, NUM_BANDS),
            bp.reshape(-1, 3),
            bt.reshape(-1),
            spec,
            length,
            sample_rate,
            init_hist=hist0,
        )
    else:
        hist, max_t, min_t = aux_out
    img_vol, img_pos, img_time, img_idx = images

    h1, h2 = chain_hashes(img_idx)
    slots = jnp.broadcast_to(
        jnp.arange(NUM_IMAGE_SOURCE, dtype=jnp.int32)[None, :],
        img_idx.shape,
    )
    ray_ok = jnp.arange(n) < nvalid
    valid = ((slots == 0) | (img_idx != 0)) & ray_ok[:, None]

    return ChunkOut(
        hist=hist,
        img_volume=img_vol,
        img_position=img_pos,
        img_time=img_time,
        img_slot=slots,
        img_valid=valid,
        img_h1=h1,
        img_h2=h2,
        max_time=max_t,
        min_time=min_t,
        overflow=overflow,
        tstats=tstats,
    )


@partial(
    jax.jit,
    static_argnames=(
        "nreflections",
        "length",
        "impl",
        "spec_static",
        "include_diffuse",
        "resort",
        "sweep_stats",
        "seg_budget_rows",
        "bin_mode",
    ),
)
def _fused_trace_bin(
    soup: TriangleSoup,
    mic,
    source,
    directions,   # (N, 3) — ALL rays, no chunking
    nvalid,       # () int32
    spec_arrays,
    *,
    nreflections: int,
    length: int,
    sample_rate,
    impl: str,
    spec_static,
    include_diffuse: bool,
    resort: bool = False,
    sweep_stats: bool = False,
    seg_budget_rows: int | None = None,
    bin_mode: str = "sorted",
):
    """Single-pass fused trace: every diffuse bounce row is scattered into
    the carried (C, 8, L) histogram the moment it is produced, so the
    (N, R) impulse arrays never exist and every closest-hit sweep covers
    the FULL ray population (per-sweep kernel-launch overhead, ~1 ms on
    tunneled v5e, amortises over all rays instead of one 4096-ray chunk).
    """
    from .trace import _trace_impl

    is_hrtf, nchannels = spec_static
    spec = AttenSpec(is_hrtf, nchannels, *spec_arrays)
    mic32 = jnp.asarray(mic, jnp.float32)
    n = directions.shape[0]
    ray_ok = jnp.arange(n) < nvalid

    sorted_bin = include_diffuse and bin_mode != "scatter"
    if sorted_bin:
        # padding rays were silenced at trace start (nvalid volume
        # zeroing), so rows need no per-ray masking — which is what lets
        # the trace re-sort rays freely between bounces. Time stats use
        # the *attenuated* (ITD-shifted) times, matching findPredelay
        # over AttenuatedImpulse (rayverb.h:49-73).
        consume = _collect_row
        aux0 = _row_buffers(nreflections, n)
    else:

        def consume(aux, row):
            hist, mx, mn = aux
            vol, pos, tim = row
            if include_diffuse:
                hist, row_mn, row_mx = _attenuate_and_bin(
                    mic32, vol, pos, tim, spec, length, sample_rate,
                    predelay=None, init_hist=hist,
                )
                mx = jnp.maximum(mx, row_mx)
                mn = jnp.minimum(mn, row_mn)
            return hist, mx, mn

        aux0 = (
            jnp.zeros((nchannels, NUM_BANDS, length), jnp.float32),
            jnp.float32(0.0),
            jnp.float32(jnp.inf),
        )
    out = _trace_impl(
        soup,
        mic,
        source,
        directions,
        nreflections=nreflections,
        impl=impl,
        consume_row=consume,
        aux0=aux0,
        nvalid=nvalid,
        resort=resort,
        sweep_stats=sweep_stats,
        seg_budget_rows=seg_budget_rows,
    )
    aux_out, images, overflow = out[0], out[1], out[2]
    trace_stats = out[3] if sweep_stats else None
    if sorted_bin:
        bv, bp, bt, _ = aux_out
        hist, min_t, max_t = _bin_rows_sorted(
            mic32,
            bv.reshape(-1, NUM_BANDS),
            bp.reshape(-1, 3),
            bt.reshape(-1),
            spec,
            length,
            sample_rate,
        )
    else:
        hist, max_t, min_t = aux_out
    img_vol, img_pos, img_time, img_idx = images
    h1, h2 = chain_hashes(img_idx)
    slots = jnp.broadcast_to(
        jnp.arange(NUM_IMAGE_SOURCE, dtype=jnp.int32)[None, :], img_idx.shape
    )
    valid = ((slots == 0) | (img_idx != 0)) & ray_ok[:, None]
    imgs = (img_vol, img_pos, img_time, slots, valid, h1, h2)
    if sweep_stats:
        return hist, max_t, min_t, imgs, overflow, trace_stats
    return hist, max_t, min_t, imgs, overflow


@partial(
    jax.jit,
    static_argnames=(
        "nreflections",
        "length",
        "impl",
        "spec_static",
        "include_diffuse",
        "resort",
        "sweep_stats",
        "seg_budget_rows",
        "bin_mode",
    ),
)
def _fused_trace_all(
    soup: TriangleSoup,
    mic,
    source,
    directions,   # (K, chunk, 3)
    nvalid,       # (K,) int32
    spec_arrays,
    carry_in,     # (hist (C,8,L), max_t, min_t) running accumulators
    *,
    nreflections: int,
    length: int,
    sample_rate,
    impl: str,
    spec_static,
    include_diffuse: bool,
    resort: bool = False,
    sweep_stats: bool = False,
    seg_budget_rows: int | None = None,
    bin_mode: str = "sorted",
):
    """One trace+bin SEGMENT as one compiled program: lax.scan over ray
    chunks carrying the energy histogram and time bounds (accumulating
    into `carry_in` so segments chain). On tunneled backends this
    collapses ~3 dispatches + 2 scalar pulls per chunk into a single
    dispatch per segment; render_fused bounds each segment's device time
    because the tunneled worker kills single programs that run for
    minutes.

    Returns (hist (C,8,L), max_t, min_t, img tuple flattened over rays).
    """
    is_hrtf, nchannels = spec_static
    spec = AttenSpec(is_hrtf, nchannels, *spec_arrays)
    k, chunk, _ = directions.shape

    def body(carry, xs):
        if sweep_stats:
            hist, mx, mn, ovf, st_acc = carry
        else:
            hist, mx, mn, ovf = carry
        dirs, nv = xs
        out = _chunk_core(
            soup,
            mic,
            source,
            dirs,
            nv,
            spec,
            nreflections=nreflections,
            length=length,
            sample_rate=sample_rate,
            impl=impl,
            include_diffuse=include_diffuse,
            init_hist=hist,
            resort=resort,
            sweep_stats=sweep_stats,
            seg_budget_rows=seg_budget_rows,
            bin_mode=bin_mode,
        )
        carry = (
            out.hist,
            jnp.maximum(mx, out.max_time),
            jnp.minimum(mn, out.min_time),
            ovf | out.overflow,
        )
        if sweep_stats:
            carry = carry + (
                st_acc
                + jnp.stack([out.tstats[k] for k in sorted(out.tstats)]),
            )
        ys = (
            out.img_volume,
            out.img_position,
            out.img_time,
            out.img_slot,
            out.img_valid,
            out.img_h1,
            out.img_h2,
        )
        return carry, ys

    carry_out, ys = jax.lax.scan(body, carry_in, (directions, nvalid))
    s = NUM_IMAGE_SOURCE
    imgs = tuple(
        y.reshape((k * chunk, s) + y.shape[3:]) for y in ys
    )
    if sweep_stats:
        hist, max_t, min_t, ovf, st_acc = carry_out
        return hist, max_t, min_t, imgs, ovf, st_acc
    hist, max_t, min_t, ovf = carry_out
    return hist, max_t, min_t, imgs, ovf


def _finalize(
    hist,
    img_volume,
    img_position,
    img_time,
    img_slot,
    img_valid,
    img_h1,
    img_h2,
    mic,
    spec_arrays,
    responses,
    predelay,
    volume_scale,
    sample_rate,
    *,
    length: int,
    spec_static,
    include_images: bool,
    remove_direct: bool,
    flips: tuple,
    nfft: int,
    do_normalize: bool,
    filter_method: str = "fft",
    img_cap: int | None = None,
):
    """Finalize = two compiled programs: (1) image dedup + binning +
    predelay shift + content length; (2) crossover filtering + mixdown +
    normalise + trim. Split deliberately: the monolithic program (sort +
    scatter + long scans + FFTs in one body) miscompiles on some TPU
    backends."""
    hist, content_len = _finalize_hist(
        hist,
        img_volume,
        img_position,
        img_time,
        img_slot,
        img_valid,
        img_h1,
        img_h2,
        mic,
        spec_arrays,
        predelay,
        sample_rate,
        length=length,
        spec_static=spec_static,
        include_images=include_images,
        remove_direct=remove_direct,
        img_cap=img_cap,
    )
    mixed, trim_len = _finalize_filter(
        hist,
        content_len,
        responses,
        volume_scale,
        flips=flips,
        nfft=nfft,
        do_normalize=do_normalize,
        filter_method=filter_method,
    )
    if filter_method == "fir":
        # the sinc bank grows the IR (FastConvolution, filters.h:55-80)
        from .filters import KERNEL_LENGTH

        content_len = content_len + KERNEL_LENGTH - 1
    return mixed, trim_len, content_len


@partial(
    jax.jit,
    static_argnames=(
        "length",
        "spec_static",
        "include_images",
        "remove_direct",
        "img_cap",
    ),
)
def _finalize_hist(
    hist,
    img_volume,
    img_position,
    img_time,
    img_slot,
    img_valid,
    img_h1,
    img_h2,
    mic,
    spec_arrays,
    predelay,
    sample_rate,
    *,
    length: int,
    spec_static,
    include_images: bool,
    remove_direct: bool,
    img_cap: int | None = None,
):
    is_hrtf, nchannels = spec_static
    spec = AttenSpec(is_hrtf, nchannels, *spec_arrays)
    mic = jnp.asarray(mic, jnp.float32)

    if include_images:
        m = img_h1.size
        h1 = img_h1.reshape(m)
        h2 = img_h2.reshape(m)
        valid = img_valid.reshape(m)
        if remove_direct:
            valid = valid & (img_slot.reshape(m) != 0)
        sent = np.uint32(0xFFFFFFFF)
        vol = img_volume.reshape(m, NUM_BANDS)
        pos = img_position.reshape(m, 3)
        tim = img_time.reshape(m)
        if img_cap is not None and img_cap < m:
            # valid rows are a small fraction of the (rays x slots) grid
            # at scale (the admission gate rejects most candidates), so
            # compact them to an img_cap-row buffer before the dedup sort
            # and the attenuate+bin pass — the caller sizes img_cap from
            # the EXACT device count, so the compaction never drops rows.
            # Over-cap safety: dest clamps into the scratch row (cap),
            # which is masked off below.
            cpos = jnp.cumsum(valid.astype(jnp.int32)) - 1
            nvalid = jnp.where(valid.any(), cpos[-1] + 1, 0)
            dest = jnp.where(valid, jnp.minimum(cpos, img_cap), img_cap)
            crow = (
                jnp.zeros((img_cap + 1,), jnp.int32)
                .at[dest]
                .set(jnp.arange(m, dtype=jnp.int32))[:img_cap]
            )
            cvalid = jnp.arange(img_cap) < jnp.minimum(nvalid, img_cap)
            h1 = jnp.where(cvalid, h1[crow], sent)
            h2 = jnp.where(cvalid, h2[crow], sent)
            vol = vol[crow]
            pos = pos[crow]
            tim = jnp.where(cvalid, tim[crow], 0.0)
            valid = cvalid
            m = img_cap
        # push invalid rows to the end of the sort order
        k1 = jnp.where(valid, h1, sent)
        k2 = jnp.where(valid, h2, sent)
        row = jnp.arange(m, dtype=jnp.int32)
        s1, s2, srow, svalid = jax.lax.sort(
            (k1, k2, row, valid.astype(jnp.int32)), num_keys=2
        )
        first = jnp.concatenate(
            [
                jnp.ones((1,), bool),
                (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1]),
            ]
        )
        selected = first & (svalid == 1)
        weight = jnp.zeros((m,), jnp.float32).at[srow].add(
            selected.astype(jnp.float32)
        )
        img_hist, _, _ = _attenuate_and_bin(
            mic,
            vol,
            pos,
            tim,
            spec,
            length,
            sample_rate,
            predelay=None,
            weight=weight,
        )
        hist = hist + img_hist

    if predelay is not None:
        # whole-histogram equivalent of fixPredelay (rayverb.h:77-97):
        # bins shifted past the origin CLAMP into bin 0 (t = max(t-pd, 0)),
        # they are not dropped — the direct-path peak must survive.
        shift = jnp.floor(predelay * sample_rate + 0.5).astype(jnp.int32)
        pos = jnp.arange(length)
        src = pos + shift  # gather source indices
        shifted = jnp.take(hist, jnp.clip(src, 0, length - 1), axis=-1)
        shifted = jnp.where(src < length, shifted, 0.0)
        head = jnp.sum(jnp.where(pos <= shift, hist, 0.0), axis=-1)
        hist = shifted.at[..., 0].set(head)

    # exact content length: one past the last occupied bin (the reference's
    # flatten length round(maxtime*sr)+1, rayverb.cpp:53-57, minus trailing
    # bins owned solely by zero-volume impulses)
    occupied = jnp.any(hist != 0, axis=(0, 1))
    content_len = (
        jnp.max(jnp.where(occupied, jnp.arange(length), -1)) + 1
    )
    return hist, content_len


@partial(
    jax.jit,
    static_argnames=("flips", "nfft", "do_normalize", "filter_method"),
)
def _finalize_filter(
    hist,
    content_len,
    responses,
    volume_scale,
    *,
    flips: tuple,
    nfft: int,
    do_normalize: bool,
    filter_method: str,
):
    # crossover filter bank + mixdown (process, rayverb.cpp:125-149).
    # After every pass, samples at/after the content length are zeroed:
    # the reference's arrays END there, so each pass (notably the reversed
    # ones) must see exactly a content-length signal.
    #
    # filter_method='fft': each causal pass as a truncated FFT convolution
    # with `responses` = (P, 8, nfft//2+1, 2) float32 (re, im) frequency
    # responses (assembled to complex on device — see finalize_filter_params).
    # filter_method='scan': exact sequential biquads (the reference's own
    # arithmetic) with `responses` = (P, 8, 5) float32 coefficients —
    # preferred on backends where huge FFT programs are fragile; ~1 s/pass
    # at 400k samples since all C*8 lanes scan in parallel.
    # filter_method='fir': the windowed-sinc bank as ONE full FFT
    # convolution per band (`responses` = (1, 8, nfft//2+1) kernel
    # spectra); the output GROWS by KERNEL_LENGTH-1 samples, matching
    # FastConvolution (filters.cpp:96-154, filters.h:55-80).
    out = hist
    t = out.shape[-1]
    in_content = (jnp.arange(t) < content_len).astype(out.dtype)
    if filter_method == "fir":
        from .filters import KERNEL_LENGTH

        t = t + KERNEL_LENGTH - 1
        content_len = content_len + KERNEL_LENGTH - 1
        resp = jax.lax.complex(responses[0, ..., 0], responses[0, ..., 1])
        spec_f = jnp.fft.rfft(out, n=nfft)
        out = jnp.fft.irfft(spec_f * resp, n=nfft)[..., :t]
        out = out * (jnp.arange(t) < content_len)
    elif filter_method == "scan":
        from .filters import biquad_onepass

        # reversed passes run as reverse-direction scans; the array never
        # flips (scan -> mask -> jnp.flip -> scan chains miscompile to
        # zeros on the axon TPU backend — verified empirically). The pass
        # direction is the cumulative parity of the reference's reversals.
        orientation = False
        for p, do_flip in enumerate(flips):
            orientation ^= do_flip
            run = partial(biquad_onepass, reverse=orientation)
            out = jax.vmap(run, in_axes=(-2, 0), out_axes=-2)(
                out, responses[p]
            )
            out = out * in_content
    else:
        # flip-free FFT passes: running a causal filter BACKWARD over the
        # unflipped signal is correlation, i.e. conj(H) on the rFFT grid
        # (real signals; the anti-causal tail decays inside the pad) —
        # jnp.flip chains miscompile to zeros on the axon TPU backend
        # (see the scan branch), so reversed passes ship their responses
        # PRE-conjugated from finalize_filter_params and the signal keeps
        # one fixed orientation (which also keeps the in_content mask
        # trivial). `flips` is retained for the scan branch only.
        for p in range(responses.shape[0]):
            # responses arrive as float32 (re, im) pairs (complex64
            # transfers are UNIMPLEMENTED on the axon backend); the
            # complex value is assembled on device
            resp = jax.lax.complex(
                responses[p, ..., 0], responses[p, ..., 1]
            )
            spec_f = jnp.fft.rfft(out, n=nfft)
            out = jnp.fft.irfft(spec_f * resp, n=nfft)[..., :t]
            out = out * in_content
    mixed = jnp.sum(out, axis=-2)  # (C, L)

    if do_normalize:
        peak = jnp.max(jnp.abs(mixed))
        mixed = mixed * jnp.where(peak > 0, 1.0 / peak, 1.0)
    mixed = mixed * volume_scale

    # trimTail length (rayverb.cpp:96-122 semantics, computed on device,
    # restricted to the content region — the reference's array ends there)
    positions = jnp.arange(mixed.shape[-1])[None, :]
    loud = (jnp.abs(mixed) >= TRIM_TAIL_FLOOR) & (positions < content_len)
    last = jnp.max(jnp.where(loud, positions, -1))
    trim_len = jnp.maximum(last, 0)
    return mixed.astype(jnp.float32), trim_len


def finalize_filter_params(
    filter_type, sample_rate: float, lo_cutoff: float, length: int,
    method: str | None = None,
):
    """Host-side parameters for _finalize's filter section.

    method None resolves to 'fft' (flip-free truncated-FFT passes — the
    O(T)-sequential biquad scans cost ~0.12 s/pass at 131k samples on the
    TPU, ~50x the FFT's cost; the 'fir' sinc path has exercised same-size
    TPU FFTs across the whole demo corpus). RAYVERB_FINALIZE_FILTER=scan
    selects the reference's exact sequential arithmetic instead (they
    agree to ~1e-6 of peak — both bounded by the float64 oracle gate).
    The windowed-sinc FIR bank always uses 'fir' (one FFT convolution per
    band — there is no IIR form). Returns (params, flips, nfft, method).

    Results are cached per (filter, sr, cutoff, length, method): the fft
    responses live on the rFFT grid of the render's power-of-two bucket
    (~0.5-2 M points at reference IR lengths), and rebuilding + re-uploading
    them cost MORE than the whole rest of a steady vault render — the
    r4-final BENCH vault regression (15.4 s vs 2.6 s) was exactly this
    host-side pipeline running twice per render inside the trace_bin
    timing mark. histogram_length's power-of-two quantisation keeps the
    key space tiny, so a corpus of renders shares a handful of entries."""
    if method is None and filter_type != FilterType.WINDOWED_SINC:
        method = os.environ.get("RAYVERB_FINALIZE_FILTER", "fft")
    return _finalize_filter_params_cached(
        filter_type, float(sample_rate), float(lo_cutoff), int(length), method
    )


@lru_cache(maxsize=16)
def _finalize_filter_params_cached(
    filter_type, sample_rate: float, lo_cutoff: float, length: int,
    method: str | None,
):
    if filter_type == FilterType.WINDOWED_SINC:
        from .filters import KERNEL_LENGTH, band_edges, bandpass_sinc_kernel

        edges = band_edges(lo_cutoff, sample_rate)
        nfft = _fft_len(length + KERNEL_LENGTH - 1)
        kernels = np.stack(
            [
                bandpass_sinc_kernel(sample_rate, edges[i], edges[i + 1])
                for i in range(NUM_BANDS)
            ]
        )
        kspec = np.fft.rfft(kernels.astype(np.float64), n=nfft)[None]
        # float32 (re, im) pairs — complex transfers are UNIMPLEMENTED on
        # the axon backend (same convention as the 'fft' branch)
        params = jnp.asarray(
            np.stack([kspec.real, kspec.imag], axis=-1).astype(np.float32)
        )
        return params, (False,), nfft, "fir"
    passes = _band_coeffs(filter_type, sample_rate, lo_cutoff)
    flips = tuple(bool(f) for _, f in passes)
    if method == "scan":
        params = jnp.asarray(
            np.stack([c for c, _ in passes]).astype(np.float32)
        )
        nfft = 0
    else:
        nfft = _fft_len(length)
        # reversed passes are conjugated HERE (host-side numpy): the
        # device program then contains no conj op (the axon backend
        # rejects it as UNIMPLEMENTED) and matches the op profile of the
        # corpus-proven 'fir' path. Orientation is the cumulative parity
        # of the reference's reversals, as in _finalize_filter's
        # scan branch.
        #
        # Responses ship as float32 (re, im) pairs: complex64 host->device
        # transfers hit UNIMPLEMENTED on the axon backend (complex
        # arithmetic INSIDE programs is fine — lax.complex reassembles on
        # device, see _finalize_filter). The (re, im) planes are FILLED IN
        # PLACE on the shared rFFT exp grid: at reference IR lengths the
        # grid is ~0.5-2 M points and the per-pass stack/conj/astype chain
        # of complex128 temporaries used to dominate whole renders.
        k = nfft // 2 + 1
        w = np.exp((-2j * np.pi / nfft) * np.arange(k))
        w2 = w * w
        params_np = np.empty((len(passes), NUM_BANDS, k, 2), np.float32)
        orientation = False
        for p, (coeffs, do_flip) in enumerate(passes):
            orientation ^= do_flip
            sign = -1.0 if orientation else 1.0  # conj == negated imag
            for band, cf in enumerate(coeffs):
                b0, b1, b2, a1, a2 = [float(c) for c in cf]
                r = (b0 + b1 * w + b2 * w2) / (1.0 + a1 * w + a2 * w2)
                params_np[p, band, :, 0] = r.real
                params_np[p, band, :, 1] = sign * r.imag
        params = jnp.asarray(params_np)
    return params, flips, nfft, method


def histogram_length(scene, nreflections: int, sample_rate: float) -> int:
    """Static scene-derived upper bound on the IR length, rounded up to a
    power of two.

    The rounding is a compile-key quantisation: `length` is a static shape
    of the trace+bin program, and on tunneled TPU backends every distinct
    program costs minutes of remote compilation. Collapsing the per-scene
    bound to the next power of two lets a whole demo corpus of different
    rooms share a handful of compiled programs. The bound only gates the
    scatter target size; the finalize bucket already trims to content.
    """
    lo, hi = np.asarray(scene.bounds)
    diag = float(np.linalg.norm(hi - lo))
    max_t = ((nreflections + 2) * max(diag, 1.0) + 1.0) * SECONDS_PER_METER
    length = int(np.floor(max_t * sample_rate + 0.5)) + 8
    length = 1 << (max(length, 256) - 1).bit_length()
    return min(length, MAX_HIST_LEN)


def sweep_pair_tests(nrays: int, ntris: int, nreflections: int) -> int:
    """Ray-triangle pair tests ISSUED by one trace (pre-cull): the direct
    ray, per image-bounce closest-hit + combined validation sweep, and the
    tail's closest-hit + shadow sweeps."""
    b = min(nreflections, NUM_IMAGE_SOURCE - 1)
    total = ntris  # direct-path visibility
    for k in range(b):
        total += nrays * ntris              # bounce closest-hit
        total += nrays * (k + 3) * ntris    # shadow + (k+1) segments + vis
    total += (nreflections - b) * 2 * nrays * ntris
    return total


def render_fused(
    scene,
    config: RenderConfig,
    directions,
    *,
    hrtf_table=None,
    impl: str = "auto",
    ray_chunk: int = DEFAULT_RAY_CHUNK,
    soup: TriangleSoup | None = None,
    stats: bool = False,
    bin_mode: str | None = None,
):
    """Full-speed render. Returns (channels (C, T') float32 numpy, info dict).

    bin_mode: 'sorted' (default) or 'scatter' — the diffuse histogram
    binning strategy (see _bin_mode above); None reads RAYVERB_BIN.

    Only scalars (predelay, max time, trim length) and the final (C, L)
    output ever leave the device. With stats=True the info dict gains a
    'timings' phase breakdown (device-synchronised walls) plus issued
    pair-test throughput — the observability upgrade SURVEY.md §5 calls
    for; set RAYVERB_PROFILE_DIR to also capture a jax.profiler trace of
    the steady-state render.
    """
    import time as _time

    timings: dict = {}
    profile_dir = os.environ.get("RAYVERB_PROFILE_DIR")
    profile_ctx = (
        jax.profiler.trace(profile_dir) if (stats and profile_dir) else None
    )
    if profile_ctx is not None:
        profile_ctx.__enter__()
    t_start = _time.perf_counter()
    if bin_mode is None:
        bin_mode = _bin_mode()
    if soup is None:
        soup = soup_from_scene(scene)
    spec = make_atten_spec(config.attenuation_model, hrtf_table)
    spec_arrays = tuple(spec[2:])
    spec_static = (spec.is_hrtf, spec.nchannels)

    length = histogram_length(scene, config.reflections, config.sample_rate)

    directions = np.asarray(directions, dtype=np.float32)
    n = directions.shape[0]
    if n >= 4 * RAY_BLOCK_SORT:
        # coherent 512-ray bundles raise the sweep kernel's AABB-cull skip
        # rate; ray order is semantically free (see utils.directions)
        from ..utils.directions import morton_sort

        directions = morton_sort(directions)
    if n <= RAY_PROGRAM_LIMIT:
        nchunks, chunk = 1, n
        padded = -(-n // 512) * 512  # lane-friendly
    else:
        nchunks = max(1, -(-n // ray_chunk))
        chunk = ray_chunk
        padded = nchunks * chunk
    if padded != n:
        pad = np.zeros((padded - n, 3), dtype=np.float32)
        pad[:, 2] = 1.0
        directions = np.concatenate([directions, pad], axis=0)

    include_diffuse = config.output_mode in (OutputMode.ALL, OutputMode.DIFFUSE_ONLY)
    include_images = config.output_mode in (OutputMode.ALL, OutputMode.IMAGE_ONLY)

    # per-bounce ray re-sorting feeds the sweep kernel's AABB cull; only
    # worth the in-program argsorts when the scene has enough triangle
    # blocks for culling to matter and the population fills several tiles
    # (RAYVERB_NO_RESORT=1 disables, for perf experiments)
    resort = bool(
        n >= 4096
        and soup.block_aabb.shape[0] >= 32
        and not os.environ.get("RAYVERB_NO_RESORT")
    )

    # filter parameters (host-precomputed, single finalize compile);
    # recomputed below when the content bucket is smaller than the bound
    filter_params, flips, nfft, filter_method = finalize_filter_params(
        config.filter, config.sample_rate, config.hipass, length
    )

    # the entire trace+bin phase is ONE compiled program; only two
    # time-bound scalars come back before finalize
    sweep_stats = bool(stats and os.environ.get("RAYVERB_SWEEP_STATS"))
    trace_stats = None
    # Image-validation row budget (trace.py phase-A g_cap): on large
    # scenes, later bounces only issue validation rows for the first
    # 2*chunk-width gate survivors. If a trace reports overflow (some
    # admitted ray was denied rows — e.g. a perfectly specular shoebox at
    # high order), the whole trace re-runs uncapped so results stay exact.
    seg_budget = (
        None
        if soup.block_aabb.shape[0] < 64
        or os.environ.get("RAYVERB_NO_SEG_BUDGET")
        else 2 * (n if n <= RAY_PROGRAM_LIMIT else ray_chunk)
    )

    def _run_trace(budget):
        if n <= RAY_PROGRAM_LIMIT:
            # single pass over all rays: sweeps run at full width and
            # bounce rows scatter straight into the carried histogram
            out = _fused_trace_bin(
                soup,
                config.mic_position,
                config.source_position,
                directions,
                np.int32(n),
                spec_arrays,
                nreflections=config.reflections,
                length=length,
                sample_rate=config.sample_rate,
                impl=impl,
                spec_static=spec_static,
                include_diffuse=include_diffuse,
                resort=resort,
                sweep_stats=sweep_stats,
                seg_budget_rows=budget,
                bin_mode=bin_mode,
            )
            if sweep_stats:
                hist, max_t_dev, min_t_dev, imgs, ovf, tstats = out
            else:
                hist, max_t_dev, min_t_dev, imgs, ovf = out
                tstats = None
            return hist, max_t_dev, min_t_dev, imgs, ovf, tstats
        counts = np.minimum(
            np.maximum(n - np.arange(nchunks) * chunk, 0), chunk
        ).astype(np.int32)
        # bound each dispatched program's device time: the tunneled TPU
        # worker kills programs that run for minutes (observed at the
        # 1M-ray x 100k-tri scan), so the chunk scan is split into
        # segments of ~SEG_PAIR_BUDGET issued pair tests (~5-8 s of sweep
        # work each), chained through the carried histogram. All segments
        # share one compiled program (equal chunk counts; trailing
        # zero-count chunks are fully masked).
        est = max(
            sweep_pair_tests(chunk, soup.num_padded, config.reflections), 1
        )
        seg = int(max(1, min(nchunks, SEG_PAIR_BUDGET // est)))
        nseg = -(-nchunks // seg)
        pad_chunks = nseg * seg
        dirs_all = directions.reshape(nchunks, chunk, 3)
        if pad_chunks != nchunks:
            extra = np.zeros((pad_chunks - nchunks, chunk, 3), np.float32)
            extra[..., 2] = 1.0
            dirs_all = np.concatenate([dirs_all, extra], axis=0)
            counts_p = np.concatenate(
                [counts, np.zeros(pad_chunks - nchunks, np.int32)]
            )
        else:
            counts_p = counts
        carry = (
            jnp.zeros((spec.nchannels, NUM_BANDS, length), jnp.float32),
            jnp.float32(0.0),
            jnp.float32(jnp.inf),
            jnp.bool_(False),
        )
        if sweep_stats:
            carry = carry + (jnp.zeros((4,), jnp.float32),)
        img_parts = []
        for si in range(nseg):
            sl = slice(si * seg, (si + 1) * seg)
            out = _fused_trace_all(
                soup,
                config.mic_position,
                config.source_position,
                dirs_all[sl],
                counts_p[sl],
                spec_arrays,
                carry,
                nreflections=config.reflections,
                length=length,
                sample_rate=config.sample_rate,
                impl=impl,
                spec_static=spec_static,
                include_diffuse=include_diffuse,
                resort=resort,
                sweep_stats=sweep_stats,
                seg_budget_rows=budget,
                bin_mode=bin_mode,
            )
            hist, max_t_dev, min_t_dev, part, ovf = out[:5]
            carry = (hist, max_t_dev, min_t_dev, ovf)
            if sweep_stats:
                carry = carry + (out[5],)
            img_parts.append(part)
        imgs = (
            img_parts[0]
            if len(img_parts) == 1
            else tuple(
                jnp.concatenate(parts, axis=0) for parts in zip(*img_parts)
            )
        )
        tstats = None
        if sweep_stats:
            # accumulated across chunks/segments; keys in sorted order,
            # matching the body's jnp.stack
            st = np.asarray(carry[4])
            tstats = dict(
                zip(("bounce", "imgvis", "seg", "shadow"), st.tolist())
            )
        return hist, max_t_dev, min_t_dev, imgs, ovf, tstats

    hist, max_t_dev, min_t_dev, imgs, ovf, trace_stats = _run_trace(
        seg_budget
    )
    if seg_budget is not None and bool(ovf):
        import warnings

        warnings.warn(
            "image-validation row budget overflowed (highly specular "
            "scene?); re-running the trace uncapped",
            stacklevel=2,
        )
        hist, max_t_dev, min_t_dev, imgs, ovf, trace_stats = _run_trace(
            None
        )
    if stats:
        jax.block_until_ready(hist)
        timings["trace_bin"] = _time.perf_counter() - t_start
        t_mark = _time.perf_counter()
    max_t = float(max_t_dev)
    min_t = float(min_t_dev)

    # direct-path + image times participate in predelay like the reference's
    # findPredelay over attenuated impulses (rayverb.h:49-73)
    if include_images:
        img_min, img_max = _image_time_stats(
            imgs[4],
            imgs[3],
            imgs[2],
            imgs[1],
            imgs[0],
            np.asarray(config.mic_position, np.float32),
            spec_arrays,
            spec_static=spec_static,
            remove_direct=config.remove_direct,
        )
        min_t = min(min_t, float(img_min))
        max_t = max(max_t, float(img_max))

    predelay = None
    if config.trim_predelay and np.isfinite(min_t):
        predelay = float(min_t)
    if stats:
        timings["time_stats"] = _time.perf_counter() - t_mark
        t_mark = _time.perf_counter()

    # finalize over a power-of-two bucket that covers the actual content
    # rather than the conservative scene bound: the filter scans cost O(L)
    bucket = length
    if max_t > 0:
        need = int(
            np.floor((max_t + 0.1 * SECONDS_PER_METER) * config.sample_rate + 0.5)
        ) + 8
        bucket = min(length, max(4096, 1 << (need - 1).bit_length()))
    if bucket < length:
        hist = _slice_hist(hist, bucket=bucket)
        filter_params, flips, nfft, filter_method = finalize_filter_params(
            config.filter, config.sample_rate, config.hipass, bucket
        )
    eff_length = bucket

    # size the dedup/attenuate pass to the EXACT number of admitted image
    # rows (a tiny device->host count — the host is already synchronised
    # on max_t above): at scale the (rays x slots) grid is ~1e7 rows of
    # which only ~1e4-1e5 are valid, and the finalize sort/gathers are
    # proportional to the buffer width. Power-of-two buckets bound the
    # number of compiled variants; cap >= m falls back to the plain path.
    img_cap = None
    if include_images:
        v = imgs[4]
        if config.remove_direct:
            v = v & (imgs[3] != 0)
        nvalid = int(jnp.sum(v))
        cap = max(1024, 1 << (max(nvalid, 1) - 1).bit_length())
        if 2 * cap <= imgs[4].size:
            img_cap = cap

    mixed, trim_len, content_len = _finalize(
        hist,
        *imgs,
        np.asarray(config.mic_position, np.float32),
        spec_arrays,
        filter_params,
        None if predelay is None else np.float32(predelay),
        np.float32(config.volume_scale),
        np.float32(config.sample_rate),
        length=eff_length,
        spec_static=spec_static,
        include_images=include_images,
        remove_direct=config.remove_direct,
        flips=flips,
        nfft=nfft,
        do_normalize=config.normalize,
        filter_method=filter_method,
        img_cap=img_cap,
    )

    if stats:
        jax.block_until_ready(mixed)
        timings["finalize"] = _time.perf_counter() - t_mark
        t_mark = _time.perf_counter()

    content = int(content_len)
    out_len = min(int(trim_len), content) if config.trim_tail else content
    # one full pull, sliced host-side: device slicing would compile a new
    # program per distinct output length
    channels = np.asarray(mixed)[:, : max(out_len, 1)][:, :out_len]
    info = {
        "predelay": predelay or 0.0,
        "histogram_length": length,
        "content_length": content,
        "trim_length": int(trim_len),
        "max_diffuse_time": max_t,
    }
    if stats:
        timings["pull"] = _time.perf_counter() - t_mark
        total = _time.perf_counter() - t_start
        timings["total"] = total
        pairs = sweep_pair_tests(n, soup.num_padded, config.reflections)
        info["timings"] = timings
        info["pair_tests_issued"] = pairs
        info["pair_tests_per_s"] = pairs / max(timings["trace_bin"], 1e-9)
        info["ray_bounces_per_s"] = n * config.reflections / max(total, 1e-9)
        if trace_stats is not None:
            # post-cull pair tests the kernel actually executed, split by
            # sweep kind (RAYVERB_SWEEP_STATS=1; single-pass and chunked)
            executed = {k: float(v) for k, v in trace_stats.items()}
            info["pair_tests_executed"] = executed
            info["pair_tests_executed_total"] = sum(executed.values())
            # executed-pair throughput vs the VPU-bound kernel ceiling
            # (measured ~120 G pair-tests/s on v5e at 55 flops/pair)
            info["pair_tests_executed_per_s"] = info[
                "pair_tests_executed_total"
            ] / max(timings["trace_bin"], 1e-9)
        if profile_ctx is not None:
            profile_ctx.__exit__(None, None, None)
    return channels, info


@partial(jax.jit, static_argnames=("bucket",))
def _slice_hist(hist, *, bucket: int):
    return hist[..., :bucket]


@partial(jax.jit, static_argnames=("spec_static", "remove_direct"))
def _image_time_stats(
    img_valid,
    img_slot,
    img_time,
    img_position,
    img_volume,
    mic,
    spec_arrays,
    *,
    spec_static,
    remove_direct: bool,
):
    """(earliest, latest) post-attenuation image time over the admitted
    population. Uses ITD-shifted per-channel times for HRTF so the fused
    predelay matches findPredelay over AttenuatedImpulse (rayverb.h:49-73).
    Duplicate chains share identical times, so running pre-dedup gives the
    same min/max as the deduped set."""
    is_hrtf, nchannels = spec_static
    spec = AttenSpec(is_hrtf, nchannels, *spec_arrays)
    mic = jnp.asarray(mic, jnp.float32)
    ok = img_valid & jnp.any(img_volume != 0, axis=-1)
    if remove_direct:
        ok = ok & (img_slot != 0)
    times = img_time.reshape(-1)
    positions = img_position.reshape(-1, 3)
    ok = ok.reshape(-1)
    min_t = jnp.float32(jnp.inf)
    max_t = jnp.float32(0.0)
    if is_hrtf:
        from .attenuate import head_basis

        basis = head_basis(spec.facing, spec.up)
        for c in range(nchannels):
            _, t_c = _hrtf_channel(mic, positions, times, spec.table, basis, c)
            min_t = jnp.minimum(
                min_t, jnp.min(jnp.where(ok & (t_c > 0), t_c, jnp.inf))
            )
            max_t = jnp.maximum(max_t, jnp.max(jnp.where(ok, t_c, 0.0)))
    else:
        min_t = jnp.min(jnp.where(ok & (times > 0), times, jnp.inf))
        max_t = jnp.max(jnp.where(ok, times, 0.0))
    return min_t, max_t
