"""Batched IR data generation: many source/receiver pairs in one program.

The reference generates IR corpora by shelling out ~200 independent CLI
invocations (demo/gen.sh) — embarrassing job parallelism. The TPU-native
equivalent runs a whole batch of source/receiver pairs through ONE compiled
program, and — unlike a vmap over per-pair renders — MERGES all pairs'
rays into shared full-width closest-hit sweeps (BASELINE.json config 5):

  - the multi-pair trace (ops.trace._trace_impl pair_id mode) carries
    per-row mic/source through its per-bounce re-sorts, so every sweep
    covers B x N rays at once and the sweep kernel's fixed cost amortises
    over the whole batch instead of one pair
  - bounce rows scatter into a carried (B, C, 8, L) histogram bank keyed
    by the row's pair
  - image-source chains dedup per pair via pair-seeded hash keys in one
    global sort (the per-pair std::map of rayverb.cpp:653-676, batched)
  - the crossover filter bank + mixdown + normalise vmap per pair

Optionally sharded over a ('batch',) mesh axis with shard_map: pairs are
independent, so each device runs the fused trace on its local pairs with
no cross-device collectives at all.

Outputs are fixed-shape (B, C, L) IRs plus per-pair content lengths.
config.trim_predelay is honored on device exactly like the single-pair
fused path (per-pair histogram shift before filtering, fixPredelay
semantics, rayverb.h:77-97); config.trim_tail needs per-pair dynamic
output lengths, which do not batch — apply it host-side with
`trim_batch`, which reproduces the single-pair path's trimTail
arithmetic (rayverb.cpp:96-122) on the fixed-shape outputs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config.schema import RenderConfig
from ..constants import NUM_BANDS, NUM_IMAGE_SOURCE
from ..ops.render import (
    AttenSpec,
    _bin_mode,
    _collect_row,
    _dense_from_runs,
    _finalize_filter,
    _hrtf_channel,
    _mix32,
    _row_buffers,
    _segmented_run_totals,
    _speaker_gain,
    chain_hashes,
    finalize_filter_params,
    histogram_length,
    make_atten_spec,
)
from ..ops.intersect import soup_from_scene

_ROW_ALIGN = 512  # sweep-lane alignment for the flattened B*N row space


def _pair_time_stats(pair_rows, t_c, ok, nbatch, tmin, tmax):
    """Fold one channel's attenuated times into per-pair (B,) min/max
    accumulators — findPredelay/max-time over AttenuatedImpulse
    (rayverb.h:49-73), per pair: min over t > 0 of contributing rows,
    max over all contributing rows."""
    mn = jax.ops.segment_min(
        jnp.where(ok & (t_c > 0), t_c, jnp.inf),
        pair_rows,
        num_segments=nbatch,
    )
    mx = jax.ops.segment_max(
        jnp.where(ok, t_c, 0.0), pair_rows, num_segments=nbatch
    )
    return jnp.minimum(tmin, mn), jnp.maximum(tmax, mx)


def _attenuate_and_bin_multi(
    mic_rows, pair_rows, volumes, positions, times, spec: AttenSpec,
    length: int, sample_rate, weight=None, init_hist=None, nbatch: int = 1,
    tstats=None,
):
    """Per-pair fused attenuation + scatter: (M, 8) impulses with per-row
    mic/pair -> accumulate into a (B, C, 8, length) histogram bank.

    The per-channel math is ops.render._attenuate_and_bin's exactly; only
    the scatter target gains the pair dimension. `tstats` ((B,) tmin,
    (B,) tmax accumulators) additionally folds the post-attenuation time
    stats per pair; the return then becomes (hist, tmin, tmax)."""
    nonzero = jnp.any(volumes != 0, axis=-1)
    if weight is not None:
        nonzero = nonzero & (weight > 0)
    basis = None
    if spec.is_hrtf:
        from ..ops.attenuate import head_basis

        basis = head_basis(spec.facing, spec.up)

    hist = (
        jnp.zeros((nbatch, spec.nchannels, NUM_BANDS, length), jnp.float32)
        if init_hist is None
        else init_hist
    )
    tmin, tmax = tstats if tstats is not None else (None, None)
    for c in range(spec.nchannels):
        if spec.is_hrtf:
            gains, t_c = _hrtf_channel(
                mic_rows, positions, times, spec.table, basis, c
            )
            vol_c = volumes * gains
        else:
            gain = _speaker_gain(
                mic_rows, positions, spec.speaker_dirs[c], spec.speaker_coeffs[c]
            )
            vol_c = volumes * gain[:, None]
            t_c = times
        if tstats is not None:
            tmin, tmax = _pair_time_stats(
                pair_rows, t_c, nonzero, nbatch, tmin, tmax
            )
        idx = jnp.floor(t_c * sample_rate + 0.5).astype(jnp.int32)
        idx = jnp.where(nonzero, idx, length)  # out of range -> dropped
        vol_c = jnp.where(nonzero[:, None], vol_c, 0.0)
        # advanced indices (pair, idx) straddle the band slice, so the
        # gathered/scattered dims come first: (M, 8) update rows
        hist = hist.at[pair_rows, c, :, idx].add(vol_c, mode="drop")
    if tstats is not None:
        return hist, tmin, tmax
    return hist


def _bin_rows_sorted_multi(
    mic_rows, pair_rows, volumes, positions, times, spec: AttenSpec,
    length: int, sample_rate, nbatch: int, init_hist=None, tstats=None,
):
    """Scatter-free per-pair binning: rows sort by the flattened
    (pair * length + bin) key, so one segmented suffix-sum + searchsorted
    pass builds the whole (B, C, 8, length) bank densely — the multi-pair
    analogue of ops.render._bin_rows_sorted (XLA's TPU scatter serialises
    per update row, which dominates the per-bounce consume graph)."""
    nonzero = jnp.any(volumes != 0, axis=-1)
    basis = None
    if spec.is_hrtf:
        from ..ops.attenuate import head_basis

        basis = head_basis(spec.facing, spec.up)

    flat_len = nbatch * length
    sentinel = jnp.int32(flat_len)

    def _key_for(t_c):
        idx = jnp.floor(t_c * sample_rate + 0.5).astype(jnp.int32)
        ok = nonzero & (idx >= 0) & (idx < length)
        return jnp.where(ok, pair_rows * np.int32(length) + idx, sentinel)

    chans = []
    tmin, tmax = tstats if tstats is not None else (None, None)
    for c in range(spec.nchannels):
        if spec.is_hrtf:
            gains, t_c = _hrtf_channel(
                mic_rows, positions, times, spec.table, basis, c
            )
            vol_c = volumes * gains
        else:
            gain = _speaker_gain(
                mic_rows, positions, spec.speaker_dirs[c],
                spec.speaker_coeffs[c],
            )
            vol_c = volumes * gain[:, None]
            t_c = times
        if tstats is not None:
            tmin, tmax = _pair_time_stats(
                pair_rows, t_c, nonzero, nbatch, tmin, tmax
            )
        key = _key_for(t_c)
        perm = jnp.argsort(key)
        sk = key[perm]
        sv = vol_c[perm]
        dense = _dense_from_runs(
            sk, _segmented_run_totals(sk, sv), flat_len
        )  # (8, B*length)
        chans.append(dense.reshape(NUM_BANDS, nbatch, length))
    hist = jnp.stack(chans, axis=0).transpose(2, 0, 1, 3)  # (B, C, 8, L)
    if init_hist is not None:
        hist = init_hist + hist
    if tstats is not None:
        return hist, tmin, tmax
    return hist


@partial(
    jax.jit,
    static_argnames=(
        "nbatch",
        "nreflections",
        "length",
        "impl",
        "spec_static",
        "bin_mode",
    ),
)
def _batched_trace_bin(
    soup,
    mics,        # (B, 3)
    sources,     # (B, 3)
    dirs_flat,   # (Mp, 3) all pairs' rays (padded to _ROW_ALIGN)
    pair_id,     # (Mp,) int32 row -> pair
    nvalid,      # () int32: rows at/after are padding
    spec_arrays,
    *,
    nbatch: int,
    nreflections: int,
    length: int,
    impl: str,
    sample_rate,
    spec_static,
    bin_mode: str = "sorted",
):
    """One fused multi-pair trace+bin program: returns the (B, C, 8, L)
    diffuse histogram bank, the flattened image-slot records with
    pair-seeded dedup hashes, and per-pair (B,) post-attenuation diffuse
    time bounds (tmin, tmax) for predelay/content accounting."""
    from ..ops.trace import _trace_impl

    is_hrtf, nchannels = spec_static
    spec = AttenSpec(is_hrtf, nchannels, *spec_arrays)
    m = dirs_flat.shape[0]

    tmin0 = jnp.full((nbatch,), jnp.inf, jnp.float32)
    tmax0 = jnp.zeros((nbatch,), jnp.float32)

    # int32 flattened (pair * length + bin) keys gate the sorted path
    sorted_bin = bin_mode != "scatter" and nbatch * length < (1 << 31)
    if sorted_bin:

        def consume(bufs, row):
            vol, pos, tim, _mic_rows, _pair_rows = row
            return _collect_row(bufs, (vol, pos, tim))

        aux0 = _row_buffers(nreflections, m)
    else:

        def consume(aux, row):
            hist, tmin, tmax = aux
            vol, pos, tim, mic_rows, pair_rows = row
            return _attenuate_and_bin_multi(
                mic_rows, pair_rows, vol, pos, tim, spec, length,
                sample_rate, init_hist=hist, tstats=(tmin, tmax),
            )

        aux0 = (
            jnp.zeros((nbatch, nchannels, NUM_BANDS, length), jnp.float32),
            tmin0,
            tmax0,
        )
    # resort on whenever the scene has enough blocks for the AABB cull to
    # matter (same policy as render_fused)
    resort = bool(m >= 4096 and soup.block_aabb.shape[0] >= 32)
    aux_out, images, _overflow = _trace_impl(
        soup,
        mics,
        sources,
        dirs_flat,
        nreflections=nreflections,
        impl=impl,
        consume_row=consume,
        aux0=aux0,
        nvalid=nvalid,
        resort=resort,
        pair_id=pair_id,
    )
    if sorted_bin:
        bv, bp, bt, _ = aux_out
        r = bv.shape[0]
        pair_flat = jnp.broadcast_to(pair_id[None, :], (r, m)).reshape(-1)
        hist, tmin, tmax = _bin_rows_sorted_multi(
            mics[pair_flat],
            pair_flat,
            bv.reshape(-1, NUM_BANDS),
            bp.reshape(-1, 3),
            bt.reshape(-1),
            spec,
            length,
            sample_rate,
            nbatch,
            tstats=(tmin0, tmax0),
        )
    else:
        hist, tmin, tmax = aux_out
    img_vol, img_pos, img_time, img_idx = images

    h1, h2 = chain_hashes(img_idx)
    # seed the chain identity with the pair: chains never dedup across
    # pairs (each pair is its own reference render / std::map)
    pair_u = pair_id.astype(jnp.uint32)[:, None]
    h1 = _mix32(h1 ^ pair_u)
    h2 = _mix32(h2 + (pair_u * np.uint32(0x9E3779B9)))
    slots = jnp.broadcast_to(
        jnp.arange(NUM_IMAGE_SOURCE, dtype=jnp.int32)[None, :], img_idx.shape
    )
    ray_ok = jnp.arange(m) < nvalid
    valid = ((slots == 0) | (img_idx != 0)) & ray_ok[:, None]
    return hist, (img_vol, img_pos, img_time, slots, valid, h1, h2), tmin, tmax


@partial(
    jax.jit,
    static_argnames=(
        "nbatch", "length", "spec_static", "remove_direct", "trim_predelay",
    ),
)
def _finalize_hist_batched(
    hist,        # (B, C, 8, L)
    imgs,        # flattened image tuple from _batched_trace_bin
    pair_id,     # (Mp,)
    mics,        # (B, 3)
    spec_arrays,
    sample_rate,
    tmin,        # (B,) per-pair diffuse min post-attenuation time
    tmax,        # (B,) per-pair diffuse max post-attenuation time
    *,
    nbatch: int,
    length: int,
    spec_static,
    remove_direct: bool,
    trim_predelay: bool = False,
):
    """Cross-ray image dedup (pair-seeded keys, one global sort) + binning
    into the histogram bank, then the per-pair predelay shift
    (fixPredelay, rayverb.h:77-97 — the single-pair _finalize_hist's
    whole-histogram gather-shift, vmapped over pairs) when trim_predelay.
    Returns (hist, per-pair content lengths, per-pair predelay seconds)."""
    is_hrtf, nchannels = spec_static
    spec = AttenSpec(is_hrtf, nchannels, *spec_arrays)
    img_vol, img_pos, img_time, img_slot, img_valid, h1, h2 = imgs
    s = img_vol.shape[1]
    m = img_vol.shape[0] * s
    h1 = h1.reshape(m)
    h2 = h2.reshape(m)
    valid = img_valid.reshape(m)
    if remove_direct:
        valid = valid & (img_slot.reshape(m) != 0)
    sent = np.uint32(0xFFFFFFFF)
    k1 = jnp.where(valid, h1, sent)
    k2 = jnp.where(valid, h2, sent)
    row = jnp.arange(m, dtype=jnp.int32)
    s1, s2, srow, svalid = jax.lax.sort(
        (k1, k2, row, valid.astype(jnp.int32)), num_keys=2
    )
    first = jnp.concatenate(
        [jnp.ones((1,), bool), (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])]
    )
    selected = first & (svalid == 1)
    weight = jnp.zeros((m,), jnp.float32).at[srow].add(
        selected.astype(jnp.float32)
    )
    pair_rows = jnp.repeat(pair_id, s)
    # image times participate in the per-pair predelay/content stats like
    # the single-pair path's _image_time_stats (duplicate chains share
    # identical times, so pre-dedup admission — valid & nonzero — gives
    # the same min/max as the deduped set)
    img_ok = valid & jnp.any(img_vol.reshape(m, NUM_BANDS) != 0, axis=-1)
    hist, tmin, tmax = _attenuate_and_bin_multi(
        mics[pair_rows],
        pair_rows,
        jnp.where(img_ok[:, None], img_vol.reshape(m, NUM_BANDS), 0.0),
        img_pos.reshape(m, 3),
        img_time.reshape(m),
        spec,
        length,
        sample_rate,
        weight=weight,
        init_hist=hist,
        nbatch=nbatch,
        tstats=(tmin, tmax),
    )
    predelay = jnp.where(jnp.isfinite(tmin), tmin, 0.0)
    if trim_predelay:
        # per-pair whole-histogram shift; bins at/before the shift CLAMP
        # into bin 0 (t = max(t - pd, 0)) — identical arithmetic to the
        # single-pair _finalize_hist predelay branch
        shift = jnp.floor(predelay * sample_rate + 0.5).astype(jnp.int32)
        pos = jnp.arange(length)
        src = pos[None, :] + shift[:, None]           # (B, L)
        gathered = jnp.take_along_axis(
            hist.reshape(nbatch, -1, length),
            jnp.clip(src, 0, length - 1)[:, None, :],
            axis=-1,
        )
        gathered = jnp.where(src[:, None, :] < length, gathered, 0.0)
        head = jnp.sum(
            jnp.where(
                pos[None, None, :] <= shift[:, None, None],
                hist.reshape(nbatch, -1, length),
                0.0,
            ),
            axis=-1,
        )
        hist = (
            gathered.at[..., 0].set(head).reshape(hist.shape)
        )
    occupied = jnp.any(hist != 0, axis=(1, 2))  # (B, L)
    content = (
        jnp.max(
            jnp.where(occupied, jnp.arange(length)[None, :], -1), axis=-1
        )
        + 1
    )
    return hist, content, predelay


def render_irs_batched(
    scene,
    config: RenderConfig,
    sources,
    mics,
    directions,
    *,
    hrtf_table=None,
    mesh: Mesh | None = None,
    batch_axis: str = "batch",
    impl: str = "auto",
    microbatch: int | None = None,
):
    """Render B impulse responses in one jit with SHARED sweeps.

    sources, mics: (B, 3); directions: (B, N, 3) (independent ray sets per
    pair, or broadcast one set with np.broadcast_to).
    Returns (irs (B, C, L) float32, content_lengths (B,) int32).

    config.trim_predelay applies per pair on device (the single-pair
    path's pre-filter histogram shift). config.trim_tail needs dynamic
    per-pair lengths — slice the fixed-shape outputs host-side with
    `trim_batch(irs, contents, config)`.

    mesh: optional ('batch',)-axis device mesh — pairs are shard_mapped
    across devices (B must divide by the axis size; pairs are independent,
    so no collective traffic at all).

    microbatch: accepted for API compatibility (the lax.map knob of the
    r3 vmap implementation); the merged-sweep path needs no microbatching
    and ignores it.
    """
    del microbatch
    soup = soup_from_scene(scene)
    spec = make_atten_spec(config.attenuation_model, hrtf_table)
    spec_static = (spec.is_hrtf, spec.nchannels)
    spec_arrays = tuple(spec[2:])
    length = histogram_length(scene, config.reflections, config.sample_rate)

    sources = jnp.asarray(sources, jnp.float32)
    mics = jnp.asarray(mics, jnp.float32)
    directions = jnp.asarray(directions, jnp.float32)
    b, n = directions.shape[0], directions.shape[1]

    filter_params, flips, nfft, filter_method = finalize_filter_params(
        config.filter, config.sample_rate, config.hipass, length
    )

    filter_one = partial(
        _finalize_filter,
        flips=flips,
        nfft=nfft,
        do_normalize=config.normalize,
        filter_method=filter_method,
    )

    def run_local(mics_l, sources_l, dirs_l):
        """Fused render of the (local) batch: (Bl, 3), (Bl, 3),
        (Bl, N, 3) -> ((Bl, C, L'), (Bl,))."""
        bl = mics_l.shape[0]
        mlocal = bl * n
        mp = -(-mlocal // _ROW_ALIGN) * _ROW_ALIGN
        dirs_flat = dirs_l.reshape(mlocal, 3)
        pair_id = jnp.repeat(jnp.arange(bl, dtype=jnp.int32), n)
        if mp != mlocal:
            pad = jnp.zeros((mp - mlocal, 3), jnp.float32).at[:, 2].set(1.0)
            dirs_flat = jnp.concatenate([dirs_flat, pad], axis=0)
            pair_id = jnp.concatenate(
                [pair_id, jnp.zeros((mp - mlocal,), jnp.int32)]
            )
        hist, imgs, tmin, tmax = _batched_trace_bin(
            soup,
            mics_l,
            sources_l,
            dirs_flat,
            pair_id,
            jnp.int32(mlocal),
            spec_arrays,
            nbatch=bl,
            nreflections=config.reflections,
            length=length,
            impl=impl,
            sample_rate=jnp.float32(config.sample_rate),
            spec_static=spec_static,
            bin_mode=_bin_mode(),
        )
        hist, content, _predelay = _finalize_hist_batched(
            hist,
            imgs,
            pair_id,
            mics_l,
            spec_arrays,
            jnp.float32(config.sample_rate),
            tmin,
            tmax,
            nbatch=bl,
            length=length,
            spec_static=spec_static,
            remove_direct=config.remove_direct,
            trim_predelay=config.trim_predelay,
        )
        mixed, _trim = jax.vmap(filter_one, in_axes=(0, 0, None, None))(
            hist, content, filter_params, jnp.float32(config.volume_scale)
        )
        return mixed, content

    if mesh is None:
        irs, contents = run_local(mics, sources, directions)
    else:
        if b % mesh.shape[batch_axis]:
            raise ValueError(
                f"batch {b} must divide across the '{batch_axis}' axis "
                f"({mesh.shape[batch_axis]} devices)"
            )
        spec_b = P(batch_axis)
        irs, contents = jax.jit(
            jax.shard_map(
                run_local,
                mesh=mesh,
                in_specs=(spec_b, spec_b, spec_b),
                out_specs=(spec_b, spec_b),
            )
        )(mics, sources, directions)
    return irs, contents


def trim_batch(irs, contents, config: RenderConfig):
    """Slice the fixed-shape (B, C, L) batched outputs to per-pair
    reference-parity lengths, host-side. Reproduces render_fused's output
    sizing exactly: content length always bounds the IR (flatten length,
    rayverb.cpp:53-57), and with config.trim_tail the tail below amplitude
    1e-5 is cut (trimTail, rayverb.cpp:96-122 — same arithmetic as the
    fused path's _finalize_filter trim scalar). Returns a list of
    (C, L_i) float32 arrays — lengths differ per pair, hence a list."""
    from ..constants import TRIM_TAIL_FLOOR

    irs = np.asarray(irs)
    contents = np.asarray(contents)
    out = []
    for i in range(irs.shape[0]):
        content = int(contents[i])
        if config.trim_tail:
            positions = np.arange(irs.shape[-1])[None, :]
            loud = (np.abs(irs[i]) >= TRIM_TAIL_FLOOR) & (
                positions < content
            )
            last = int(np.max(np.where(loud, positions, -1)))
            out_len = min(max(last, 0), content)
        else:
            out_len = content
        out.append(irs[i, :, :out_len])
    return out
