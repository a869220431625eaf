"""Multi-chip scaling: rays sharded over a device mesh.

The reference is strictly single-device; its only parallelism is SIMT over
rays plus 4096-ray batching (SURVEY.md §2 checklist). The TPU-native scale
story (SURVEY.md §2 'First-class TPU-native equivalents'):

  - scene geometry is REPLICATED on every chip (scenes are small relative
    to HBM; replication removes all gather traffic from the hot loop)
  - rays are SHARDED 1-D over the 'rays' mesh axis; each chip traces its
    shard — with the production single-chip structure intact: Morton-
    sorted coherent bundles, chunked lax.scan binning into a shard-local
    (C, 8, L) energy histogram, and SEG_PAIR_BUDGET segmentation so no
    single dispatched program runs for minutes
  - each shard folds its image-source records into a fixed-budget
    on-device dedup buffer (sort by chain hash, keep firsts — the same
    selection _finalize performs globally), so the only data that ever
    crosses chips is (budget × record) per shard instead of
    (rays × slots × record): ~100x smaller at north-star scale
  - the only collectives are the final histogram reduction and the small
    deduped-record gather (both ride ICI; XLA inserts them from the
    shardings)
  - batched IR datagen adds a second 'batch' axis: vmap over
    source/receiver pairs, sharded batch x rays (parallel/datagen.py)

This yields linear scaling in rays/chip: there is no cross-ray
communication anywhere in the trace itself.

Duplicate image chains produce bit-identical records on every shard (the
mirrored image position/time and the pre-bounce volume depend only on the
surface chain), so per-shard pre-dedup cannot change the final selection.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import NUM_BANDS, NUM_IMAGE_SOURCE, SECONDS_PER_METER


# Per-shard deduped image-record budget. Validated image chains are scarce
# (a handful of early reflections per geometric configuration — the
# reference's dedup map holds tens to hundreds of entries); the budget is
# checked on device and the render retries with 4x the budget if a scene
# ever produces more distinct chains.
DEFAULT_IMAGE_BUDGET = 4096


def make_mesh(num_devices: int | None = None, axis: str = "rays") -> Mesh:
    """1-D device mesh over the ray axis."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_rays(directions: np.ndarray, mesh: Mesh, axis: str = "rays"):
    """Pad rays to a multiple of the mesh size and return
    (sharded directions, valid count)."""
    n = directions.shape[0]
    d = mesh.devices.size
    per = -(-n // d)
    padded = per * d
    if padded != n:
        pad = np.zeros((padded - n, 3), np.float32)
        pad[:, 2] = 1.0
        directions = np.concatenate([directions, pad], axis=0)
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(directions, sharding), n


def _merge_dedup(buf, new, budget: int):
    """Fold `new` image records into the per-shard dedup buffer.

    buf/new: tuples (volume (M,8), position (M,3), time (M,), slot (M,),
    valid (M,), h1 (M,), h2 (M,)). Keeps the first record of each distinct
    (h1, h2) chain — the same admission _finalize applies globally
    (reference map insert, rayverb.cpp:653-676) — compacted into the
    leading `budget` rows. Returns (buffer, new_count, overflowed)."""
    vol = jnp.concatenate([buf[0], new[0]], axis=0)
    pos = jnp.concatenate([buf[1], new[1]], axis=0)
    tim = jnp.concatenate([buf[2], new[2]], axis=0)
    slot = jnp.concatenate([buf[3], new[3]], axis=0)
    valid = jnp.concatenate([buf[4], new[4]], axis=0)
    h1 = jnp.concatenate([buf[5], new[5]], axis=0)
    h2 = jnp.concatenate([buf[6], new[6]], axis=0)
    m = h1.shape[0]

    sent = np.uint32(0xFFFFFFFF)
    k1 = jnp.where(valid, h1, sent)
    k2 = jnp.where(valid, h2, sent)
    seq = jnp.arange(m, dtype=jnp.int32)  # buffer rows (earlier) sort first
    s1, s2, srow = jax.lax.sort((k1, k2, seq), num_keys=3)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])]
    )
    svalid = valid[srow]
    selected = first & svalid
    ncount = jnp.sum(selected.astype(jnp.int32))

    # compact selected rows to the front, preserving hash order
    big = jnp.int32(m)
    keep_key = jnp.where(selected, jnp.arange(m, dtype=jnp.int32), big)
    skey, crow = jax.lax.sort((keep_key, srow), num_keys=1)
    crow = crow[:budget]
    csel = skey[:budget] < big

    out = (
        jnp.where(csel[:, None], vol[crow], 0.0),
        jnp.where(csel[:, None], pos[crow], 0.0),
        jnp.where(csel, tim[crow], 0.0),
        jnp.where(csel, slot[crow], 0),
        csel,
        jnp.where(csel, h1[crow], 0),
        jnp.where(csel, h2[crow], 0),
    )
    return out, ncount, ncount > budget


def _empty_buffer(budget: int):
    return (
        jnp.zeros((budget, NUM_BANDS), jnp.float32),
        jnp.zeros((budget, 3), jnp.float32),
        jnp.zeros((budget,), jnp.float32),
        jnp.zeros((budget,), jnp.int32),
        jnp.zeros((budget,), bool),
        jnp.zeros((budget,), jnp.uint32),
        jnp.zeros((budget,), jnp.uint32),
    )


def render_fused_sharded(
    scene,
    config,
    directions,
    *,
    mesh: Mesh | None = None,
    hrtf_table=None,
    impl: str = "auto",
    ray_chunk: int | None = None,
    image_budget: int = DEFAULT_IMAGE_BUDGET,
    stats: bool = False,
):
    """Drop-in multi-device version of ops.render.render_fused.

    Shards rays over all visible devices, traces with the production
    single-chip structure per shard (chunk scan + segment dispatch +
    per-bounce re-sort), pre-dedups image records per shard, reduces over
    ICI, finalizes once over a content-sized bucket.
    """
    import time as _time

    from ..config.schema import OutputMode
    from ..ops.intersect import soup_from_scene
    from ..ops.render import (
        RAY_BLOCK_SORT,
        SEG_PAIR_BUDGET,
        _chunk_core,
        _finalize,
        _image_time_stats,
        _slice_hist,
        AttenSpec,
        finalize_filter_params,
        histogram_length,
        make_atten_spec,
        sweep_pair_tests,
    )

    t_start = _time.perf_counter()
    timings: dict = {}
    if mesh is None:
        mesh = make_mesh()
    axis = mesh.axis_names[0]
    d = mesh.devices.size

    soup = soup_from_scene(scene)
    spec = make_atten_spec(config.attenuation_model, hrtf_table)
    spec_static = (spec.is_hrtf, spec.nchannels)
    spec_arrays = tuple(spec[2:])
    length = histogram_length(scene, config.reflections, config.sample_rate)

    directions = np.asarray(directions, np.float32)
    n = directions.shape[0]
    if n >= 4 * RAY_BLOCK_SORT:
        from ..utils.directions import morton_sort

        directions = morton_sort(directions)

    # layout: (d, nchunks, chunk, 3); shards own contiguous Morton ranges
    per = -(-n // d)
    if ray_chunk is None:
        ray_chunk = 16384
    chunk = min(per, ray_chunk)
    nchunks = -(-per // chunk)
    resort = bool(chunk >= 4096 and soup.block_aabb.shape[0] >= 32)

    # segment dispatch: bound each dispatched program's device time the
    # same way render_fused does (the tunneled worker kills minutes-long
    # programs); each segment advances every shard by `seg` chunks
    est = max(sweep_pair_tests(chunk, soup.num_padded, config.reflections), 1)
    seg = int(max(1, min(nchunks, SEG_PAIR_BUDGET // est)))
    nseg = -(-nchunks // seg)
    nchunks_pad = nseg * seg
    padded = d * nchunks_pad * chunk

    if padded != n:
        pad = np.zeros((padded - n, 3), np.float32)
        pad[:, 2] = 1.0
        directions = np.concatenate([directions, pad], axis=0)
    dirs_all = directions.reshape(d, nchunks_pad, chunk, 3)
    counts = np.minimum(
        np.maximum(n - np.arange(d * nchunks_pad) * chunk, 0), chunk
    ).astype(np.int32).reshape(d, nchunks_pad)

    include_diffuse = config.output_mode in (
        OutputMode.ALL,
        OutputMode.DIFFUSE_ONLY,
    )
    include_images = config.output_mode in (
        OutputMode.ALL,
        OutputMode.IMAGE_ONLY,
    )

    shard_spec = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    dirs_dev = jax.device_put(dirs_all, shard_spec)
    counts_dev = jax.device_put(jnp.asarray(counts), shard_spec)

    def seg_step(dirs_seg, counts_seg, hist, buf, buf_count, overflow):
        """One segment for one shard: scan `seg` chunks, fold images into
        the dedup buffer. All arguments are the shard-local blocks."""
        dirs_seg = dirs_seg[0]      # (seg, chunk, 3)
        counts_seg = counts_seg[0]  # (seg,)
        hist0 = hist[0]             # (C, 8, L) shard-local accumulator
        buf = tuple(b[0] for b in buf)
        buf_count = buf_count[0]
        overflow = overflow[0]
        spec_l = AttenSpec(*spec_static, *spec_arrays)

        def body(carry, xs):
            h, mx, mn = carry
            dirs_c, nv = xs
            out = _chunk_core(
                soup,
                config.mic_position,
                config.source_position,
                dirs_c,
                nv,
                spec_l,
                nreflections=config.reflections,
                length=length,
                sample_rate=config.sample_rate,
                impl=impl,
                include_diffuse=include_diffuse,
                init_hist=h,
                resort=resort,
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
            return (
                (out.hist, jnp.maximum(mx, out.max_time), jnp.minimum(mn, out.min_time)),
                ys,
            )

        (hist_out, max_t, min_t), ys = jax.lax.scan(
            body,
            (hist0, jnp.float32(0.0), jnp.float32(jnp.inf)),
            (dirs_seg, counts_seg),
        )
        m = seg * chunk * NUM_IMAGE_SOURCE
        new = tuple(y.reshape((m,) + y.shape[3:]) for y in ys)
        buf, buf_count_new, over = _merge_dedup(buf, new, image_budget)
        buf_count = jnp.maximum(buf_count, buf_count_new)
        overflow = overflow | over

        return (
            hist_out[None],
            tuple(b[None] for b in buf),
            buf_count[None],
            overflow[None],
            max_t[None],
            min_t[None],
        )

    stepped = jax.jit(
        jax.shard_map(
            seg_step,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), tuple([P(axis)] * 7), P(axis), P(axis)),
            out_specs=(P(axis), tuple([P(axis)] * 7), P(axis), P(axis), P(axis), P(axis)),
            check_vma=False,
        )
    )

    hist = jax.device_put(
        jnp.zeros((d, spec.nchannels, NUM_BANDS, length), jnp.float32),
        shard_spec,
    )
    buf = tuple(
        jax.device_put(jnp.stack([e] * d), shard_spec)
        for e in _empty_buffer(image_budget)
    )
    buf_count = jax.device_put(jnp.zeros((d,), jnp.int32), shard_spec)
    overflow = jax.device_put(jnp.zeros((d,), bool), shard_spec)
    max_t_sh = min_t_sh = None
    for s in range(nseg):
        sl = slice(s * seg, (s + 1) * seg)
        hist, buf, buf_count, overflow, mx_s, mn_s = stepped(
            dirs_dev[:, sl], counts_dev[:, sl], hist, buf, buf_count, overflow
        )
        max_t_sh = mx_s if max_t_sh is None else jnp.maximum(max_t_sh, mx_s)
        min_t_sh = mn_s if min_t_sh is None else jnp.minimum(min_t_sh, mn_s)

    if bool(jnp.any(overflow)):
        if image_budget >= padded * NUM_IMAGE_SOURCE:
            raise RuntimeError("image dedup buffer overflow at full size")
        return render_fused_sharded(
            scene,
            config,
            directions[:n],
            mesh=mesh,
            hrtf_table=hrtf_table,
            impl=impl,
            ray_chunk=ray_chunk,
            image_budget=min(image_budget * 4, padded * NUM_IMAGE_SOURCE),
            stats=stats,
        )

    # cross-shard reductions: XLA inserts the psum/gather from shardings
    hist_total = jax.jit(lambda h: jnp.sum(h, axis=0))(hist)
    img_volume, img_position, img_time, img_slot, img_valid, img_h1, img_h2 = (
        b.reshape((d * image_budget,) + b.shape[2:]) for b in buf
    )
    if stats:
        jax.block_until_ready(hist_total)
        timings["trace_bin"] = _time.perf_counter() - t_start
        t_mark = _time.perf_counter()

    max_t = float(jnp.max(max_t_sh))
    min_time = float(jnp.min(min_t_sh))
    if include_images:
        img_min, img_max = _image_time_stats(
            img_valid,
            img_slot,
            img_time,
            img_position,
            img_volume,
            np.asarray(config.mic_position, np.float32),
            spec_arrays,
            spec_static=spec_static,
            remove_direct=config.remove_direct,
        )
        min_time = min(min_time, float(img_min))
        max_t = max(max_t, float(img_max))
    predelay = (
        float(min_time)
        if config.trim_predelay and np.isfinite(min_time)
        else None
    )

    # content-bucket finalize (same policy as render_fused): filter scans
    # cost O(L), so run them over a power-of-two bucket covering the
    # actual content instead of the conservative scene bound
    bucket = length
    if max_t > 0:
        need = (
            int(
                np.floor(
                    (max_t + 0.1 * SECONDS_PER_METER) * config.sample_rate + 0.5
                )
            )
            + 8
        )
        bucket = min(length, max(4096, 1 << (need - 1).bit_length()))
    if bucket < length:
        hist_total = _slice_hist(hist_total, bucket=bucket)

    filter_params, flips, nfft, filter_method = finalize_filter_params(
        config.filter, config.sample_rate, config.hipass, bucket
    )

    mixed, trim_len, content_len = _finalize(
        hist_total,
        img_volume,
        img_position,
        img_time,
        img_slot,
        img_valid,
        img_h1,
        img_h2,
        np.asarray(config.mic_position, np.float32),
        spec_arrays,
        filter_params,
        None if predelay is None else np.float32(predelay),
        np.float32(config.volume_scale),
        np.float32(config.sample_rate),
        length=bucket,
        spec_static=spec_static,
        include_images=include_images,
        remove_direct=config.remove_direct,
        flips=flips,
        nfft=nfft,
        do_normalize=config.normalize,
        filter_method=filter_method,
    )
    content = int(content_len)
    out_len = min(int(trim_len), content) if config.trim_tail else content
    channels = np.asarray(mixed[..., : max(out_len, 1)])[:, :out_len]
    info = {
        "predelay": predelay or 0.0,
        "mesh": mesh.shape,
        "image_rows_gathered": d * image_budget,
        # per-shard distinct chain counts, summed. Shards can share chains
        # (the direct path, low-order reflections every shard sees), so
        # this UPPER-bounds the global distinct count — use it to size
        # image_budget (it bounds each shard's buffer need), not as a
        # global dedup statistic (ADVICE r3).
        "image_rows_distinct_per_shard_sum": int(jnp.sum(buf_count)),
        "image_rows_distinct_per_shard_max": int(jnp.max(buf_count)),
        "segments": nseg,
        "resort": resort,
    }
    if stats:
        timings["finalize"] = _time.perf_counter() - t_mark
        timings["total"] = _time.perf_counter() - t_start
        info["timings"] = timings
    return channels, info
