"""Multi-chip scaling: rays sharded over a device mesh.

The reference is strictly single-device; its only parallelism is SIMT over
rays plus 4096-ray batching (SURVEY.md §2 checklist). The TPU-native scale
story (SURVEY.md §2 'First-class TPU-native equivalents'):

  - scene geometry is REPLICATED on every chip (scenes are small relative
    to HBM; replication removes all gather traffic from the hot loop)
  - rays are SHARDED 1-D over the 'rays' mesh axis; each chip traces its
    shard and bins it into a local (C, 8, L) energy histogram
  - the only collectives are one psum over the histograms and one
    all_gather of the compact image-source records (both ride ICI)
  - batched IR datagen adds a second 'batch' axis: vmap over
    source/receiver pairs, sharded batch x rays

This yields linear scaling in rays/chip: there is no cross-ray
communication anywhere in the trace itself.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.render import _fused_chunk


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


def render_fused_sharded(
    scene,
    config,
    directions,
    *,
    mesh: Mesh | None = None,
    hrtf_table=None,
    impl: str = "auto",
):
    """Drop-in multi-device version of ops.render.render_fused.

    Shards rays over all visible devices, reduces over ICI, finalizes once.
    """
    from ..ops.render import (
        _finalize,
        finalize_filter_params,
        histogram_length,
        make_atten_spec,
    )
    from ..config.schema import OutputMode
    from ..ops.intersect import soup_from_scene

    if mesh is None:
        mesh = make_mesh()
    axis = mesh.axis_names[0]

    soup = soup_from_scene(scene)
    spec = make_atten_spec(config.attenuation_model, hrtf_table)
    length = histogram_length(scene, config.reflections, config.sample_rate)

    directions = np.asarray(directions, np.float32)
    n = directions.shape[0]
    dirs_sharded, _ = shard_rays(directions, mesh, axis)
    # mask padding on the last shard via per-device counts
    d = mesh.devices.size
    per = dirs_sharded.shape[0] // d
    counts = np.minimum(
        np.maximum(n - np.arange(d) * per, 0), per
    ).astype(np.int32)

    spec_static = (spec.is_hrtf, spec.nchannels)
    spec_arrays = tuple(spec[2:])

    def local_step(dirs_shard, nvalid_shard):
        out = _fused_chunk(
            soup,
            config.mic_position,
            config.source_position,
            dirs_shard,
            nvalid_shard[0],
            spec_arrays,
            nreflections=config.reflections,
            length=length,
            sample_rate=config.sample_rate,
            impl=impl,
            spec_static=spec_static,
            include_diffuse=config.output_mode
            in (OutputMode.ALL, OutputMode.DIFFUSE_ONLY),
        )
        hist = jax.lax.psum(out.hist, axis)
        gather = lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True)
        return (
            hist,
            gather(out.img_volume),
            gather(out.img_position),
            gather(out.img_time),
            gather(out.img_slot),
            gather(out.img_valid),
            gather(out.img_h1),
            gather(out.img_h2),
            jax.lax.pmax(out.max_time, axis),
            jax.lax.pmin(out.min_time, axis),
        )

    stepped = jax.jit(
        jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=(P(),) * 10,
            check_vma=False,
        )
    )
    (
        hist,
        img_volume,
        img_position,
        img_time,
        img_slot,
        img_valid,
        img_h1,
        img_h2,
        max_t,
        min_t,
    ) = stepped(dirs_sharded, jnp.asarray(counts))

    include_images = config.output_mode in (OutputMode.ALL, OutputMode.IMAGE_ONLY)
    min_time = float(min_t)
    if include_images:
        from ..ops.render import _image_time_stats

        img_min, _ = _image_time_stats(
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
    predelay = (
        float(min_time)
        if config.trim_predelay and np.isfinite(min_time)
        else None
    )

    filter_params, flips, nfft, filter_method = finalize_filter_params(
        config.filter, config.sample_rate, config.hipass, length
    )

    mixed, trim_len, content_len = _finalize(
        hist,
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
        length=length,
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
    return channels, {"predelay": predelay or 0.0, "mesh": mesh.shape}
