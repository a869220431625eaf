"""Batched IR data generation: many source/receiver pairs in one program.

The reference generates IR corpora by shelling out ~200 independent CLI
invocations (demo/gen.sh) — embarrassing job parallelism. The TPU-native
equivalent runs a whole batch of source/receiver pairs through ONE compiled
program: vmap over pairs on top of the fused trace+bin chunk, optionally
sharded over a ('batch', ...) mesh axis so pairs spread across chips
(BASELINE.json config 5).

Outputs are fixed-shape (B, C, L) IRs plus per-pair content lengths;
per-pair predelay/tail trimming is left to the caller (dynamic shapes do
not batch).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config.schema import RenderConfig
from ..ops.render import (
    _finalize,
    _fused_chunk,
    finalize_filter_params,
    histogram_length,
    make_atten_spec,
)
from ..ops.intersect import soup_from_scene


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
    """Render B impulse responses in one jit.

    sources, mics: (B, 3); directions: (B, N, 3) (independent ray sets per
    pair, or broadcast one set with np.broadcast_to).
    Returns (irs (B, C, L) float32, content_lengths (B,) int32).

    microbatch: process the batch as lax.map over vmapped sub-batches of
    this size (must divide B) — bounds peak memory (the fully-vmapped
    trace pads small trailing dims onto 128-wide lanes, a ~40x expansion
    at B=64 x 4096 rays) while staying a single compiled program.
    """
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

    def one_pair(mic, source, dirs):
        out = _fused_chunk(
            soup,
            mic,
            source,
            dirs,
            jnp.int32(n),
            spec_arrays,
            nreflections=config.reflections,
            length=length,
            sample_rate=config.sample_rate,
            impl=impl,
            spec_static=spec_static,
            include_diffuse=True,
        )
        mixed, _trim, content = _finalize(
            out.hist,
            out.img_volume,
            out.img_position,
            out.img_time,
            out.img_slot,
            out.img_valid,
            out.img_h1,
            out.img_h2,
            mic,
            spec_arrays,
            filter_params,
            None,
            jnp.float32(config.volume_scale),
            jnp.float32(config.sample_rate),
            length=length,
            spec_static=spec_static,
            include_images=True,
            remove_direct=config.remove_direct,
            flips=flips,
            nfft=nfft,
            do_normalize=config.normalize,
            filter_method=filter_method,
        )
        return mixed, content

    if microbatch is None or microbatch >= b:
        batched = jax.jit(jax.vmap(one_pair))
    else:
        if b % microbatch:
            raise ValueError("microbatch must divide the batch size")
        nmb = b // microbatch

        def run(mics_, sources_, dirs_):
            outs = jax.lax.map(
                lambda xs: jax.vmap(one_pair)(*xs),
                (
                    mics_.reshape(nmb, microbatch, 3),
                    sources_.reshape(nmb, microbatch, 3),
                    dirs_.reshape(nmb, microbatch, n, 3),
                ),
            )
            return tuple(
                o.reshape((b,) + o.shape[2:]) for o in outs
            )

        batched = jax.jit(run)

    if mesh is not None:
        sharding = NamedSharding(mesh, P(batch_axis))
        sources = jax.device_put(sources, sharding)
        mics = jax.device_put(mics, sharding)
        directions = jax.device_put(directions, sharding)

    irs, contents = batched(mics, sources, directions)
    return irs, contents
