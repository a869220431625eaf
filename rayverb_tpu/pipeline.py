"""End-to-end render pipeline: config + scene -> impulse response channels.

The orchestration of cmd/main.cpp:241-337 — trace, select output
population, attenuate, optional predelay fix, flatten, filter/mix/trim —
as one function, so the CLI, tests, batch scripts and the benchmark all
share a single path.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass

import numpy as np

from .config.schema import OutputMode, RenderConfig
from .engine import Raytracer, RaytracerResults
from .ops.attenuate import attenuate
from .ops.histogram import flatten_channels
from .ops.postprocess import find_predelay, fix_predelay, process
from .scene.compile import Scene
from .utils.directions import random_directions


@dataclass
class RenderResult:
    channels: np.ndarray       # (C, T) float32, post-processed
    sample_rate: float
    raw: RaytracerResults      # the selected impulse population
    attenuated_times: np.ndarray
    predelay: float
    raytracer: Raytracer | None  # retains TraceOutputs for diagnostics


def select_results(raytracer: Raytracer, config: RenderConfig) -> RaytracerResults:
    """output_mode dispatch (cmd/main.cpp:255-269)."""
    if config.output_mode == OutputMode.ALL:
        return raytracer.get_all_raw(config.remove_direct)
    if config.output_mode == OutputMode.IMAGE_ONLY:
        return raytracer.get_raw_images(config.remove_direct)
    return raytracer.get_raw_diffuse()


def render_from_raw(
    config: RenderConfig,
    results: RaytracerResults,
    *,
    hrtf_table=None,
    filter_method: str = "scan",
) -> RenderResult:
    """Re-run attenuation + post-processing on persisted raw impulses
    (engine.load_raw) without re-tracing."""
    if results.num_impulses == 0:
        raise RuntimeError("No raytrace results returned.")
    volumes, times = attenuate(results, config.attenuation_model, hrtf_table)
    predelay = 0.0
    if config.trim_predelay:
        predelay = find_predelay(times)
        times = fix_predelay(times, predelay)
    bands = flatten_channels(volumes, times, config.sample_rate)
    channels = process(
        bands,
        config.sample_rate,
        filter_type=config.filter,
        lo_cutoff=config.hipass,
        do_normalize=config.normalize,
        volume_scale=config.volume_scale,
        do_trim_tail=config.trim_tail,
        filter_method=filter_method,
    )
    return RenderResult(
        channels=channels,
        sample_rate=config.sample_rate,
        raw=results,
        attenuated_times=np.asarray(times),
        predelay=predelay,
        raytracer=None,
    )


def render(
    config: RenderConfig,
    scene: Scene,
    *,
    directions=None,
    hrtf_table=None,
    filter_method: str = "scan",
    trace_impl: str = "auto",
    ray_chunk: int | None = None,
) -> RenderResult:
    """Render one impulse response (the body of cmd/main.cpp:241-336)."""
    for w in config.warnings:
        print(f"WARNING: {w}", file=sys.stderr)

    if directions is None:
        directions = random_directions(config.rays, seed=config.seed)

    kwargs = {}
    if ray_chunk is not None:
        kwargs["ray_chunk"] = ray_chunk
    raytracer = Raytracer(
        config.reflections,
        scene,
        verbose=config.verbose,
        impl=trace_impl,
        **kwargs,
    )
    raytracer.raytrace(config.mic_position, config.source_position, directions)

    # device-resident population: only the small image-index table crosses
    # to the host (for chain dedup); impulse payloads stay in HBM
    from .engine import assemble_population

    vol, pos, tim = assemble_population(
        raytracer.outputs, config.output_mode, config.remove_direct
    )
    if tim.shape[0] == 0:
        raise RuntimeError("No raytrace results returned.")
    results = RaytracerResults(
        volume=vol, position=pos, time=tim, mic=np.asarray(config.mic_position)
    )

    volumes, times = attenuate(results, config.attenuation_model, hrtf_table)

    predelay = 0.0
    if config.trim_predelay:
        predelay = find_predelay(times)
        times = fix_predelay(times, predelay)

    bands = flatten_channels(volumes, times, config.sample_rate)
    channels = process(
        bands,
        config.sample_rate,
        filter_type=config.filter,
        lo_cutoff=config.hipass,
        do_normalize=config.normalize,
        volume_scale=config.volume_scale,
        do_trim_tail=config.trim_tail,
        filter_method=filter_method,
    )
    return RenderResult(
        channels=channels,
        sample_rate=config.sample_rate,
        raw=results,
        attenuated_times=np.asarray(times),
        predelay=predelay,
        raytracer=raytracer,
    )
