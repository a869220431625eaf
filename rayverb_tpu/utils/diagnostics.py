"""Diagnostics: ray-path JSONL dumps and phase timing.

The reference hides its path dump behind a compile-time DIAGNOSTIC flag
(rayverb.h:19, helpers.cpp:16-60) writing `impulse.dump`: one JSON array
per ray of {"position": [x,y,z], "volume": mean-of-8-bands} over the
diffuse reflections. Here it is an always-available runtime option emitting
the identical schema, consumable by the same viewers.
"""

from __future__ import annotations

import json
import time
from contextlib import contextmanager

import numpy as np


def dump_paths_arrays(path: str, positions, volumes) -> None:
    """positions (N, R, 3), volumes (N, R, 8) -> JSONL file, one line per
    ray (print_diagnostic, helpers.cpp:28-58)."""
    positions = np.asarray(positions, dtype=np.float64)
    volumes = np.asarray(volumes, dtype=np.float64)
    mean_vol = volumes.mean(axis=-1)
    with open(path, "w") as fh:
        for ray_pos, ray_vol in zip(positions, mean_vol):
            line = [
                {"position": [float(c) for c in p], "volume": float(v)}
                for p, v in zip(ray_pos, ray_vol)
            ]
            fh.write(json.dumps(line) + "\n")


def dump_paths(path: str, nrays: int, nreflections: int, trace_outputs) -> None:
    """Dump from TraceOutputs (diffuse population, like the reference's
    getRawDiffuse feed at cmd/main.cpp:271-278)."""
    dump_paths_arrays(
        path, trace_outputs.diffuse_position, trace_outputs.diffuse_volume
    )


class PhaseTimer:
    """Lightweight wall-clock phase profiler (the reference had none —
    SURVEY.md §5 lists this as a required upgrade)."""

    def __init__(self):
        self.phases: list = []

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases.append((name, time.perf_counter() - t0))

    def report(self) -> str:
        total = sum(d for _, d in self.phases)
        lines = [f"{n}: {d:.3f}s" for n, d in self.phases]
        lines.append(f"total: {total:.3f}s")
        return "  ".join(lines)
