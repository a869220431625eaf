"""Pallas TPU kernel for the closest-hit sweep.

Placeholder module: the tiled (ray-block x triangle-block) VMEM-resident
kernel lands here; until then callers fall back to the fused XLA sweep in
intersect.py, which shares the exact same contract.
"""

from __future__ import annotations


def should_use_pallas(num_rays: int, num_triangles: int) -> bool:
    return False


def closest_hit_pallas(origins, dirs, soup):
    from .intersect import closest_hit_xla

    return closest_hit_xla(origins, dirs, soup)
