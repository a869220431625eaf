"""Ray-direction generation.

The reference draws uniform sphere points via the z/theta parameterisation
with a wall-clock-seeded std RNG (reference rayverb/helpers.cpp:62-81) —
non-deterministic by construction. The TPU build uses jax.random with an
explicit key, so renders are reproducible; it also provides the uniform
(Fibonacci-lattice) generator the reference declares but never defines
(helpers.h:30).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def sphere_point(z, theta):
    """Point on the unit sphere from z in [-1,1], theta in [-pi,pi]
    (helpers.cpp:62-67)."""
    zt = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return jnp.stack([zt * jnp.cos(theta), zt * jnp.sin(theta), z], axis=-1)


def random_directions(num: int, seed: int | None = None) -> np.ndarray:
    """(num, 3) float32 uniformly distributed unit vectors
    (helpers.cpp:69-81, made deterministic).

    Generated host-side with numpy: direction generation is O(num) setup
    work, and jax.random's threefry pays a pathological compile cost on
    some TPU backends for zero benefit here."""
    rng = np.random.default_rng(0 if seed is None else seed)
    z = rng.uniform(-1.0, 1.0, num)
    theta = rng.uniform(-np.pi, np.pi, num)
    zt = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    return np.stack(
        [zt * np.cos(theta), zt * np.sin(theta), z], axis=-1
    ).astype(np.float32)


def random_directions_jax(num: int, key) -> jax.Array:
    """In-jit variant taking an explicit PRNG key (for fused on-device
    datagen pipelines)."""
    kz, kt = jax.random.split(key)
    z = jax.random.uniform(kz, (num,), minval=-1.0, maxval=1.0)
    theta = jax.random.uniform(kt, (num,), minval=-jnp.pi, maxval=jnp.pi)
    return sphere_point(z, theta).astype(jnp.float32)


def uniform_directions(num: int) -> np.ndarray:
    """(num, 3) float32 deterministic quasi-uniform directions via the
    Fibonacci sphere lattice — fills in the reference's dead declaration
    `getUniformDirections` (helpers.h:30)."""
    i = np.arange(num, dtype=np.float64) + 0.5
    z = 1.0 - 2.0 * i / num
    theta = np.pi * (1.0 + 5.0**0.5) * i
    zt = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    return np.stack(
        [zt * np.cos(theta), zt * np.sin(theta), z], axis=-1
    ).astype(np.float32)


def morton_sort(directions: np.ndarray) -> np.ndarray:
    """Reorder unit directions along a Morton (Z-order) curve so that
    consecutive rays point into nearby solid angles.

    Ray order is semantically free (the reference's RNG order carries no
    meaning), but spatial coherence within the Pallas sweep's 512-ray
    tiles raises its AABB-cull skip rate dramatically: a coherent bundle's
    hits concentrate in few triangle blocks, and specular reflection
    preserves bundle coherence bounce over bounce.
    """
    from ..ops.intersect import _morton3

    d = np.asarray(directions, np.float32)
    q = np.clip((d + 1.0) * 0.5 * 1023.0, 0, 1023).astype(np.uint32)
    order = np.argsort(_morton3(q), kind="stable")
    return d[order]
