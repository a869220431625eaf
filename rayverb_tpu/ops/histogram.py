"""Impulse flattening: scatter-add of impulses into per-band sample bins.

On-device re-implementation of flattenImpulses (reference
rayverb/rayverb.cpp:28-77): each attenuated impulse lands at sample
round(time * sr) and its 8-band volume is summed into an (8, L) buffer.
round() is C's round-half-away-from-zero; times are non-negative so
floor(t * sr + 0.5) reproduces it exactly (jnp.round would round half to
even).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import NUM_BANDS


def max_sample(times, sample_rate: float) -> int:
    """Index of the final sample + 1 (rayverb.cpp:53-57). Device-side
    reduction; only the scalar crosses to the host."""
    times = jnp.asarray(times)
    t = float(jnp.max(times)) if times.size else 0.0
    return int(np.floor(t * sample_rate + 0.5)) + 1


@partial(jax.jit, static_argnames=("length",))
def flatten_impulses(volumes, times, sample_rate, *, length: int):
    """(M, 8) volumes + (M,) times -> (8, length) band signals
    (rayverb.cpp:48-77). Impulses past `length` are dropped (cannot happen
    when length >= max_sample)."""
    idx = jnp.floor(times * sample_rate + 0.5).astype(jnp.int32)
    out = jnp.zeros((NUM_BANDS, length), jnp.float32)
    return out.at[:, idx].add(
        volumes.T, mode="drop", indices_are_sorted=False, unique_indices=False
    )


def flatten_channels(volumes, times, sample_rate, *, length: int | None = None):
    """Flatten (C, M, 8)/(C, M) multi-channel impulses to (C, 8, L).

    The reference flattens each channel to its own max-time length
    (rayverb.cpp:28-44) and the CLI later indexes all channels by channel
    0's length (cmd/main.cpp:34-38 — an out-of-bounds read when lengths
    differ). Here every channel shares L = max over channels, which is the
    well-defined version of the same output.
    """
    if length is None:
        length = max(1, max_sample(times, sample_rate))
    vol = jnp.asarray(volumes, jnp.float32)
    tim = jnp.asarray(times, jnp.float32)
    return jax.vmap(
        lambda v, t: flatten_impulses(v, t, sample_rate, length=length)
    )(vol, tim)
