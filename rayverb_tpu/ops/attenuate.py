"""Microphone attenuation: polar-pattern speakers and multiband HRTF.

Re-implements the reference's `attenuate` and `hrtf` OpenCL kernels
(reference rayverb/kernel.cpp:505-625) and their per-channel host drivers
(rayverb/rayverb.cpp:716-892) as jitted vmaps — one fused pass per channel,
no buffer shuffling.

Documented deviation (SURVEY.md §3.3): the reference *skips* zero-volume
impulses and leaves their output entries uninitialised; here skipped
impulses are written as zeros (volume and time), which is what the
freshly-zeroed buffers gave the reference in practice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import HRTF_EAR_OFFSET, SECONDS_PER_METER


def _safe_normalize(v):
    mag = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.where(mag > 0, mag, 1.0)


@jax.jit
def speaker_attenuate(mic, volumes, positions, times, direction, coefficient):
    """Polar-pattern gain (speaker_attenuation kernel.cpp:505-513 and the
    `attenuate` kernel :515-535).

    gain = (1 - c) + c * dot(normalize(p - mic), normalize(dir));
    0 -> omni, 0.5 -> cardioid, 1 -> figure-8 (negative rear lobe kept).
    Returns (volumes_out (M, 8), times_out (M,)).
    """
    mic = jnp.asarray(mic, jnp.float32)
    direction = jnp.asarray(direction, jnp.float32)
    gain = (1.0 - coefficient) + coefficient * jnp.sum(
        _safe_normalize(positions - mic) * _safe_normalize(direction), axis=-1
    )
    nonzero = jnp.any(volumes != 0, axis=-1)
    vol_out = jnp.where(nonzero[:, None], volumes * gain[:, None], 0.0)
    t_out = jnp.where(nonzero, times, 0.0)
    return vol_out, t_out


def speaker_attenuate_all(mic, volumes, positions, times, speakers):
    """Per-speaker channels (SpeakerAttenuator::attenuate,
    rayverb.cpp:838-854). Returns (volumes (C, M, 8), times (C, M))."""
    outs = [
        speaker_attenuate(
            mic, volumes, positions, times, s.direction, float(s.shape)
        )
        for s in speakers
    ]
    return (
        jnp.stack([o[0] for o in outs]),
        jnp.stack([o[1] for o in outs]),
    )


def head_basis(pointing, up):
    """The head coordinate frame rows (transform, kernel.cpp:537-549):
    x = normalize(cross(up, pointing)), y = cross(pointing, x), z = pointing."""
    pointing = jnp.asarray(pointing, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    x = _safe_normalize(jnp.cross(up, pointing))
    y = jnp.cross(pointing, x)
    return jnp.stack([x, y, pointing])  # (3, 3), rows are the basis


def hrtf_lookup_indices(transformed):
    """Azimuth/elevation table indices from a head-coordinate direction
    (hrtf_attenuation, kernel.cpp:563-584), reproducing the C truncation:

        long a = degrees(atan2(x, z)) + 180;   a %= 360;
        long e = degrees(atan2(y, |xz|));      e = 90 - e;

    `a` truncates the non-negative value deg+180 (== floor); `e` truncates
    toward zero *before* the 90- flip. e == 180 (elevation exactly -90)
    indexes out of bounds in the reference; clamped to 179 here.
    """
    x, y, z = transformed[..., 0], transformed[..., 1], transformed[..., 2]
    az_deg = jnp.degrees(jnp.arctan2(x, z))
    a = jnp.floor(az_deg + 180.0).astype(jnp.int32) % 360
    el_deg = jnp.degrees(jnp.arctan2(y, jnp.hypot(x, z)))
    e = 90 - jnp.trunc(el_deg).astype(jnp.int32)
    e = jnp.clip(e, 0, 179)
    return a, e


@partial(jax.jit, static_argnames=("channel",))
def hrtf_attenuate_channel(
    mic, volumes, positions, times, table, pointing, up, channel: int
):
    """One ear (the `hrtf` kernel, kernel.cpp:586-625).

    table: (2, 360, 180, 8). Applies the 8-band directional gain and the
    interaural time shift from the +-0.1 m ear offset.
    """
    mic = jnp.asarray(mic, jnp.float32)
    basis = head_basis(pointing, up)

    # ear position: the reference feeds the head-frame offset through the
    # same world->head projection and adds mic (kernel.cpp:599-603);
    # replicated literally.
    width = -HRTF_EAR_OFFSET if channel == 0 else HRTF_EAR_OFFSET
    offset = jnp.array([width, 0.0, 0.0], jnp.float32)
    ear_pos = basis @ offset + mic

    direction = _safe_normalize(positions - mic)
    transformed = direction @ basis.T  # rows of basis dotted with direction
    a, e = hrtf_lookup_indices(transformed)
    gains = table[channel, a, e]  # (M, 8)

    dist0 = jnp.linalg.norm(positions - mic, axis=-1)
    dist1 = jnp.linalg.norm(positions - ear_pos, axis=-1)
    diff = dist1 - dist0

    nonzero = jnp.any(volumes != 0, axis=-1)
    vol_out = jnp.where(nonzero[:, None], volumes * gains, 0.0)
    t_out = jnp.where(nonzero, times + diff * SECONDS_PER_METER, 0.0)
    return vol_out, t_out


def hrtf_attenuate(mic, volumes, positions, times, pointing, up, table=None):
    """Stereo HRTF attenuation (HrtfAttenuator::attenuate,
    rayverb.cpp:745-763). Returns (volumes (2, M, 8), times (2, M))."""
    if table is None:
        from ..hrtf.table import default_table

        table = default_table()
    table = jnp.asarray(table, jnp.float32)
    outs = [
        hrtf_attenuate_channel(
            mic, volumes, positions, times, table, pointing, up, ch
        )
        for ch in (0, 1)
    ]
    return (
        jnp.stack([o[0] for o in outs]),
        jnp.stack([o[1] for o in outs]),
    )


def attenuate(results, model, table=None):
    """Dispatch on the attenuation model (cmd/main.cpp:279-297).

    `results` is an engine.RaytracerResults; returns
    (volumes (C, M, 8), times (C, M)) as jnp arrays.
    """
    vol = jnp.asarray(results.volume, jnp.float32)
    pos = jnp.asarray(results.position, jnp.float32)
    tim = jnp.asarray(results.time, jnp.float32)
    if model.is_hrtf:
        return hrtf_attenuate(
            results.mic, vol, pos, tim, model.hrtf.facing, model.hrtf.up, table
        )
    if not model.speakers:
        raise ValueError("attenuation model has no speakers")
    return speaker_attenuate_all(results.mic, vol, pos, tim, model.speakers)
