"""Slow-but-obviously-correct float64 oracle of the full render pipeline.

An INDEPENDENT re-implementation — per-ray Python loops, numpy float64,
scipy filters, no JAX — of the reference's semantics
(/root/reference/rayverb/kernel.cpp:304-503 trace, :505-625 attenuation,
rayverb.cpp:48-77 flatten, filters.cpp process), used to bound the
production pipeline's end-to-end error (the −60 dB IR criterion) on small
scenes. Shares nothing with rayverb_tpu.ops except the physical constants.
"""

from __future__ import annotations

import math

import numpy as np

from rayverb_tpu.constants import (
    AIR_COEFFICIENT,
    EPSILON,
    HRTF_EAR_OFFSET,
    NUM_IMAGE_SOURCE,
    SECONDS_PER_METER,
)

AIR64 = np.asarray(AIR_COEFFICIENT, np.float64)


# ---------------------------------------------------------------------------
# geometry (kernel.cpp:62-192)
# ---------------------------------------------------------------------------

def _mt(o, d, v0, e0, e1):
    """Möller–Trumbore over all triangles for one ray. Returns (t, valid)."""
    pvec = np.cross(d, e1)
    det = np.einsum("ij,ij->i", e0, pvec)
    degenerate = np.abs(det) < EPSILON
    invdet = 1.0 / np.where(degenerate, 1.0, det)
    tvec = o - v0
    u = invdet * np.einsum("ij,ij->i", tvec, pvec)
    qvec = np.cross(tvec, e0)
    v = invdet * (qvec @ d)
    t = invdet * np.einsum("ij,ij->i", e1, qvec)
    valid = (~degenerate) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
    return t, valid


def closest_hit(o, d, tris):
    v0, e0, e1 = tris
    t, valid = _mt(o, d, v0, e0, e1)
    t = np.where(valid & (t > EPSILON), t, np.inf)
    i = int(np.argmin(t))
    return (float(t[i]), i) if np.isfinite(t[i]) else (math.inf, -1)


def visible(begin, point, tris):
    """point_intersection (kernel.cpp:267-296)."""
    diff = point - begin
    mag = float(np.linalg.norm(diff))
    if mag == 0:
        return True
    t, _ = closest_hit(begin, diff / mag, tris)
    return (not math.isfinite(t)) or t > mag


def tri_verts(tris, i):
    v0, e0, e1 = tris
    return np.stack([v0[i], v0[i] + e0[i], v0[i] + e1[i]])


def tri_normal(tv):
    n = np.cross(tv[1] - tv[0], tv[2] - tv[0])
    m = np.linalg.norm(n)
    return n / m if m > 0 else n


def mirror_point(p, tv):
    n = tri_normal(tv)
    return p - n * (2.0 * np.dot(n, p - tv[0]))


def mirror_tri(tv, plane):
    return np.stack([mirror_point(v, plane) for v in tv])


def intersect_one(o, d, tv):
    """triangle_vert_intersection (kernel.cpp:62-88): raw t or 0."""
    v0 = tv[0][None]
    e0 = (tv[1] - tv[0])[None]
    e1 = (tv[2] - tv[0])[None]
    t, valid = _mt(o, d, v0, e0, e1)
    return float(t[0]) if valid[0] else 0.0


def air(dist):
    return np.exp(dist * AIR64)


# ---------------------------------------------------------------------------
# trace (kernel.cpp:304-503 + host dedup rayverb.cpp:653-676)
# ---------------------------------------------------------------------------

def trace(scene, mic, source, directions, nreflections):
    """Returns (diffuse impulses, image impulse map keyed on chains).

    scene: compiled rayverb_tpu Scene (host arrays used in float64).
    Impulse = (volume (8,), position (3,), time).
    """
    v0 = np.asarray(scene.v0, np.float64)
    e0 = np.asarray(scene.e0, np.float64)
    e1 = np.asarray(scene.e1, np.float64)
    tris = (v0, e0, e1)
    surf = np.asarray(scene.tri_surface)
    spec = np.asarray(scene.specular, np.float64)
    diff_c = np.asarray(scene.diffuse, np.float64)
    mic = np.asarray(mic, np.float64)
    source = np.asarray(source, np.float64)

    diffuse = []
    images = {}

    # direct path, image key {0} (kernel.cpp:335-357)
    d0 = source - mic
    dist0 = float(np.linalg.norm(d0))
    if visible(source, mic, tris):
        images[(0,)] = (air(dist0), mic + d0, SECONDS_PER_METER * dist0)
    else:
        images[(0,)] = (np.zeros(8), np.zeros(3), 0.0)

    for direction in np.asarray(directions, np.float64):
        pos = source.copy()
        dirv = direction / np.linalg.norm(direction)
        volume = np.ones(8)
        distance = 0.0
        chain = []       # surface-index chain: triangle index + 1
        planes = []      # mirrored triangle chain
        mic_reflection = mic.copy()

        for index in range(nreflections):
            t, tri = closest_hit(pos, dirv, tris)
            if not math.isfinite(t):
                break
            intersection = pos + dirv * t

            if index < NUM_IMAGE_SOURCE - 1:
                cur = tri_verts(tris, tri)
                for plane in planes:
                    cur = mirror_tri(cur, plane)
                planes.append(cur)
                mic_reflection = mirror_point(mic_reflection, cur)
                chain = chain + [tri + 1]

                # validate the specular path (kernel.cpp:396-429)
                DIR = mic_reflection - source
                DIR = DIR / np.linalg.norm(DIR)
                ok = True
                prev = source.copy()
                final_ip = None
                for k in range(len(planes)):
                    tk = intersect_one(source, DIR, planes[k])
                    if tk <= EPSILON:
                        ok = False
                        break
                    p = source + DIR * tk
                    for l in range(k - 1, -1, -1):
                        p = mirror_point(p, planes[l])
                    seg = p - prev
                    mag = np.linalg.norm(seg)
                    th, _ = closest_hit(prev, seg / mag, tris)
                    if not math.isfinite(th):
                        ok = False
                        break
                    new_ip = prev + (seg / mag) * th
                    if not np.all(np.abs(new_ip - p) < EPSILON):
                        ok = False
                        break
                    prev = p
                    final_ip = p
                if ok and final_ip is not None:
                    ok = visible(final_ip, mic, tris)
                if ok:
                    key = tuple(chain)
                    if key not in images:
                        init_diff = source - mic_reflection
                        init_dist = np.linalg.norm(init_diff)
                        images[key] = (
                            volume * air(init_dist),  # PRE-bounce volume
                            mic + init_diff,
                            SECONDS_PER_METER * init_dist,
                        )

            # diffuse impulse (kernel.cpp:459-490)
            s = surf[tri]
            new_vol = -volume * spec[s]
            new_dist = distance + t
            n = tri_normal(tri_verts(tris, tri))
            if visible(intersection, mic, tris):
                DIST = new_dist + np.linalg.norm(mic - intersection)
                DIFF = abs(np.dot(n, dirv))
                diffuse.append(
                    (
                        new_vol * air(DIST) * diff_c[s] * DIFF,
                        intersection.copy(),
                        SECONDS_PER_METER * DIST,
                    )
                )
            # reflect and continue
            dirv = dirv - n * (2.0 * np.dot(dirv, n))
            pos = intersection
            volume = new_vol
            distance = new_dist

    return diffuse, images


# ---------------------------------------------------------------------------
# attenuation (kernel.cpp:505-625)
# ---------------------------------------------------------------------------

def speaker_attenuate(mic, impulses, direction, coefficient):
    out = []
    direction = np.asarray(direction, np.float64)
    direction = direction / np.linalg.norm(direction)
    for vol, pos, t in impulses:
        if not np.any(vol):
            out.append((np.zeros(8), 0.0))
            continue
        d = pos - np.asarray(mic, np.float64)
        m = np.linalg.norm(d)
        g = (1.0 - coefficient) + coefficient * (
            float(np.dot(d / m, direction)) if m > 0 else 0.0
        )
        out.append((vol * g, t))
    return out


def hrtf_attenuate(mic, impulses, table, facing, up, channel):
    mic = np.asarray(mic, np.float64)
    facing = np.asarray(facing, np.float64)
    up = np.asarray(up, np.float64)
    x = np.cross(up, facing)
    x = x / np.linalg.norm(x)
    y = np.cross(facing, x)
    basis = np.stack([x, y, facing])
    width = -HRTF_EAR_OFFSET if channel == 0 else HRTF_EAR_OFFSET
    ear = basis @ np.array([width, 0.0, 0.0]) + mic
    tbl = np.asarray(table, np.float64)

    out = []
    for vol, pos, t in impulses:
        if not np.any(vol):
            out.append((np.zeros(8), 0.0))
            continue
        d = pos - mic
        m = np.linalg.norm(d)
        d = d / m if m > 0 else d
        # the az/el -> integer-degree quantization runs in float32 like
        # the system under test (and the reference's cl_float kernel): a
        # float64 atan2 landing on the other side of a degree boundary
        # would pick the neighboring table entry — a few-percent gain
        # difference that is measurement noise, not an implementation error
        tr = (basis @ d).astype(np.float32)
        a = int(
            np.floor(
                np.degrees(np.arctan2(tr[0], tr[2]), dtype=np.float32)
                + np.float32(180.0)
            )
        ) % 360
        el = np.degrees(
            np.arctan2(tr[1], np.hypot(tr[0], tr[2])), dtype=np.float32
        )
        e = 90 - int(el)  # C truncation toward zero
        e = min(max(e, 0), 179)
        gains = tbl[channel, a, e]
        shift = (np.linalg.norm(pos - ear) - np.linalg.norm(pos - mic)) * (
            SECONDS_PER_METER
        )
        out.append((vol * gains, t + shift))
    return out


# ---------------------------------------------------------------------------
# flatten + filter + post (rayverb.cpp:48-149, filters.cpp)
# ---------------------------------------------------------------------------

def fix_predelay(channels_impulses):
    times = [t for ch in channels_impulses for _, t in ch if t > 0]
    pd = min(times) if times else 0.0
    return [
        [(v, t - pd if t > pd else 0.0) for v, t in ch]
        for ch in channels_impulses
    ], pd


def _bin_index(t, sample_rate):
    """C round() = half away from zero (times are non-negative):
    floor(x + 0.5). The multiply is quantized through float32 because the
    system under test (and the reference, whose impulse times are
    cl_float) bins float32 times — an impulse whose t*sr sits within the
    f32 ulp of a .5 boundary would otherwise flake between bins."""
    v = np.float32(np.float32(t) * np.float32(sample_rate))
    return int(np.floor(np.float32(v + np.float32(0.5))))


def flatten(impulses, sample_rate, length=None):
    if not impulses:
        return np.zeros((8, max(length or 1, 1)))
    if length is None:
        length = max(_bin_index(t, sample_rate) for _, t in impulses) + 1
    out = np.zeros((8, max(length, 1)))
    for vol, t in impulses:
        out[:, _bin_index(t, sample_rate)] += vol
    return out


def _lr_coeffs(lo, hi, sr):
    """linkwitz-riley 2nd-order sections (filters.cpp:236-259)."""
    def get_c(co):
        wct = math.pi * co / sr
        return math.cos(wct) / math.sin(wct)

    c = get_c(hi)
    a0 = c * c + c * math.sqrt(2) + 1
    lopass = (
        [1 / a0, 2 / a0, 1 / a0],
        [1.0, (-2 * (c * c - 1)) / a0, (c * c - c * math.sqrt(2) + 1) / a0],
    )
    c = get_c(lo)
    a0 = c * c + c * math.sqrt(2) + 1
    hipass = (
        [(c * c) / a0, (-2 * c * c) / a0, (c * c) / a0],
        [1.0, (-2 * (c * c - 1)) / a0, (c * c - c * math.sqrt(2) + 1) / a0],
    )
    return lopass, hipass


def filter_lr_band(x, lo, hi, sr):
    """Zero-phase 4th-order Linkwitz-Riley bandpass: lopass twopass then
    hipass twopass (filters.cpp:262-266; twopass = forward + reversed)."""
    from scipy.signal import lfilter

    (lb, la), (hb, ha) = _lr_coeffs(lo, hi, sr)
    # lopass.twopass: forward then backward
    x = lfilter(lb, la, x)
    x = lfilter(lb, la, x[::-1])[::-1]
    x = lfilter(hb, ha, x)
    x = lfilter(hb, ha, x[::-1])[::-1]
    return x


def _edges(lo_cutoff, sr):
    from rayverb_tpu.ops.filters import band_edges

    return band_edges(lo_cutoff, sr)


def process(bands, sr, lo_cutoff, do_normalize_later):
    edges = _edges(lo_cutoff, sr)
    out = np.zeros_like(bands)
    for i in range(8):
        out[i] = filter_lr_band(bands[i], edges[i], edges[i + 1], sr)
    return out.sum(axis=0)


def render(
    scene,
    mic,
    source,
    directions,
    nreflections,
    sample_rate,
    *,
    attenuation="speakers",
    speakers=None,
    hrtf_table=None,
    facing=None,
    up=None,
    lo_cutoff=45.0,
    normalize=True,
    trim_predelay=False,
):
    """Full float64 render. Returns (C, T) float64 channels (no tail trim)."""
    diffuse, images = trace(scene, mic, source, directions, nreflections)
    population = diffuse + list(images.values())

    if attenuation == "speakers":
        per_channel = [
            speaker_attenuate(mic, population, s["direction"], s["shape"])
            for s in speakers
        ]
    else:
        per_channel = [
            hrtf_attenuate(mic, population, hrtf_table, facing, up, ch)
            for ch in (0, 1)
        ]

    if trim_predelay:
        per_channel, _ = fix_predelay(per_channel)

    # one COMMON length across channels (flatten_channels semantics): the
    # zero-phase filter rings past each channel's own last bin, so
    # truncating channels individually would cut real output
    length = max(
        (
            _bin_index(t, sample_rate)
            for ch in per_channel
            for v, t in ch
            if np.any(v)
        ),
        default=0,
    ) + 1
    flat = [flatten(ch, sample_rate, length) for ch in per_channel]
    mixed = np.zeros((len(flat), length))
    for c, f in enumerate(flat):
        mixed[c] = process(f, sample_rate, lo_cutoff, normalize)
    if normalize:
        peak = np.abs(mixed).max()
        if peak > 0:
            mixed = mixed / peak
    return mixed
