"""Golden trace tests against the analytic large_square box — the port of
the reference's raytrace_tests (tests/raytrace_tests.h:30-48), plus
image-source behaviour checks the reference never had."""

import numpy as np
import pytest

from rayverb_tpu.constants import (
    AIR_COEFFICIENT,
    NUM_IMAGE_SOURCE,
    SECONDS_PER_METER,
)
from rayverb_tpu.engine import Raytracer, dedup_images
from rayverb_tpu.ops.trace import trace

MIC = np.array([0, 2, 0], np.float32)
SRC = np.array([0, 2, 2], np.float32)

DIRS = np.array(
    [
        [0, 0, -1],
        [0, 0, 1],
        [0, -1, 0],
        [0, 1, 0],
        [-1, 0, 0],
        [1, 0, 0],
    ],
    np.float32,
)


@pytest.fixture(scope="module")
def traced(large_square_scene):
    rt = Raytracer(16, large_square_scene)
    rt.raytrace(MIC, SRC, DIRS)
    return rt


def test_first_bounce_positions(traced):
    """tests/raytrace_tests.h:35-40 golden values."""
    pos = np.asarray(traced.outputs.diffuse_position)
    expected = [
        (0, [0, 2, -27]),
        (1, [0, 2, 27]),
        (2, [0, 0, 2]),
        (3, [0, 27, 2]),
        (4, [-25, 2, 2]),
        (5, [25, 2, 2]),
    ]
    for ray, want in expected:
        np.testing.assert_allclose(pos[ray, 0], want, atol=1e-3)


def test_second_bounce_positions(traced):
    """tests/raytrace_tests.h:42-47 golden values."""
    pos = np.asarray(traced.outputs.diffuse_position)
    expected = [
        (0, [0, 0, 0]),  # corner hit -> reflected along the wall -> miss
        (1, [0, 0, 0]),
        (2, [0, 27, 2]),
        (3, [0, 0, 2]),
        (4, [-25, 2, -2]),
        (5, [25, 2, -2]),
    ]
    for ray, want in expected:
        np.testing.assert_allclose(pos[ray, 1], want, atol=1e-3)


def test_dead_ray_stays_zero(traced):
    out = traced.outputs
    # rays 0/1 die after bounce 1; everything downstream is zeros
    for ray in (0, 1):
        assert np.all(np.asarray(out.diffuse_position)[ray, 1:] == 0)
        assert np.all(np.asarray(out.diffuse_volume)[ray, 1:] == 0)
        assert np.all(np.asarray(out.diffuse_time)[ray, 1:] == 0)


def test_first_bounce_time_and_volume(traced, large_square_scene):
    out = traced.outputs
    # ray 0: src -> (0,2,-27) is 29 m, then 27 m back to the mic
    dist = 29.0 + 27.0
    np.testing.assert_allclose(
        float(out.diffuse_time[0, 0]), SECONDS_PER_METER * dist, rtol=1e-5
    )
    # volume = -spec * exp(DIST*air) * diffuse * |dot(n, d)| (kernel.cpp:459-490)
    row = int(large_square_scene.tri_surface[0])
    spec = large_square_scene.specular[row]
    diff = large_square_scene.diffuse[row]
    lambert = np.sqrt(0.5)  # wall normal at 45 degrees to the ray
    want = -spec * np.exp(dist * AIR_COEFFICIENT) * diff * lambert
    np.testing.assert_allclose(np.asarray(out.diffuse_volume)[0, 0], want, rtol=1e-4)


def test_direct_image_slot(traced):
    out = traced.outputs
    d = float(np.linalg.norm(SRC - MIC))
    want_vol = np.exp(d * AIR_COEFFICIENT)
    for ray in range(6):
        np.testing.assert_allclose(
            np.asarray(out.image_volume)[ray, 0], want_vol, rtol=1e-5
        )
        np.testing.assert_allclose(np.asarray(out.image_position)[ray, 0], SRC, atol=1e-5)
        np.testing.assert_allclose(
            float(out.image_time[ray, 0]), SECONDS_PER_METER * d, rtol=1e-5
        )
        assert int(out.image_index[ray, 0]) == 0


def test_floor_image_source(traced):
    """Ray 2 bounces off the floor: the first-order image source is the mic
    mirrored through y=0, i.e. image position mic+(src-mirrored_mic)."""
    out = traced.outputs
    mirrored_mic = np.array([0, -2, 0], np.float32)
    init_diff = SRC - mirrored_mic
    init_dist = np.linalg.norm(init_diff)
    assert int(out.image_index[2, 1]) >= 1  # a real surface chain
    np.testing.assert_allclose(
        np.asarray(out.image_position)[2, 1], MIC + init_diff, atol=1e-4
    )
    np.testing.assert_allclose(
        float(out.image_time[2, 1]), SECONDS_PER_METER * init_dist, rtol=1e-5
    )
    # pre-bounce volume is 1.0 -> just air attenuation (kernel quirk:
    # volume is updated only after add_image, kernel.cpp:444-501)
    np.testing.assert_allclose(
        np.asarray(out.image_volume)[2, 1],
        np.exp(init_dist * AIR_COEFFICIENT),
        rtol=1e-5,
    )


def test_dedup_images_semantics(traced):
    out = traced.outputs
    vol, pos, tim = dedup_images(out, remove_direct=False)
    # direct key {0} appears exactly once after dedup
    direct_rows = np.isclose(tim, SECONDS_PER_METER * 2.0, rtol=1e-6)
    assert direct_rows.sum() == 1


def test_dedup_remove_direct(traced):
    out = traced.outputs
    vol_all, _, tim_all = dedup_images(out, remove_direct=False)
    vol_nod, _, tim_nod = dedup_images(out, remove_direct=True)
    assert tim_all.shape[0] == tim_nod.shape[0] + 1


def test_raytracer_results_api(traced):
    d = traced.get_raw_diffuse()
    assert d.volume.shape == (6 * 16, 8)
    i = traced.get_raw_images(remove_direct=False)
    assert i.volume.shape[0] >= 1
    a = traced.get_all_raw(remove_direct=False)
    assert a.num_impulses == d.num_impulses + i.num_impulses
    np.testing.assert_allclose(a.mic, MIC)


@pytest.mark.slow
def test_chunked_trace_matches_unchunked(large_square_scene, rng):
    from rayverb_tpu.ops.intersect import soup_from_scene

    soup = soup_from_scene(large_square_scene)
    d = rng.normal(size=(50, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    full = trace(soup, MIC, SRC, d, 12, ray_chunk=4096)
    chunked = trace(soup, MIC, SRC, d, 12, ray_chunk=16)
    for a, b in zip(full, chunked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_short_reflection_count(large_square_scene):
    """nreflections < NUM_IMAGE_SOURCE-1 leaves the tail image slots empty."""
    rt = Raytracer(3, large_square_scene)
    out = rt.raytrace(MIC, SRC, DIRS)
    assert out.diffuse_time.shape == (6, 3)
    assert np.all(np.asarray(out.image_index)[:, 4:] == 0)
    assert out.image_index.shape[1] == NUM_IMAGE_SOURCE


def test_dedup_select_matches_map_oracle(rng):
    """dedup_select's O(N*S) hash path reproduces the reference std::map
    semantics (rayverb.cpp:653-676): unique admitted prefixes, iterated in
    lexicographic key order (shorter prefixes first)."""
    from rayverb_tpu.engine import dedup_select

    n, s = 200, 10
    idx = rng.integers(0, 5, size=(n, s)).astype(np.int32)

    for remove_direct in (False, True):
        # oracle: ordered map over actual prefix tuples
        entries = {}
        for r in range(n):
            for k in range(s):
                if k > 0 and idx[r, k] == 0:
                    continue
                if remove_direct and k == 0:
                    continue
                key = tuple(int(v) for v in idx[r, : k + 1])
                entries.setdefault(key, (r, k))
        expected = [entries[k] for k in sorted(entries)]

        ray_ids, slot_ids = dedup_select(idx, remove_direct)
        got = list(zip(ray_ids.tolist(), slot_ids.tolist()))
        # keys must match position-for-position; the chosen duplicate row
        # may differ (identical chains produce identical impulses), so
        # compare the *chains*, and the slots (= chain lengths) exactly
        got_keys = [
            tuple(int(v) for v in idx[r, : k + 1]) for r, k in got
        ]
        exp_keys = [
            tuple(int(v) for v in idx[r, : k + 1]) for r, k in expected
        ]
        assert got_keys == exp_keys


def test_horizon_split_matches_default(large_square_scene, rng, monkeypatch):
    """RAYVERB_HORIZON two-pass bounce sweeps are bit-identical to the
    single-sweep default: a hit found under a t_max cap is the true
    closest, and unresolved rays re-sweep unbounded (trace.py
    _HORIZON_FRAC)."""
    from rayverb_tpu.ops import trace as trace_mod
    from rayverb_tpu.ops.intersect import soup_from_scene
    from rayverb_tpu.ops.render import _collect_row, _row_buffers
    from rayverb_tpu.utils.directions import random_directions

    soup = soup_from_scene(large_square_scene)
    n, refl = 512, 6
    dirs = random_directions(n, seed=3)
    mic = np.float32([0, 2, 0])
    source = np.float32([0, 2, 2])

    def run(frac):
        monkeypatch.setattr(trace_mod, "_HORIZON_FRAC", frac)
        aux, images, _ovf = trace_mod._trace_impl(
            soup,
            mic,
            source,
            dirs,
            nreflections=refl,
            impl="xla",
            consume_row=_collect_row,
            aux0=_row_buffers(refl, n),
            nvalid=np.int32(n),
            resort=True,
        )
        return aux, images

    aux0, img0 = run(0.0)
    # 0.05 x diag forces a large unresolved population through pass 2
    aux1, img1 = run(0.05)
    for a, b in zip(aux0[:3], aux1[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(img0, img1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
