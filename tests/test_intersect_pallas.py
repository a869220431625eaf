"""Pallas closest-hit kernel vs the XLA reference implementation
(interpret mode on the CPU backend; the same kernel compiles on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rayverb_tpu.ops.intersect import closest_hit_xla, soup_from_scene
from rayverb_tpu.ops.intersect_pallas import closest_hit_pallas


def random_rays(rng, n, center, spread=5.0):
    o = (rng.uniform(-spread, spread, (n, 3)) + center).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize(
    "n",
    [1, 7, pytest.param(512, marks=pytest.mark.slow),
     pytest.param(700, marks=pytest.mark.slow)],
)
def test_matches_xla_on_box(large_square_soup, rng, n):
    o, d = random_rays(rng, n, np.array([0, 10, 0]))
    ref = closest_hit_xla(o, d, large_square_soup)
    got = closest_hit_pallas(o, d, large_square_soup, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    hit = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit], np.asarray(ref.t)[hit], rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(got.index)[hit], np.asarray(ref.index)[hit]
    )


def test_matches_xla_on_larger_scene(assets_dir, rng):
    from rayverb_tpu import load_scene

    scene = load_scene(
        str(assets_dir / "test_models" / "random_pillars.obj"),
        str(assets_dir / "materials" / "mat.json"),
    )
    soup = soup_from_scene(scene)
    center = scene.bounds.mean(axis=0)
    o, d = random_rays(rng, 300, center, spread=3.0)
    ref = closest_hit_xla(o, d, soup)
    got = closest_hit_pallas(o, d, soup, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    hit = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit], np.asarray(ref.t)[hit], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got.index)[hit], np.asarray(ref.index)[hit]
    )


@pytest.mark.slow
def test_trace_with_pallas_impl_matches(large_square_scene):
    """Full trace equality between impl='xla' and impl='pallas'
    (interpret mode under the hood on CPU).

    Rays are deliberately a hair off the scene's symmetry axes: an exactly
    axis-aligned ray in this axis-aligned box lands on coincident-t
    geometry where the two sweeps' different (mathematically equivalent)
    arithmetic — Möller–Trumbore vs the precomputed Woop transform — can
    break the exact tie toward different triangle indices. Generic rays
    must agree exactly."""
    from rayverb_tpu.ops.intersect import soup_from_scene as sfs
    from rayverb_tpu.ops.trace import trace

    soup = sfs(large_square_scene)
    dirs = np.array(
        [[0.02, 0.013, -1], [0.017, -1, 0.011], [0.6, -0.64, 0.48]],
        np.float32,
    )
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    mic = np.float32([0, 2, 0])
    src = np.float32([0, 2, 2])
    a = trace(soup, mic, src, dirs, 6, impl="xla")
    b = trace(soup, mic, src, dirs, 6, impl="pallas")
    for x, y in zip(a, b):
        # atol 1e-4 = 0.1 mm at this scene's ~26 m scale: the two sweeps'
        # equivalent-but-differently-rounded t values land intersection
        # points within a few float32 ulps of each other
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)


def test_decide_mode_verdicts_match(large_square_soup, rng):
    """Any-hit decide mode: the visibility verdict (blocker strictly
    before the target vs not) must agree with the exact sweep, even
    though a decided row may return a non-closest witness hit."""
    from rayverb_tpu.ops.intersect import closest_hit_xla
    from rayverb_tpu.ops.intersect_pallas import closest_hit_pallas

    soup = large_square_soup
    center = np.asarray(soup.bounds).mean(axis=0)
    o = center + (rng.random((256, 3)).astype(np.float32) - 0.5) * 4.0
    d = rng.standard_normal((256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    mag = (0.5 + 4.0 * rng.random(256)).astype(np.float32)
    bound = mag * 1.001 + 0.01

    ref = closest_hit_xla(o, d, soup, t_max=bound)
    got = closest_hit_pallas(
        o, d, soup, t_max=bound, t_decide=mag, interpret=True
    )
    vis_ref = (~np.asarray(ref.hit)) | (np.asarray(ref.t) > mag)
    vis_got = (~np.asarray(got.hit)) | (np.asarray(got.t) > mag)
    np.testing.assert_array_equal(vis_got, vis_ref)


def test_order_group_coarsens_to_fit_smem():
    """The scalar-prefetched (steps, groups) order table must stay under
    the SMEM budget: at north-star scale (1M sweep rows x 64 super-steps)
    the r3 (groups, steps) layout lane-padded to exactly 1.00 MB and the
    TPU compile died over budget. Groups double until the padded table
    fits; small sweeps keep the 512-ray default."""
    from rayverb_tpu.ops.intersect_pallas import (
        ORDER_GROUP_RAYS,
        SMEM_ORDER_BYTES,
        _order_group_rays,
        _round_up,
    )

    assert _order_group_rays(4096, 64) == ORDER_GROUP_RAYS
    # the exact shape that failed on-device: fits in steps-major layout
    assert _order_group_rays(1 << 20, 64) == ORDER_GROUP_RAYS
    assert _round_up(64, 8) * _round_up((1 << 20) // 512, 128) * 4 <= (
        SMEM_ORDER_BYTES
    )
    # 4x bigger sweep must coarsen, and the result must still fit
    og = _order_group_rays(1 << 22, 64)
    assert og > ORDER_GROUP_RAYS and og % ORDER_GROUP_RAYS == 0
    mp = _round_up(1 << 22, og)
    assert _round_up(64, 8) * _round_up(mp // og, 128) * 4 <= SMEM_ORDER_BYTES


@pytest.mark.parametrize("ray_block", [128, 256, 512])
def test_ray_block_parameter_matches_xla(assets_dir, rng, ray_block):
    """Per-sweep ray_block (cull-tile lane width) is pure performance
    machinery: verdicts, t, and index must match the XLA sweep at every
    width, including rows past the padding boundary."""
    from rayverb_tpu import load_scene

    scene = load_scene(
        str(assets_dir / "test_models" / "random_pillars.obj"),
        str(assets_dir / "materials" / "mat.json"),
    )
    soup = soup_from_scene(scene)
    center = scene.bounds.mean(axis=0)
    o, d = random_rays(rng, 700, center, spread=3.0)
    ref = closest_hit_xla(o, d, soup)
    got = closest_hit_pallas(
        o, d, soup, interpret=True, ray_block=ray_block
    )
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    hit = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit], np.asarray(ref.t)[hit], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got.index)[hit], np.asarray(ref.index)[hit]
    )


def test_ray_block_rejects_bad_widths(large_square_soup, rng):
    o, d = random_rays(rng, 64, np.array([0, 10, 0]))
    for bad in (64, 192, 1024):
        with pytest.raises(ValueError):
            closest_hit_pallas(
                o, d, large_square_soup, interpret=True, ray_block=bad
            )


def test_ray_block_stats_totals_agree(assets_dir, rng):
    """Executed-pair counters aggregate to the same 512-row groups for
    every tile width; totals shrink (or hold) as tiles narrow — never
    grow — since a narrower tile's corridor is a subset of the union."""
    from rayverb_tpu import load_scene

    scene = load_scene(
        str(assets_dir / "test_models" / "random_pillars.obj"),
        str(assets_dir / "materials" / "mat.json"),
    )
    soup = soup_from_scene(scene)
    center = scene.bounds.mean(axis=0)
    o, d = random_rays(rng, 600, center, spread=3.0)
    totals = {}
    for rb in (512, 256, 128):
        _, cnt = closest_hit_pallas(
            o, d, soup, interpret=True, ray_block=rb, with_stats=True
        )
        assert cnt.shape == (2,)  # 600 rows -> two 512-row groups
        totals[rb] = float(np.sum(np.asarray(cnt)))
    assert totals[256] <= totals[512]
    assert totals[128] <= totals[256]
