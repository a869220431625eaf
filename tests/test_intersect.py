"""Unit tests for the closest-hit primitive (kernel.cpp:62-192 semantics)."""

import jax.numpy as jnp
import numpy as np

from rayverb_tpu.constants import EPSILON
from rayverb_tpu.ops.intersect import (
    closest_hit_xla,
    intersect_triangle,
    soup_from_arrays,
    visible,
)


def make_soup(tri_list, surface=None):
    tv = np.asarray(tri_list, dtype=np.float32)  # (T, 3, 3)
    v0 = tv[:, 0]
    e0 = tv[:, 1] - tv[:, 0]
    e1 = tv[:, 2] - tv[:, 0]
    t = tv.shape[0]
    return soup_from_arrays(
        v0,
        e0,
        e1,
        np.zeros((t,), np.int32) if surface is None else surface,
        np.ones((1, 8), np.float32),
        np.ones((1, 8), np.float32),
    )


UNIT_TRI = [[[0, 0, 5], [1, 0, 5], [0, 1, 5]]]


def test_basic_hit():
    soup = make_soup(UNIT_TRI)
    o = jnp.array([[0.25, 0.25, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    hit = closest_hit_xla(o, d, soup)
    assert bool(hit.hit[0])
    np.testing.assert_allclose(float(hit.t[0]), 5.0, rtol=1e-6)
    assert int(hit.index[0]) == 0


def test_miss_outside_barycentric():
    soup = make_soup(UNIT_TRI)
    o = jnp.array([[0.9, 0.9, 0.0]])  # u+v > 1
    d = jnp.array([[0.0, 0.0, 1.0]])
    assert not bool(closest_hit_xla(o, d, soup).hit[0])


def test_behind_ray_is_miss():
    soup = make_soup(UNIT_TRI)
    o = jnp.array([[0.25, 0.25, 10.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    assert not bool(closest_hit_xla(o, d, soup).hit[0])


def test_parallel_ray_is_miss():
    soup = make_soup(UNIT_TRI)
    o = jnp.array([[0.25, 0.25, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    assert not bool(closest_hit_xla(o, d, soup).hit[0])


def test_closest_of_two():
    soup = make_soup(
        [
            [[0, 0, 9], [4, 0, 9], [0, 4, 9]],
            [[0, 0, 3], [4, 0, 3], [0, 4, 3]],
        ]
    )
    o = jnp.array([[0.5, 0.5, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    hit = closest_hit_xla(o, d, soup)
    assert int(hit.index[0]) == 1
    np.testing.assert_allclose(float(hit.t[0]), 3.0, rtol=1e-6)


def test_tie_keeps_first_index():
    tri = [[0, 0, 5], [4, 0, 5], [0, 4, 5]]
    soup = make_soup([tri, tri])
    o = jnp.array([[0.5, 0.5, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    assert int(closest_hit_xla(o, d, soup).index[0]) == 0


def test_epsilon_self_hit_rejected():
    soup = make_soup(UNIT_TRI)
    # origin on the triangle, ray away: t=0 hit must be rejected (t > EPS)
    o = jnp.array([[0.25, 0.25, 5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    assert not bool(closest_hit_xla(o, d, soup).hit[0])


def test_degenerate_padding_never_hits():
    soup = make_soup(UNIT_TRI + [[[0, 0, 0], [0, 0, 0], [0, 0, 0]]] * 3)
    o = jnp.array([[0.25, 0.25, 0.0], [0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    hit = closest_hit_xla(o, d, soup)
    assert bool(hit.hit[0]) and int(hit.index[0]) == 0
    assert not bool(hit.hit[1])


def test_intersect_triangle_raw():
    tv = jnp.asarray(np.asarray(UNIT_TRI, dtype=np.float32)[0])
    o = jnp.array([0.25, 0.25, 0.0])
    d = jnp.array([0.0, 0.0, 1.0])
    t = intersect_triangle(o, d, tv)
    np.testing.assert_allclose(float(t), 5.0, rtol=1e-6)
    # reference returns 0 for misses (kernel.cpp:71-87)
    t = intersect_triangle(jnp.array([5.0, 5.0, 0.0]), d, tv)
    assert float(t) == 0.0


def test_visibility():
    soup = make_soup([[[-5, -5, 2], [5, -5, 2], [0, 5, 2]]])
    a = jnp.array([[0.0, 0.0, 0.0]])
    blocked = jnp.array([[0.0, 0.0, 4.0]])
    clear = jnp.array([[0.0, 0.0, 1.0]])
    side = jnp.array([[0.0, 12.0, 4.0]])  # exits above the triangle's apex
    assert not bool(visible(a, blocked, soup, impl="xla")[0])
    assert bool(visible(a, clear, soup, impl="xla")[0])
    assert bool(visible(a, side, soup, impl="xla")[0])


def test_scene_sweep_matches_brute_force(large_square_soup, rng):
    soup = large_square_soup
    n = 64
    o = jnp.asarray(rng.uniform(-5, 5, (n, 3)).astype(np.float32) + np.array([0, 10, 0], np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hit = closest_hit_xla(o, jnp.asarray(d), soup)

    # numpy reference implementation, straight from kernel.cpp:161-192
    tv = np.stack(
        [np.asarray(soup.v0), np.asarray(soup.v0 + soup.e0), np.asarray(soup.v0 + soup.e1)],
        axis=1,
    )
    for i in range(n):
        best_t, best_idx, found = np.inf, 0, False
        for k in range(tv.shape[0]):
            tval = _mt_single(np.asarray(o)[i], d[i], tv[k])
            if tval > EPSILON and tval < best_t:
                best_t, best_idx, found = tval, k, True
        assert found == bool(hit.hit[i])
        if found:
            np.testing.assert_allclose(float(hit.t[i]), best_t, rtol=1e-4)
            assert int(hit.index[i]) == best_idx


def _mt_single(o, d, tri):
    v0, v1, v2 = tri
    e0, e1 = v1 - v0, v2 - v0
    pvec = np.cross(d, e1)
    det = np.dot(e0, pvec)
    if -EPSILON < det < EPSILON:
        return 0.0
    invdet = 1.0 / det
    tvec = o - v0
    u = invdet * np.dot(tvec, pvec)
    if u < 0 or u > 1:
        return 0.0
    qvec = np.cross(tvec, e0)
    v = invdet * np.dot(d, qvec)
    if v < 0 or u + v > 1:
        return 0.0
    return invdet * np.dot(e1, qvec)
