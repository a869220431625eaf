"""Multi-device sharding tests on the 8-device CPU mesh."""

import json

import jax
import numpy as np
import pytest

from rayverb_tpu.config.schema import parse_config
from rayverb_tpu.ops.render import render_fused
from rayverb_tpu.parallel import make_mesh, render_fused_sharded, shard_rays
from rayverb_tpu.scene.compile import load_scene
from rayverb_tpu.utils.directions import random_directions


def make_config(**overrides):
    doc = {
        "rays": 96,
        "reflections": 10,
        "sample_rate": 16000,
        "bit_depth": 16,
        "source_position": [0, 2, 2],
        "mic_position": [0, 2, 0],
        "attenuation_model": {
            "speakers": [
                {"direction": [0, 0, 1], "shape": 0.5},
                {"direction": [-1, 0, 0], "shape": 1.0},
            ]
        },
        "trim_tail": False,
        "seed": 21,
    }
    doc.update(overrides)
    return parse_config(json.dumps(doc))


@pytest.fixture(scope="module")
def box(assets_dir):
    return load_scene(
        str(assets_dir / "test_models" / "large_square.obj"),
        str(assets_dir / "materials" / "mat.json"),
    )


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_rays_pads():
    mesh = make_mesh()
    dirs = random_directions(21, seed=0)
    sharded, n = shard_rays(dirs, mesh)
    assert n == 21
    assert sharded.shape[0] == 24
    assert sharded.sharding.is_fully_replicated is False


@pytest.mark.slow
def test_sharded_matches_single_device(box):
    cfg = make_config()
    dirs = random_directions(cfg.rays, seed=cfg.seed)
    single, _ = render_fused(box, cfg, dirs)
    mesh = make_mesh()
    multi, info = render_fused_sharded(box, cfg, dirs, mesh=mesh)
    assert info["mesh"] == {"rays": 8}
    n = min(single.shape[-1], multi.shape[-1])
    np.testing.assert_allclose(single[:, :n], multi[:, :n], atol=2e-5)


@pytest.mark.slow
def test_sharded_uneven_rays(box):
    """Ray count not divisible by the mesh: padding must not leak."""
    cfg = make_config(rays=61)
    dirs = random_directions(cfg.rays, seed=5)
    single, _ = render_fused(box, cfg, dirs)
    multi, _ = render_fused_sharded(box, cfg, dirs, mesh=make_mesh())
    n = min(single.shape[-1], multi.shape[-1])
    np.testing.assert_allclose(single[:, :n], multi[:, :n], atol=2e-5)


@pytest.mark.slow
def test_sharded_hrtf(box):
    cfg = make_config(
        attenuation_model={"hrtf": {"facing": [0, 0, 1], "up": [0, 1, 0]}}
    )
    dirs = random_directions(cfg.rays, seed=9)
    single, _ = render_fused(box, cfg, dirs)
    multi, _ = render_fused_sharded(box, cfg, dirs, mesh=make_mesh())
    n = min(single.shape[-1], multi.shape[-1])
    np.testing.assert_allclose(single[:, :n], multi[:, :n], atol=2e-5)


def test_sharded_subset_mesh(box):
    cfg = make_config(rays=40)
    dirs = random_directions(cfg.rays, seed=2)
    single, _ = render_fused(box, cfg, dirs)
    multi, _ = render_fused_sharded(box, cfg, dirs, mesh=make_mesh(4))
    n = min(single.shape[-1], multi.shape[-1])
    np.testing.assert_allclose(single[:, :n], multi[:, :n], atol=2e-5)


@pytest.mark.slow
def test_sharded_at_scale(box):
    """Scale-grade path (VERDICT r2 item 6): >= 64k rays through the full
    sharded machinery — chunked scan per shard, segment dispatch, per-shard
    image dedup into the fixed budget, content-bucket finalize — matches
    the single-chip render."""
    cfg = make_config(rays=65536, reflections=6)
    dirs = random_directions(cfg.rays, seed=31)
    single, _ = render_fused(box, cfg, dirs)
    multi, info = render_fused_sharded(
        box, cfg, dirs, mesh=make_mesh(), ray_chunk=4096
    )
    assert info["image_rows_distinct_per_shard_max"] > 0
    assert info["image_rows_gathered"] < cfg.rays  # pre-dedup shrinks
    n = min(single.shape[-1], multi.shape[-1])
    scale = max(np.abs(single).max(), 1e-9)
    np.testing.assert_allclose(
        single[:, :n] / scale, multi[:, :n] / scale, atol=5e-5
    )


@pytest.mark.slow
def test_sharded_image_budget_retry(box):
    """A too-small image budget must retry transparently with a larger
    one, not drop records."""
    cfg = make_config(rays=128)
    dirs = random_directions(cfg.rays, seed=13)
    single, _ = render_fused(box, cfg, dirs)
    multi, info = render_fused_sharded(
        box, cfg, dirs, mesh=make_mesh(), image_budget=1
    )
    n = min(single.shape[-1], multi.shape[-1])
    np.testing.assert_allclose(single[:, :n], multi[:, :n], atol=2e-5)
