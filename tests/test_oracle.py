"""End-to-end accuracy gate: the production pipelines vs an independent
float64 numpy/scipy oracle (tests/oracle.py), within −60 dB of peak.

This is the closest achievable stand-in for "IR within −60 dB of the
reference" (BASELINE.json): the reference can't run here, so the oracle
re-implements its semantics (kernel.cpp:304-625, rayverb.cpp:48-149)
independently — per-ray loops, float64, scipy filters, no JAX.
"""

import json

import numpy as np
import pytest

from rayverb_tpu.config.schema import parse_config
from rayverb_tpu.ops.render import render_fused
from rayverb_tpu.pipeline import render
from rayverb_tpu.scene.compile import load_scene
from rayverb_tpu.utils.directions import random_directions

import oracle

DB60 = 1e-3  # −60 dB relative to peak


def _config(attenuation, rays=24, reflections=6, sr=16000):
    return parse_config(
        json.dumps(
            {
                "rays": rays,
                "reflections": reflections,
                "sample_rate": sr,
                "bit_depth": 16,
                "source_position": [0, 2, 2],
                "mic_position": [0, 2, 0],
                "attenuation_model": attenuation,
                "filter": "linkwitz_riley",
                "normalize": True,
                "trim_tail": False,
                "seed": 7,
            }
        )
    )


SPEAKERS = {
    "speakers": [
        {"direction": [0, 0, 1], "shape": 0.5},
        {"direction": [1, 0, 0], "shape": 0.0},
    ]
}
HRTF = {"hrtf": {"facing": [0, 0, 1], "up": [0, 1, 0]}}


@pytest.fixture(scope="module")
def box(assets_dir):
    return load_scene(
        str(assets_dir / "test_models" / "large_square.obj"),
        str(assets_dir / "materials" / "mat.json"),
    )


@pytest.fixture(scope="module")
def bedroom(assets_dir):
    return load_scene(
        str(assets_dir / "test_models" / "bedroom.obj"),
        str(assets_dir / "materials" / "mat.json"),
    )


def _oracle_render(scene, cfg, dirs, hrtf_table=None):
    model = cfg.attenuation_model
    if model.is_hrtf:
        return oracle.render(
            scene,
            cfg.mic_position,
            cfg.source_position,
            dirs,
            cfg.reflections,
            cfg.sample_rate,
            attenuation="hrtf",
            hrtf_table=hrtf_table,
            facing=model.hrtf.facing,
            up=model.hrtf.up,
            lo_cutoff=cfg.hipass,
        )
    return oracle.render(
        scene,
        cfg.mic_position,
        cfg.source_position,
        dirs,
        cfg.reflections,
        cfg.sample_rate,
        attenuation="speakers",
        speakers=[
            {"direction": np.asarray(s.direction), "shape": float(s.shape)}
            for s in model.speakers
        ],
        lo_cutoff=cfg.hipass,
    )


def _assert_within_60db(got, want):
    """Max sample error < −60 dB of peak, tolerating single-bin impulse
    displacement: the production system (like the reference, whose impulse
    times are cl_float) quantizes float32 times to sample bins, so an
    impulse whose t*sr sits within one f32 ulp of a .5 boundary can land
    one bin away from the float64 oracle's placement. The pointwise
    min-over-{0,±1}-shift error forgives exactly that and nothing else —
    gain, dedup, filter, ordering and predelay errors all still register.
    """
    n = min(got.shape[-1], want.shape[-1])
    assert n > 20
    peak = np.abs(want).max()
    assert peak > 0
    g = got[:, :n]
    errs = [np.abs(g - want[:, :n])]
    for s in (1, -1):
        w = np.roll(want, s, axis=-1)[:, :n]
        errs.append(np.abs(g - w))
    err = np.minimum(np.minimum(errs[0], errs[1]), errs[2]).max() / peak
    assert err < DB60, f"max error {err:.2e} exceeds -60 dB"
    # anything outside the common window is also below the floor
    assert np.abs(got[:, n:]).max(initial=0.0) / peak < DB60
    assert np.abs(want[:, n:]).max(initial=0.0) / peak < DB60


@pytest.mark.parametrize(
    "scene_name",
    ["box", pytest.param("bedroom", marks=pytest.mark.slow)],
)
def test_modular_matches_oracle_speakers(scene_name, request):
    scene = request.getfixturevalue(scene_name)
    cfg = _config(SPEAKERS)
    dirs = random_directions(cfg.rays, seed=cfg.seed)
    want = _oracle_render(scene, cfg, dirs)
    got = render(cfg, scene, directions=dirs).channels
    _assert_within_60db(np.asarray(got, np.float64), want)


@pytest.mark.slow
def test_fused_matches_oracle_speakers(box):
    cfg = _config(SPEAKERS)
    dirs = random_directions(cfg.rays, seed=cfg.seed)
    want = _oracle_render(box, cfg, dirs)
    got, _ = render_fused(box, cfg, dirs)
    _assert_within_60db(np.asarray(got, np.float64), want)


def _smooth_table():
    """Synthetic HRTF table varying < 0.1 % per degree: the az/el ->
    integer-degree floor runs on float32 transcendentals in the system
    under test, so a direction within ~1e-6 of a degree boundary may pick
    the neighboring entry vs the float64 oracle. With a smooth table that
    flip costs < 1e-3 of peak, while real indexing errors (swapped axes,
    wrong channel, missing head rotation — tens of degrees) still blow the
    −60 dB budget. The sharp-table gather itself is covered bit-exactly by
    tests/test_hrtf_table.py and the fused-vs-modular equivalence tests."""
    a = np.arange(360)[:, None, None]
    e = np.arange(180)[None, :, None]
    b = np.arange(8)[None, None, :]
    base = (
        0.9
        + 0.05 * np.sin(2 * np.pi * a / 360.0) * np.cos(np.pi * (e - 90) / 180.0)
        + 0.004 * b
    )
    left = base
    right = 0.9 + 0.05 * np.cos(2 * np.pi * a / 360.0) * np.cos(
        np.pi * (e - 90) / 180.0
    ) + 0.004 * b
    return np.stack([left, right]).astype(np.float32)


def test_fused_matches_oracle_hrtf(box):
    table = _smooth_table()
    cfg = _config(HRTF)
    dirs = random_directions(cfg.rays, seed=cfg.seed)
    want = _oracle_render(box, cfg, dirs, hrtf_table=table)
    got, _ = render_fused(box, cfg, dirs, hrtf_table=table)
    _assert_within_60db(np.asarray(got, np.float64), want)
