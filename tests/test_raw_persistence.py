"""Raw impulse persistence: save, reload, re-render without re-tracing."""

import json

import numpy as np
import pytest

from rayverb_tpu.config.schema import parse_config
from rayverb_tpu.engine import load_raw, save_raw
from rayverb_tpu.pipeline import render, render_from_raw
from rayverb_tpu.scene.compile import load_scene


def make_config(**overrides):
    doc = {
        "rays": 64,
        "reflections": 8,
        "sample_rate": 8000,
        "bit_depth": 16,
        "source_position": [0, 2, 2],
        "mic_position": [0, 2, 0],
        "attenuation_model": {
            "speakers": [{"direction": [0, 0, 1], "shape": 0.5}]
        },
        "seed": 4,
    }
    doc.update(overrides)
    return parse_config(json.dumps(doc))


def test_roundtrip_matches_direct_render(assets_dir, tmp_path):
    scene = load_scene(
        str(assets_dir / "test_models" / "large_square.obj"),
        str(assets_dir / "materials" / "mat.json"),
    )
    cfg = make_config()
    direct = render(cfg, scene)
    path = str(tmp_path / "raw.npz")
    save_raw(path, direct.raw)

    loaded = load_raw(path)
    assert loaded.num_impulses == direct.raw.num_impulses
    np.testing.assert_allclose(loaded.mic, [0, 2, 0])

    redone = render_from_raw(cfg, loaded)
    np.testing.assert_allclose(redone.channels, direct.channels, atol=1e-6)

    # different post-processing on the same raw trace
    cfg2 = make_config(
        attenuation_model={"hrtf": {"facing": [0, 0, 1], "up": [0, 1, 0]}},
        filter="linkwitz_riley",
    )
    stereo = render_from_raw(cfg2, loaded)
    assert stereo.channels.shape[0] == 2


@pytest.mark.slow
def test_cli_save_and_from_raw(assets_dir, tmp_path):
    from rayverb_tpu.cli import main
    from rayverb_tpu.io.audio import read_audio

    cfg_path = tmp_path / "c.json"
    cfg_path.write_text(
        json.dumps(
            {
                "rays": 32,
                "reflections": 6,
                "sample_rate": 8000,
                "bit_depth": 16,
                "source_position": [0, 2, 2],
                "mic_position": [0, 2, 0],
                "attenuation_model": {
                    "speakers": [{"direction": [0, 0, 1], "shape": 0.0}]
                },
                "seed": 7,
            }
        )
    )
    model = str(assets_dir / "test_models" / "large_square.obj")
    mats = str(assets_dir / "materials" / "mat.json")
    raw = str(tmp_path / "trace.npz")
    out1 = str(tmp_path / "a.wav")
    out2 = str(tmp_path / "b.wav")
    assert main([str(cfg_path), model, mats, out1, "--save-raw", raw]) == 0
    assert main([str(cfg_path), model, mats, out2, "--from-raw", raw]) == 0
    a, _, _ = read_audio(out1)
    b, _, _ = read_audio(out2)
    np.testing.assert_allclose(a, b, atol=1e-6)
