"""End-to-end pipeline + CLI tests: config + model + materials -> audio
file (the reference's only end-to-end check was listening to go.sh output)."""

import json

import numpy as np
import pytest

from rayverb_tpu.config.schema import parse_config
from rayverb_tpu.io.audio import read_audio
from rayverb_tpu.pipeline import render
from rayverb_tpu.scene.compile import load_scene


def small_config(**overrides):
    doc = {
        "rays": 128,
        "reflections": 12,
        "sample_rate": 16000,
        "bit_depth": 16,
        "source_position": [0, 2, 2],
        "mic_position": [0, 2, 0],
        "attenuation_model": {
            "speakers": [{"direction": [0, 0, 1], "shape": 0.5}]
        },
        "seed": 3,
    }
    doc.update(overrides)
    return parse_config(json.dumps(doc))


@pytest.fixture(scope="module")
def box(assets_dir):
    return load_scene(
        str(assets_dir / "test_models" / "large_square.obj"),
        str(assets_dir / "materials" / "mat.json"),
    )


def test_render_speaker_mono(box):
    cfg = small_config()
    res = render(cfg, box)
    assert res.channels.shape[0] == 1
    assert res.channels.shape[1] > 100
    assert np.abs(res.channels).max() <= 1.0 + 1e-6
    assert np.abs(res.channels).max() > 0.5  # normalised output


def test_render_stereo_speakers(box):
    cfg = small_config(
        attenuation_model={
            "speakers": [
                {"direction": [-1, 0, -1], "shape": 0.5},
                {"direction": [1, 0, -1], "shape": 0.5},
            ]
        }
    )
    res = render(cfg, box)
    assert res.channels.shape[0] == 2
    # the two cardioids differ
    n = min(res.channels.shape[1], 2000)
    assert not np.allclose(res.channels[0, :n], res.channels[1, :n])


def test_render_hrtf_stereo(box):
    cfg = small_config(
        attenuation_model={"hrtf": {"facing": [0, 0, 1], "up": [0, 1, 0]}}
    )
    res = render(cfg, box)
    assert res.channels.shape[0] == 2


def test_render_output_modes(box):
    full = render(cfg := small_config(), box)
    img = render(small_config(output_mode="image_only"), box)
    dif = render(small_config(output_mode="diffuse_only"), box)
    assert img.raw.num_impulses < dif.raw.num_impulses
    assert full.raw.num_impulses == img.raw.num_impulses + dif.raw.num_impulses


def test_render_trim_predelay(box):
    res = render(small_config(trim_predelay=True), box)
    # direct path 2 m -> predelay 2/340 s
    np.testing.assert_allclose(res.predelay, 2.0 / 340.0, rtol=1e-4)
    assert float(res.attenuated_times.min()) == 0.0


def test_cli_end_to_end(box, assets_dir, tmp_path, capsys):
    from rayverb_tpu.cli import main

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(
        json.dumps(
            {
                "rays": 64,
                "reflections": 8,
                "sample_rate": 16000,
                "bit_depth": 24,
                "source_position": [0, 2, 2],
                "mic_position": [0, 2, 0],
                "attenuation_model": {
                    "speakers": [{"direction": [0, 0, 1], "shape": 0.0}]
                },
                "seed": 1,
            }
        )
    )
    out = tmp_path / "ir.wav"
    dump = tmp_path / "impulse.dump"
    rc = main(
        [
            str(cfg_path),
            str(assets_dir / "test_models" / "large_square.obj"),
            str(assets_dir / "materials" / "mat.json"),
            str(out),
            "--dump-paths",
            str(dump),
        ]
    )
    assert rc == 0
    y, sr, bits = read_audio(str(out))
    assert sr == 16000.0 and bits == 24
    assert y.shape[0] == 1 and y.shape[1] > 10
    assert np.abs(y).max() > 0.1
    # diagnostic dump: one JSON line per ray, reference schema
    lines = dump.read_text().strip().splitlines()
    assert len(lines) == 64
    row = json.loads(lines[0])
    assert len(row) == 8
    assert set(row[0]) == {"position", "volume"}


def test_cli_missing_input(tmp_path, capsys):
    from rayverb_tpu.cli import main

    rc = main(["/nope.json", "/nope.obj", "/nope.mat", str(tmp_path / "o.wav")])
    assert rc == 1
    assert "does not exist" in capsys.readouterr().err


def test_cli_bad_extension(box, assets_dir, tmp_path, capsys):
    from rayverb_tpu.cli import main

    cfg = tmp_path / "c.json"
    cfg.write_text(
        json.dumps(
            {
                "rays": 8,
                "reflections": 2,
                "sample_rate": 8000,
                "bit_depth": 16,
                "source_position": [0, 2, 2],
                "mic_position": [0, 2, 0],
                "attenuation_model": {
                    "speakers": [{"direction": [0, 0, 1], "shape": 0.0}]
                },
            }
        )
    )
    rc = main(
        [
            str(cfg),
            str(assets_dir / "test_models" / "large_square.obj"),
            str(assets_dir / "materials" / "mat.json"),
            str(tmp_path / "o.mp3"),
        ]
    )
    assert rc == 1
    assert "valid extensions" in capsys.readouterr().err
