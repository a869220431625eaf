"""Diagnostics path dump + viewer (VERDICT r2 item 7): the --dump-paths
JSONL must round-trip against the trace outputs with the reference's
schema (print_diagnostic, reference rayverb/helpers.cpp:16-60; consumer
viewer/viewer.pde:51-76), and the matplotlib viewer must render it."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from rayverb_tpu.cli import main as cli_main
from rayverb_tpu.ops.trace import trace
from rayverb_tpu.utils.diagnostics import PhaseTimer, dump_paths_arrays
from rayverb_tpu.utils.directions import random_directions

REPO = Path(__file__).resolve().parent.parent


def write_config(tmp_path, rays=24, reflections=6):
    doc = {
        "rays": rays,
        "reflections": reflections,
        "sample_rate": 16000,
        "bit_depth": 16,
        "source_position": [0, 2, 2],
        "mic_position": [0, 2, 0],
        "attenuation_model": {
            "speakers": [{"direction": [0, 0, 1], "shape": 0.5}]
        },
        "trim_tail": False,
        "seed": 7,
    }
    path = tmp_path / "config.json"
    path.write_text(json.dumps(doc))
    return path, doc


@pytest.mark.slow
def test_dump_paths_round_trip(tmp_path, large_square_scene):
    """CLI --dump-paths -> JSONL whose positions/volumes equal the trace's
    diffuse outputs (schema: one JSON array per ray of
    {"position": [x,y,z], "volume": mean-of-8-bands})."""
    cfg_path, doc = write_config(tmp_path)
    model = str(REPO / "assets" / "test_models" / "large_square.obj")
    materials = str(REPO / "assets" / "materials" / "mat.json")
    out_wav = str(tmp_path / "out.wav")
    dump = str(tmp_path / "impulse.dump")

    rc = cli_main(
        [str(cfg_path), model, materials, out_wav, "--dump-paths", dump]
    )
    assert rc == 0
    assert Path(out_wav).exists()

    lines = [
        json.loads(l) for l in Path(dump).read_text().splitlines() if l.strip()
    ]
    assert len(lines) == doc["rays"]
    for ray in lines:
        assert len(ray) == doc["reflections"]
        for refl in ray:
            assert set(refl) == {"position", "volume"}
            assert len(refl["position"]) == 3

    # independent trace with the same seed: dump must mirror its outputs
    dirs = random_directions(doc["rays"], seed=doc["seed"])
    outs = trace(
        large_square_scene,
        doc["mic_position"],
        doc["source_position"],
        dirs,
        doc["reflections"],
    )
    got_pos = np.array(
        [[r["position"] for r in ray] for ray in lines], np.float32
    )
    got_vol = np.array([[r["volume"] for r in ray] for ray in lines])
    np.testing.assert_allclose(
        got_pos, np.asarray(outs.diffuse_position), atol=1e-5
    )
    np.testing.assert_allclose(
        got_vol, np.asarray(outs.diffuse_volume).mean(axis=-1), atol=1e-6
    )


def test_dump_paths_arrays_schema(tmp_path):
    pos = np.arange(2 * 3 * 3, dtype=np.float32).reshape(2, 3, 3)
    vol = np.full((2, 3, 8), 0.25, np.float32)
    path = tmp_path / "d.jsonl"
    dump_paths_arrays(str(path), pos, vol)
    rows = [json.loads(l) for l in path.read_text().splitlines()]
    assert rows[1][2]["position"] == [15.0, 16.0, 17.0]
    assert rows[0][0]["volume"] == pytest.approx(0.25)


def test_viewer_renders_png(tmp_path):
    """scripts/viewer.py smoke test: dump -> PNG (replaces the Processing
    sketch viewer/viewer.pde)."""
    pytest.importorskip("matplotlib")
    cfg_path, doc = write_config(tmp_path, rays=8, reflections=4)
    model = str(REPO / "assets" / "test_models" / "large_square.obj")
    materials = str(REPO / "assets" / "materials" / "mat.json")
    dump = str(tmp_path / "impulse.dump")
    rc = cli_main(
        [
            str(cfg_path),
            model,
            materials,
            str(tmp_path / "o.wav"),
            "--dump-paths",
            dump,
        ]
    )
    assert rc == 0
    png = tmp_path / "paths.png"
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "viewer.py"),
            dump,
            model,
            str(cfg_path),
            str(png),
            "--rays",
            "4",
        ],
        capture_output=True,
        text=True,
        env={
            "PATH": "/usr/bin:/bin:/usr/local/bin",
            "JAX_PLATFORMS": "cpu",
            "HOME": "/root",
        },
    )
    assert proc.returncode == 0, proc.stderr
    assert png.exists() and png.stat().st_size > 1000


def test_phase_timer_report():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    rep = t.report()
    assert "a:" in rep and "b:" in rep and "total:" in rep
