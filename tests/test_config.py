"""Config schema tests (reference field registry cmd/main.cpp:139-207)."""

import glob

import numpy as np
import pytest

from rayverb_tpu import ConfigError, FilterType, OutputMode, load_config, parse_config

MINIMAL = """
{
    "rays": 1000,
    "reflections": 16,
    "sample_rate": 44100,
    "bit_depth": 16,
    "source_position": [0, 1, 0],
    "mic_position": [0, 1, 2],
    "attenuation_model": {"speakers": [{"direction": [0, 0, 1], "shape": 0.5}]}
}
"""


def test_minimal_config():
    cfg = parse_config(MINIMAL)
    assert cfg.rays == 1000
    assert cfg.reflections == 16
    assert cfg.sample_rate == 44100
    assert cfg.bit_depth == 16
    np.testing.assert_allclose(cfg.source_position, [0, 1, 0])
    assert not cfg.attenuation_model.is_hrtf
    assert cfg.attenuation_model.num_channels == 1
    # defaults (cmd/main.cpp:147-157)
    assert cfg.filter is FilterType.BIQUAD_ONEPASS
    assert cfg.hipass == 45.0
    assert cfg.normalize is True
    assert cfg.volume_scale == 1.0
    assert cfg.trim_predelay is False
    assert cfg.remove_direct is False
    assert cfg.trim_tail is True
    assert cfg.output_mode is OutputMode.ALL
    assert cfg.verbose is False


def test_missing_required_key():
    import json

    doc = json.loads(MINIMAL)
    del doc["rays"]
    with pytest.raises(ConfigError, match="key rays not found"):
        parse_config(json.dumps(doc))


def test_attenuation_model_exactly_one():
    import json

    doc = json.loads(MINIMAL)
    doc["attenuation_model"] = {
        "speakers": [],
        "hrtf": {"facing": [0, 0, 1], "up": [0, 1, 0]},
    }
    with pytest.raises(ConfigError):
        parse_config(json.dumps(doc))
    doc["attenuation_model"] = {}
    with pytest.raises(ConfigError):
        parse_config(json.dumps(doc))


def test_hrtf_normalised():
    import json

    doc = json.loads(MINIMAL)
    doc["attenuation_model"] = {"hrtf": {"facing": [5, 75, -5], "up": [0, 2, 0]}}
    cfg = parse_config(json.dumps(doc))
    assert cfg.attenuation_model.is_hrtf
    assert cfg.attenuation_model.num_channels == 2
    np.testing.assert_allclose(
        np.linalg.norm(cfg.attenuation_model.hrtf.facing), 1.0, atol=1e-6
    )
    np.testing.assert_allclose(cfg.attenuation_model.hrtf.up, [0, 1, 0], atol=1e-6)


def test_enum_values():
    import json

    doc = json.loads(MINIMAL)
    for name, member in [
        ("sinc", FilterType.WINDOWED_SINC),
        ("onepass", FilterType.BIQUAD_ONEPASS),
        ("twopass", FilterType.BIQUAD_TWOPASS),
        ("linkwitz_riley", FilterType.LINKWITZ_RILEY),
    ]:
        doc["filter"] = name
        assert parse_config(json.dumps(doc)).filter is member
    doc["filter"] = "bogus"
    with pytest.raises(ConfigError):
        parse_config(json.dumps(doc))


def test_volumme_scale_spelling():
    import json

    doc = json.loads(MINIMAL)
    doc["volumme_scale"] = 0.5
    assert parse_config(json.dumps(doc)).volume_scale == 0.5


def test_hipass_false_quirk():
    import json

    doc = json.loads(MINIMAL)
    doc["hipass"] = False
    cfg = parse_config(json.dumps(doc))
    assert cfg.hipass == 45.0
    assert any("hipass" in w for w in cfg.warnings)


def test_type_errors():
    import json

    doc = json.loads(MINIMAL)
    doc["rays"] = "many"
    with pytest.raises(ConfigError):
        parse_config(json.dumps(doc))
    doc = json.loads(MINIMAL)
    doc["mic_position"] = [1, 2]
    with pytest.raises(ConfigError):
        parse_config(json.dumps(doc))
    doc = json.loads(MINIMAL)
    doc["normalize"] = 1
    with pytest.raises(ConfigError):
        parse_config(json.dumps(doc))


def test_all_demo_configs_parse(assets_dir):
    paths = sorted(glob.glob(str(assets_dir / "configs" / "*.json")))
    assert len(paths) >= 19
    for p in paths:
        cfg = load_config(p)
        assert cfg.rays > 0 and cfg.reflections > 0
