"""Fused device-resident render vs the modular reference-structured
pipeline — same impulses, same filters, same output (within fp noise and
the documented deviations)."""

import json

import numpy as np
import pytest

from rayverb_tpu.config.schema import parse_config
from rayverb_tpu.ops.render import chain_hashes, histogram_length, render_fused
from rayverb_tpu.pipeline import render
from rayverb_tpu.scene.compile import load_scene
from rayverb_tpu.utils.directions import random_directions


def make_config(**overrides):
    doc = {
        "rays": 96,
        "reflections": 12,
        "sample_rate": 16000,
        "bit_depth": 16,
        "source_position": [0, 2, 2],
        "mic_position": [0, 2, 0],
        "attenuation_model": {
            "speakers": [
                {"direction": [0, 0, 1], "shape": 0.5},
                {"direction": [1, 0, 0], "shape": 0.0},
            ]
        },
        "trim_tail": False,
        "seed": 11,
    }
    doc.update(overrides)
    return parse_config(json.dumps(doc))


@pytest.fixture(scope="module")
def box(assets_dir):
    return load_scene(
        str(assets_dir / "test_models" / "large_square.obj"),
        str(assets_dir / "materials" / "mat.json"),
    )


def compare(cfg, scene, atol=2e-4):
    dirs = random_directions(cfg.rays, seed=cfg.seed)
    fused, info = render_fused(scene, cfg, dirs)
    modular = render(cfg, scene, directions=dirs, filter_method="fft").channels
    n = min(fused.shape[-1], modular.shape[-1])
    assert n > 50
    scale = max(np.abs(modular).max(), 1e-9)
    np.testing.assert_allclose(
        fused[:, :n] / scale, modular[:, :n] / scale, atol=atol
    )
    # anything beyond the common length is below the trim floor / slack
    assert np.abs(fused[:, n:]).max(initial=0.0) < 2e-4
    assert np.abs(modular[:, n:]).max(initial=0.0) < 2e-4
    return fused, modular, info


def test_speakers_match(box):
    compare(make_config(), box)


def test_hrtf_match(box):
    cfg = make_config(
        attenuation_model={"hrtf": {"facing": [0, 0, 1], "up": [0, 1, 0]}}
    )
    compare(cfg, box)


@pytest.mark.slow
def test_output_modes(box):
    compare(make_config(output_mode="image_only"), box)
    compare(make_config(output_mode="diffuse_only"), box)
    compare(make_config(remove_direct=True), box)


def test_linkwitz_riley(box):
    compare(make_config(filter="linkwitz_riley"), box)


def test_finalize_scan_filter_matches(box, monkeypatch):
    """The scan filter path inside _finalize (TPU default) matches the FFT
    path to float32 noise."""
    cfg = make_config(filter="linkwitz_riley")
    dirs = random_directions(cfg.rays, seed=cfg.seed)
    fft_out, _ = render_fused(box, cfg, dirs)
    monkeypatch.setenv("RAYVERB_FINALIZE_FILTER", "scan")
    scan_out, _ = render_fused(box, cfg, dirs)
    n = min(fft_out.shape[-1], scan_out.shape[-1])
    scale = np.abs(fft_out).max() + 1e-9
    np.testing.assert_allclose(
        fft_out[:, :n] / scale, scan_out[:, :n] / scale, atol=2e-4
    )


def test_trim_tail(box):
    cfg = make_config(trim_tail=True)
    dirs = random_directions(cfg.rays, seed=cfg.seed)
    fused, info = render_fused(box, cfg, dirs)
    modular = render(cfg, box, directions=dirs, filter_method="fft").channels
    # trim lengths within a couple of samples of each other
    assert abs(fused.shape[-1] - modular.shape[-1]) <= 2


def test_predelay_shift(box):
    cfg = make_config(trim_predelay=True)
    dirs = random_directions(cfg.rays, seed=cfg.seed)
    fused, info = render_fused(box, cfg, dirs)
    np.testing.assert_allclose(info["predelay"], 2.0 / 340.0, rtol=1e-4)
    # energy starts immediately (bin shift): first 4 samples contain signal
    assert np.abs(fused[:, :8]).max() > 0


def _compare_predelay(overrides, box):
    """The fused path applies predelay as a whole-histogram bin shift (a
    documented deviation: each impulse may move one sample relative to the
    reference's per-impulse subtraction). Because the predelay is the
    MINIMUM arrival time, nothing lands before the shift, so the exact
    contract is: fused(trim_predelay) == modular(no predelay) advanced by
    round(predelay * sr) samples. Filtering is LTI and normalize is
    shift-invariant, so the comparison holds post-processing."""
    cfg_pd = make_config(trim_predelay=True, **overrides)
    dirs = random_directions(cfg_pd.rays, seed=cfg_pd.seed)
    fused, info = render_fused(box, cfg_pd, dirs)
    assert info["predelay"] > 0
    shift = int(np.floor(info["predelay"] * cfg_pd.sample_rate + 0.5))

    cfg_nopd = make_config(trim_predelay=False, **overrides)
    modular = render(cfg_nopd, box, directions=dirs, filter_method="fft").channels

    expected = modular[:, shift:]
    n = min(fused.shape[-1], expected.shape[-1])
    assert n > 50
    scale = max(np.abs(expected).max(), 1e-9)
    np.testing.assert_allclose(
        fused[:, :n] / scale, expected[:, :n] / scale, atol=2e-4
    )
    return fused


def test_hrtf_trim_predelay_match(box):
    """Regression: fused predelay must come from post-HRTF ITD-shifted
    times and clamp shifted-out bins to bin 0 (fixPredelay), not drop
    them — otherwise near-ear direct-path energy is zeroed and normalize
    rescales by the wrong peak (the shipped hrtf_* configs all combine
    hrtf with trim_predelay)."""
    fused = _compare_predelay(
        dict(
            attenuation_model={
                "hrtf": {"facing": [0, 0, 1], "up": [0, 1, 0]}
            },
            normalize=True,
        ),
        box,
    )
    # direct-path energy survives at the front of the IR
    assert np.abs(fused[:, :8]).max() > 0.01


def test_speaker_trim_predelay_match(box):
    _compare_predelay(dict(normalize=True), box)


def test_chunked_matches_single(box):
    cfg = make_config(rays=70)
    dirs = random_directions(cfg.rays, seed=3)
    a, _ = render_fused(box, cfg, dirs, ray_chunk=4096)
    b, _ = render_fused(box, cfg, dirs, ray_chunk=32)
    n = min(a.shape[-1], b.shape[-1])
    np.testing.assert_allclose(a[:, :n], b[:, :n], atol=1e-5)


def test_chain_hashes_prefix_semantics():
    import jax.numpy as jnp

    idx = jnp.asarray(
        np.array(
            [
                [0, 5, 7, 0, 0],
                [0, 5, 7, 0, 0],   # identical chain -> identical hashes
                [0, 5, 8, 0, 0],   # diverges at slot 2
            ],
            np.int32,
        )
    )
    h1, h2 = chain_hashes(idx)
    h1 = np.asarray(h1)
    h2 = np.asarray(h2)
    np.testing.assert_array_equal(h1[0], h1[1])
    np.testing.assert_array_equal(h2[0], h2[1])
    assert h1[0, 1] == h1[2, 1]  # shared prefix [0, 5]
    assert h1[0, 2] != h1[2, 2]  # diverged
    assert h2[0, 2] != h2[2, 2]


def test_histogram_length_bounds(box):
    l = histogram_length(box, 12, 16000.0)
    # box diagonal ~66 m, 14 segments -> ~2.7 s at 16 kHz
    assert 40000 < l < 80000
    from rayverb_tpu.ops.render import MAX_HIST_LEN

    assert histogram_length(box, 100000, 44100.0) == MAX_HIST_LEN


def test_sinc_fused_matches_modular(box):
    """The windowed-sinc FIR bank runs on the fused path (one FFT
    convolution per band, FastConvolution growth) and matches the modular
    pipeline."""
    cfg = make_config(filter="sinc")
    fused, modular, _ = compare(cfg, box)
    # FastConvolution growth: fused output covers the grown region
    assert fused.shape[-1] >= modular.shape[-1] - 2


class TestResortInvariance:
    """Per-bounce ray re-sorting and nvalid volume-zeroing are pure
    performance machinery (trace._trace_impl resort/nvalid): histogram,
    time stats, and original-ray-order image records must be unchanged."""

    def _run(self, box, resort, n=512, nvalid=None, refl=12):
        import jax.numpy as jnp

        from rayverb_tpu.ops.intersect import soup_from_scene
        from rayverb_tpu.ops.render import (
            _fused_trace_bin,
            histogram_length,
            make_atten_spec,
        )

        cfg = make_config(rays=n, reflections=refl)
        soup = soup_from_scene(box)
        spec = make_atten_spec(cfg.attenuation_model)
        dirs = random_directions(n, seed=3)
        length = histogram_length(box, refl, cfg.sample_rate)
        return _fused_trace_bin(
            soup,
            jnp.asarray(cfg.mic_position),
            jnp.asarray(cfg.source_position),
            jnp.asarray(dirs),
            np.int32(n if nvalid is None else nvalid),
            tuple(spec[2:]),
            nreflections=refl,
            length=length,
            sample_rate=cfg.sample_rate,
            impl="xla",
            spec_static=(spec.is_hrtf, spec.nchannels),
            include_diffuse=True,
            resort=resort,
        )

    @pytest.mark.slow
    def test_resort_matches_unsorted(self, box):
        h0, mx0, mn0, img0, _ovf0 = self._run(box, resort=False)
        h1, mx1, mn1, img1, _ovf1 = self._run(box, resort=True)
        np.testing.assert_allclose(
            np.asarray(h0), np.asarray(h1), rtol=1e-5, atol=1e-7
        )
        assert float(mx0) == pytest.approx(float(mx1))
        assert float(mn0) == pytest.approx(float(mn1))
        # image records come back in ORIGINAL ray order: exact match
        for a, b in zip(img0, img1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.slow
    def test_nvalid_matches_sliced(self, box):
        """Rendering n rays padded to 2n with nvalid=n equals rendering
        the n rays alone (padding rays silenced at trace start)."""
        import jax.numpy as jnp

        n = 96
        h_pad, mx_p, mn_p, img_p, _ovf = self._run(
            box, resort=True, n=2 * n, nvalid=n
        )
        # reference: explicit n-ray run (same leading directions)
        from rayverb_tpu.ops.intersect import soup_from_scene
        from rayverb_tpu.ops.render import (
            _fused_trace_bin,
            histogram_length,
            make_atten_spec,
        )

        cfg = make_config(rays=n)
        soup = soup_from_scene(box)
        spec = make_atten_spec(cfg.attenuation_model)
        dirs = random_directions(2 * n, seed=3)[:n]
        length = histogram_length(box, cfg.reflections, cfg.sample_rate)
        h_ref, mx_r, mn_r, img_r, _ovf_r = _fused_trace_bin(
            soup,
            jnp.asarray(cfg.mic_position),
            jnp.asarray(cfg.source_position),
            jnp.asarray(dirs),
            np.int32(n),
            tuple(spec[2:]),
            nreflections=cfg.reflections,
            length=length,
            sample_rate=cfg.sample_rate,
            impl="xla",
            spec_static=(spec.is_hrtf, spec.nchannels),
            include_diffuse=True,
            resort=False,
        )
        np.testing.assert_allclose(
            np.asarray(h_pad), np.asarray(h_ref), rtol=1e-5, atol=1e-7
        )
        assert float(mx_p) == pytest.approx(float(mx_r))
        assert float(mn_p) == pytest.approx(float(mn_r))
        # padded rows beyond nvalid are invalid; leading rows match
        valid_p = np.asarray(img_p[4])
        assert not valid_p[n:].any()
        for a, b in zip(img_p, img_r):
            np.testing.assert_array_equal(np.asarray(a)[:n], np.asarray(b))
