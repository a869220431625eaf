#!/usr/bin/env python
"""Benchmark: the north-star workload + the reference's headline workload.

Primary metric (BASELINE.json): trace 1M rays x 16 bounces through a
100k-triangle hall and render a stereo HRTF IR on one TPU chip —
ray-bounces/sec/chip. The hall mesh is procedurally generated on demand
(scripts/gen_hall.py; deterministic, cached on disk).

Continuity workload: the vault demo exactly as shipped
(assets/configs/vault.json: 50,000 rays x 128 reflections through the
3,754-triangle vault, stereo cardioid speakers, zero-phase Linkwitz-Riley
crossover, full image-source search) — the configuration the reference's
docs report at ~10 s on its 2015 GPU (BASELINE.md), i.e. ~0.64 M
ray-bounces/s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
value = north-star ray-bounces/s of the steady-state fused render (second
run; the first run pays one-time XLA compilation). vs_baseline is against
the reference's implied 0.64 M ray-bounces/s.
"""

import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_RAY_BOUNCES_PER_S = 0.64e6  # BASELINE.md implied throughput

# Results land here as they are measured so the deadline watchdog can
# emit whatever was completed if the tunneled backend wedges mid-run
# (observed: device roundtrips that normally take ~30 ms blocking for
# minutes — docs/perf.md measurement-hygiene note). A wedged backend
# hangs inside a device wait, which no exception handler can see; the
# watchdog is the only way to leave a machine-readable artifact behind.
_partial = {}
_emitted = threading.Event()
_last_progress = [time.monotonic()]


def _progress(**results):
    _partial.update(results)
    _last_progress[0] = time.monotonic()


def _emit(payload):
    if _emitted.is_set():
        return
    _emitted.set()
    print(json.dumps(payload), flush=True)


def _watchdog_fire(stall_s):
    payload = {
        "metric": (
            "ray-bounces/sec/chip (INCOMPLETE: backend wedged — no bench "
            f"progress for {stall_s:.0f}s; partial results only — see "
            "health_matmul_tflops; healthy chip+tunnel sustains ~150)"
        ),
        "value": _partial.get("value", 0.0),
        "unit": "ray-bounces/s",
        "vs_baseline": _partial.get("vs_baseline", 0.0),
        "backend_wedged": True,
    }
    payload.update({k: v for k, v in _partial.items() if k not in payload})
    _emit(payload)
    os._exit(0)


def _watchdog_loop(stall_s):
    # A stall detector, not an absolute deadline: cold-cache runs spend
    # many minutes per program in XLA compilation, but each completed
    # workload calls _progress(); only a wedged backend produces a gap
    # longer than stall_s between completions.
    while True:
        time.sleep(10.0)
        if time.monotonic() - _last_progress[0] > stall_s:
            _watchdog_fire(stall_s)


def _start_watchdog():
    stall_s = float(os.environ.get("RAYVERB_BENCH_DEADLINE", "1500"))
    if stall_s <= 0:
        return
    t = threading.Thread(target=_watchdog_loop, args=(stall_s,), daemon=True)
    t.start()

NORTH_STAR_RAYS = 1_000_000
NORTH_STAR_REFLECTIONS = 16
NORTH_STAR_TRIANGLES = 100_000


def _hall_path():
    path = os.path.join(REPO, "assets/test_models/hall100k.obj")
    if not os.path.exists(path):
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        from gen_hall import generate

        n = generate(path, NORTH_STAR_TRIANGLES)
        print(f"generated {path}: {n} triangles", file=sys.stderr)
    return path


def _north_star_config():
    from rayverb_tpu.config.schema import parse_config

    return parse_config(
        json.dumps(
            {
                "rays": NORTH_STAR_RAYS,
                "reflections": NORTH_STAR_REFLECTIONS,
                "sample_rate": 44100,
                "bit_depth": 16,
                "source_position": [12.0, 6.0, 8.0],
                "mic_position": [28.0, 5.0, 20.0],
                "attenuation_model": {
                    "hrtf": {"facing": [0, 0, 1], "up": [0, 1, 0]}
                },
                "filter": "linkwitz_riley",
                "normalize": True,
                "trim_tail": False,
            }
        )
    )


# Steady-state passes per workload; the best wall is reported. The
# tunneled backend occasionally degrades 5-60x on unchanged cached
# programs for stretches (docs/perf.md measurement-hygiene note), so a
# single timed pass can report noise; min-of-N is the standard hedge.
STEADY_RUNS = int(os.environ.get("RAYVERB_BENCH_RUNS", "2"))


def run(cfg, scene, ray_chunk, seed=1234, stats=False, bin_mode=None):
    from rayverb_tpu.ops.render import render_fused
    from rayverb_tpu.utils.directions import random_directions

    dirs = random_directions(cfg.rays, seed=seed)

    # warm-up: compiles the fused chunk + finalize programs
    render_fused(scene, cfg, dirs, ray_chunk=ray_chunk, stats=stats,
                 bin_mode=bin_mode)

    wall = float("inf")
    for _ in range(STEADY_RUNS):
        t0 = time.perf_counter()
        channels, info = render_fused(
            scene, cfg, dirs, ray_chunk=ray_chunk, stats=stats,
            bin_mode=bin_mode,
        )
        wall = min(wall, time.perf_counter() - t0)
    assert channels.size > 0
    return cfg.rays * cfg.reflections, wall, info


def _chip_health():
    """Program-independent chip+tunnel health scalar: steady TFLOP/s of a
    256-long chained 8k bf16 matmul (v5e peak ~197; a healthy chip+tunnel
    sustains ~150+). Our render programs can regress for framework
    reasons; this cannot — so the driver can tell chip sickness from a
    real regression in the same JSON artifact (VERDICT r4 item 1)."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8192, 8192), jnp.bfloat16)
    f = jax.jit(
        lambda a: jax.lax.fori_loop(0, 256, lambda i, c: c @ a * 1e-3, a).sum()
    )
    float(f(x))  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    return 256 * 2 * 8192**3 / best / 1e12


def _bench_datagen(scene, pairs=64, rays=4096, reflections=16):
    """Steady-state pairs/s of the fused multi-pair datagen program
    (BASELINE.json config 5; reference analog: one process per render via
    demo/gen.sh at ~0.1 pairs/s)."""
    import numpy as np

    from rayverb_tpu.config.schema import parse_config
    from rayverb_tpu.parallel.datagen import render_irs_batched
    from rayverb_tpu.utils.directions import random_directions

    cfg = parse_config(
        json.dumps(
            {
                "rays": rays,
                "reflections": reflections,
                "sample_rate": 16000,
                "bit_depth": 16,
                "source_position": [0, 0, 0],  # overridden per pair
                "mic_position": [0, 0, 0],
                "attenuation_model": {
                    "hrtf": {"facing": [0, 0, 1], "up": [0, 1, 0]}
                },
                "trim_tail": False,
            }
        )
    )
    rng = np.random.default_rng(17)
    lo, hi = np.asarray(scene.bounds)
    span = hi - lo
    sources = (lo + span * (0.2 + 0.6 * rng.random((pairs, 3)))).astype(
        np.float32
    )
    mics = (lo + span * (0.2 + 0.6 * rng.random((pairs, 3)))).astype(
        np.float32
    )
    dirs = np.stack(
        [random_directions(rays, seed=100 + i) for i in range(pairs)]
    )
    irs, _ = render_irs_batched(scene, cfg, sources, mics, dirs)  # compile
    np.asarray(irs)
    wall = float("inf")
    for _ in range(STEADY_RUNS):
        t0 = time.perf_counter()
        irs, _ = render_irs_batched(scene, cfg, sources, mics, dirs)
        np.asarray(irs)
        wall = min(wall, time.perf_counter() - t0)
    return pairs / wall


def main():
    sys.path.insert(0, REPO)
    from rayverb_tpu import load_config, load_scene
    from rayverb_tpu.runtime import retry_reexec_fail

    _start_watchdog()
    try:
        # --- chip/tunnel health control (must come first: if this is low,
        # every wall below is suspect — see docs/perf.md hygiene note) ---
        health_tflops = _chip_health()
        _progress(health_matmul_tflops=round(health_tflops, 1))

        # --- continuity workload: the reference's headline vault render,
        # both binning modes (sorted = default; scatter = r3 semantics
        # anchor) so a regression in either is visible in the artifact ---
        vault_cfg = load_config(os.path.join(REPO, "assets/configs/vault.json"))
        vault_scene = load_scene(
            os.path.join(REPO, "assets/test_models/vault.obj"),
            os.path.join(REPO, "assets/materials/vault.json"),
        )
        vault_bounces, vault_wall, _ = run(
            vault_cfg, vault_scene, ray_chunk=4096, bin_mode="sorted"
        )
        _progress(
            vault_wall_s=round(vault_wall, 3),
            vault_ray_bounces_per_s=round(vault_bounces / vault_wall, 1),
        )
        _, vault_wall_scatter, _ = run(
            vault_cfg, vault_scene, ray_chunk=4096, bin_mode="scatter"
        )
        _progress(vault_wall_s_scatter=round(vault_wall_scatter, 3))

        # --- north-star workload: 1M rays x 16 bounces, 100k-tri hall ---
        ns_cfg = _north_star_config()
        ns_scene = load_scene(_hall_path(), os.path.join(REPO, "assets/materials/mat.json"))
        ns_bounces, ns_wall, ns_info = run(
            ns_cfg,
            ns_scene,
            ray_chunk=int(os.environ.get("RAYVERB_BENCH_CHUNK", 262144)),
            stats=True,
        )
        _progress(
            north_star_wall_s=round(ns_wall, 3),
            value=round(ns_bounces / ns_wall, 1),
            vs_baseline=round(
                ns_bounces / ns_wall / BASELINE_RAY_BOUNCES_PER_S, 2
            ),
        )

        # --- issued vs executed (post-cull) pair tests: single-pass probe
        # at 64k rays with the kernel's surviving-work counters on ---
        import dataclasses

        os.environ["RAYVERB_SWEEP_STATS"] = "1"
        probe_cfg = dataclasses.replace(ns_cfg, rays=65536)
        _, _, probe_info = run(probe_cfg, ns_scene, ray_chunk=4096, stats=True)
        del os.environ["RAYVERB_SWEEP_STATS"]

        # --- batched IR datagen (BASELINE config 5): 64 source/receiver
        # pairs through the vault in ONE fused multi-pair program ---
        datagen_pairs_per_s = _bench_datagen(vault_scene)
    except Exception as e:  # pragma: no cover - transient backend failures
        # every program compiled before the failure is in the persistent
        # cache; a fresh process picks up where this one died
        print(f"bench failed ({e}); retrying via re-exec", file=sys.stderr)
        retry_reexec_fail(max_attempts=4)
        raise

    value = ns_bounces / ns_wall
    vault_value = vault_bounces / vault_wall
    _emit(
            {
                "metric": (
                    "ray-bounces/sec/chip (north star: 1M rays x 16 refl, "
                    f"100k-tri hall, stereo HRTF LR IR, steady-state wall {ns_wall:.2f}s; "
                    f"vault 50k x 128: {vault_value:.3g} rb/s, wall {vault_wall:.2f}s)"
                ),
                "value": round(value, 1),
                "unit": "ray-bounces/s",
                "vs_baseline": round(value / BASELINE_RAY_BOUNCES_PER_S, 2),
                "north_star_wall_s": round(ns_wall, 3),
                "vault_ray_bounces_per_s": round(vault_value, 1),
                "vault_wall_s": round(vault_wall, 3),
                "vault_wall_s_scatter": round(vault_wall_scatter, 3),
                # chip/tunnel health control (program-independent): steady
                # chained-matmul TFLOP/s; healthy v5e+tunnel ~150+, peak 197
                "health_matmul_tflops": round(health_tflops, 1),
                "north_star_pair_tests_issued": ns_info.get(
                    "pair_tests_issued"
                ),
                "north_star_pair_tests_issued_per_s": round(
                    ns_info.get("pair_tests_per_s", 0.0), 1
                ),
                # post-cull work observability (64k-ray single-pass probe,
                # same hall): issued vs kernel-executed pair tests and the
                # executed fraction — how much the admission gates + AABB
                # cull shrink the brute-force sweep
                "probe_pair_tests_issued": probe_info.get("pair_tests_issued"),
                "probe_pair_tests_executed": round(
                    probe_info.get("pair_tests_executed_total", 0.0)
                ),
                "probe_executed_fraction": round(
                    probe_info.get("pair_tests_executed_total", 0.0)
                    / max(probe_info.get("pair_tests_issued", 1), 1),
                    4,
                ),
                "probe_executed_by_kind": {
                    k: round(v)
                    for k, v in probe_info.get(
                        "pair_tests_executed", {}
                    ).items()
                },
                # BASELINE config 5: fused multi-pair datagen through the
                # vault (64 pairs x 4096 rays x 16 refl, stereo HRTF)
                "datagen_pairs_per_s": round(datagen_pairs_per_s, 2),
            }
    )


if __name__ == "__main__":
    main()
