"""Test harness: force the JAX CPU backend with 8 virtual devices so the
multi-chip sharding path is exercised without TPU hardware."""

import os

# Force the CPU backend with 8 virtual devices. The machine's site config
# pins JAX to the TPU platform via environment; jax.config wins over it.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8

import pathlib

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
ASSETS = REPO / "assets"


@pytest.fixture(scope="session")
def assets_dir():
    return ASSETS


@pytest.fixture(scope="session")
def large_square_scene():
    from rayverb_tpu import load_scene

    return load_scene(
        str(ASSETS / "test_models" / "large_square.obj"),
        str(ASSETS / "materials" / "mat.json"),
    )


@pytest.fixture(scope="session")
def large_square_soup(large_square_scene):
    from rayverb_tpu.ops.intersect import soup_from_scene

    return soup_from_scene(large_square_scene)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
