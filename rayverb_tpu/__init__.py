"""rayverb_tpu — a TPU-native acoustic raytracing framework.

A from-scratch rebuild of the capabilities of reuk/parallel-reverb-raytracer
("rayverb") designed for JAX/XLA/Pallas on TPU: the OpenCL trace kernel
becomes batched closest-hit sweeps driven by a fixed-depth lax.scan, the
attenuation kernels become jitted vmaps, the FFTW filter bank becomes
jnp.fft / lax.scan IIR, and rays shard across a jax device mesh.
"""

from .constants import (
    NUM_BANDS,
    NUM_IMAGE_SOURCE,
    SPEED_OF_SOUND,
)
from .config.schema import (
    AttenuationModel,
    ConfigError,
    FilterType,
    HrtfConfig,
    OutputMode,
    RenderConfig,
    Speaker,
    load_config,
    parse_config,
)
from .scene.compile import Scene, SceneError, compile_scene, load_scene
from .scene.materials import SurfaceSet, load_materials, parse_materials
from .scene.objloader import RawMesh, load_mesh, load_obj

__version__ = "0.1.0"

__all__ = [
    "NUM_BANDS",
    "NUM_IMAGE_SOURCE",
    "SPEED_OF_SOUND",
    "AttenuationModel",
    "ConfigError",
    "FilterType",
    "HrtfConfig",
    "OutputMode",
    "RenderConfig",
    "Speaker",
    "load_config",
    "parse_config",
    "Scene",
    "SceneError",
    "compile_scene",
    "load_scene",
    "SurfaceSet",
    "load_materials",
    "parse_materials",
    "RawMesh",
    "load_mesh",
    "load_obj",
    "__version__",
]
