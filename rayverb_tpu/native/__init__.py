"""Native (C++) runtime components and their ctypes bindings.

Where the reference leans on native libraries for its host runtime (Assimp
mesh import, rayverb.cpp:447-461; libsndfile audio I/O, cmd/main.cpp:26-48),
this package provides compiled C++ equivalents with pure-Python fallbacks:
the Python implementations define the semantics, the native ones make large
inputs fast. The library is built on demand with g++ and cached next to
this file.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "librayverb_native.so")
_HASH_PATH = _LIB_PATH + ".hash"
_SOURCES = [os.path.join(_HERE, "objparse.cpp")]

_lock = threading.Lock()
_lib = None
_build_failed = False


def _source_hash() -> str:
    h = hashlib.sha256()
    for s in _SOURCES:
        with open(s, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def _build(src_hash: str) -> bool:
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-o",
        _LIB_PATH,
    ] + _SOURCES
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        # record the source hash the binary was built from: git checkouts do
        # not preserve mtimes, so staleness is detected by content, not time
        with open(_HASH_PATH, "w") as f:
            f.write(src_hash)
        return True
    except Exception as e:  # pragma: no cover - toolchain-dependent
        print(f"rayverb_tpu: native build failed ({e}); using Python "
              "fallbacks", file=sys.stderr)
        return False


class _ObjMesh(ctypes.Structure):
    _fields_ = [
        ("vertices", ctypes.POINTER(ctypes.c_float)),
        ("nvertices", ctypes.c_longlong),
        ("faces", ctypes.POINTER(ctypes.c_longlong)),
        ("face_material", ctypes.POINTER(ctypes.c_int)),
        ("nfaces", ctypes.c_longlong),
        ("material_names", ctypes.POINTER(ctypes.c_char)),
        ("names_bytes", ctypes.c_longlong),
        ("nmaterials", ctypes.c_int),
        ("error", ctypes.c_char * 256),
    ]


def get_lib():
    """Load (building if necessary) the native library, or None."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        src_hash = _source_hash()
        built_hash = None
        if os.path.exists(_HASH_PATH):
            with open(_HASH_PATH) as f:
                built_hash = f.read().strip()
        if not os.path.exists(_LIB_PATH) or built_hash != src_hash:
            if not _build(src_hash):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:  # pragma: no cover
            print(f"rayverb_tpu: failed to load native lib ({e})", file=sys.stderr)
            _build_failed = True
            return None
        lib.rayverb_load_obj.restype = ctypes.POINTER(_ObjMesh)
        lib.rayverb_load_obj.argtypes = [ctypes.c_char_p]
        lib.rayverb_free_obj.restype = None
        lib.rayverb_free_obj.argtypes = [ctypes.POINTER(_ObjMesh)]
        _lib = lib
        return _lib


def load_obj_native(path: str):
    """Parse an OBJ with the native importer. Returns a
    scene.objloader.RawMesh, or None when the library is unavailable.
    Raises ValueError on malformed files (same messages as the Python
    loader)."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    handle = lib.rayverb_load_obj(path.encode())
    if not handle:
        raise MemoryError("native OBJ importer allocation failed")
    try:
        mesh = handle.contents
        err = bytes(mesh.error).split(b"\0", 1)[0].decode()
        if err:
            if "cannot open" in err:
                raise FileNotFoundError(f"{path}: {err}")
            raise ValueError(f"OBJ file {path!r}: {err}")
        nv = int(mesh.nvertices)
        nf = int(mesh.nfaces)
        vertices = np.ctypeslib.as_array(mesh.vertices, shape=(nv, 3)).copy()
        faces = np.ctypeslib.as_array(mesh.faces, shape=(nf, 3)).copy()
        mats = np.ctypeslib.as_array(mesh.face_material, shape=(nf,)).copy()
        blob = ctypes.string_at(mesh.material_names, mesh.names_bytes)
        # same lenient decoding as the Python loader's errors="replace"
        names = blob.decode(errors="replace").split("\0")[: mesh.nmaterials]
        face_materials = ["" if m < 0 else names[m] for m in mats]
    finally:
        lib.rayverb_free_obj(handle)

    from ..scene.objloader import RawMesh

    return RawMesh(
        vertices=vertices.astype(np.float32),
        faces=faces.astype(np.int64),
        face_materials=face_materials,
    )
