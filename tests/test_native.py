"""Native C++ OBJ importer vs the Python reference implementation."""

import glob
import os

import numpy as np
import pytest

from rayverb_tpu.native import get_lib, load_obj_native
from rayverb_tpu.scene.objloader import load_obj_python

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable (no g++?)"
)


def test_equivalent_on_demo_corpus(assets_dir):
    paths = sorted(glob.glob(str(assets_dir / "test_models" / "*.obj")))
    assert paths
    for path in paths:
        py = load_obj_python(path)
        nat = load_obj_native(path)
        np.testing.assert_array_equal(nat.vertices, py.vertices, err_msg=path)
        np.testing.assert_array_equal(nat.faces, py.faces, err_msg=path)
        assert nat.face_materials == py.face_materials, path


def test_negative_indices(tmp_path):
    p = tmp_path / "neg.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "usemtl m1\n"
        "f -4 -3 -2 -1\n"
    )
    py = load_obj_python(str(p))
    nat = load_obj_native(str(p))
    np.testing.assert_array_equal(nat.faces, py.faces)
    assert nat.face_materials == py.face_materials == ["m1", "m1"]


def test_error_cases(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_obj_native(str(tmp_path / "missing.obj"))
    p = tmp_path / "empty.obj"
    p.write_text("# nothing\n")
    with pytest.raises(ValueError):
        load_obj_native(str(p))


def test_dispatch_uses_native(assets_dir, monkeypatch):
    from rayverb_tpu.scene import objloader

    path = str(assets_dir / "test_models" / "large_square.obj")
    assert objloader.load_obj(path).num_triangles == 12
    monkeypatch.setenv("RAYVERB_NO_NATIVE", "1")
    assert objloader.load_obj(path).num_triangles == 12
