"""Scene loading / compiling tests (reference scene loader semantics,
rayverb/rayverb.cpp:296-507)."""

import numpy as np
import pytest

from rayverb_tpu import (
    SceneError,
    compile_scene,
    load_materials,
    load_obj,
    load_scene,
    parse_materials,
)
from rayverb_tpu.scene.materials import DEFAULT_DIFFUSE, DEFAULT_SPECULAR, MaterialError
from rayverb_tpu.scene.objloader import RawMesh


def test_load_large_square(assets_dir):
    mesh = load_obj(str(assets_dir / "test_models" / "large_square.obj"))
    # 6 quads fan-triangulated -> 12 triangles
    assert mesh.num_triangles == 12
    assert mesh.vertices.shape == (8, 3)
    assert set(mesh.face_materials) == {"FrontColor"}


def test_scene_bounds(large_square_scene):
    lo, hi = large_square_scene.bounds
    np.testing.assert_allclose(lo, [-27, 0, -27], atol=1e-5)
    np.testing.assert_allclose(hi, [27, 27, 27], atol=1e-5)
    assert large_square_scene.inside([0, 2, 0])
    assert not large_square_scene.inside([0, -1, 0])


def test_material_matching(assets_dir):
    scene = load_scene(
        str(assets_dir / "test_models" / "large_square.obj"),
        str(assets_dir / "materials" / "mat.json"),
    )
    surf = load_materials(str(assets_dir / "materials" / "mat.json"))
    # 'FrontColor' IS in mat.json -> all triangles use its (non-zero) row
    row = surf.index_of("FrontColor")
    assert row > 0
    assert np.all(scene.tri_surface[: scene.num_triangles] == row)
    np.testing.assert_allclose(
        scene.specular[row],
        np.float32([0.99, 0.99, 0.99, 0.98, 0.98, 0.96, 0.96, 0.96]),
    )
    # default surface still sits at row 0 (rayverb.cpp:336-341)
    np.testing.assert_allclose(scene.specular[0], DEFAULT_SPECULAR)
    np.testing.assert_allclose(scene.diffuse[0], DEFAULT_DIFFUSE)


def test_material_unmatched_default():
    mesh = RawMesh(
        vertices=np.eye(3, dtype=np.float32),
        faces=np.array([[0, 1, 2]]),
        face_materials=["not_in_json"],
    )
    surf = parse_materials(
        '{"m": {"specular": [1,1,1,1,1,1,1,1],'
        '       "diffuse":  [0,0,0,0,0,0,0,0]}}'
    )
    scene = compile_scene(mesh, surf)
    assert scene.tri_surface[0] == 0


def test_materials_sorted_order():
    surf = parse_materials(
        '{"zzz": {"specular": [0.5,0.5,0.5,0.5,0.5,0.5,0.5,0.5],'
        '         "diffuse":  [0.1,0.1,0.1,0.1,0.1,0.1,0.1,0.1]},'
        ' "aaa": {"specular": [0.2,0.2,0.2,0.2,0.2,0.2,0.2,0.2],'
        '         "diffuse":  [0.3,0.3,0.3,0.3,0.3,0.3,0.3,0.3]}}'
    )
    # default at 0, then sorted names (std::map order, rayverb.cpp:348-354)
    assert surf.names == ("aaa", "zzz")
    assert surf.index_of("aaa") == 1
    assert surf.index_of("zzz") == 2
    assert surf.index_of("missing") == 0
    assert surf.specular[1][0] == np.float32(0.2)


def test_materials_validation():
    with pytest.raises(MaterialError):
        parse_materials("[1, 2, 3]")
    with pytest.raises(MaterialError):
        parse_materials('{"m": {"specular": [1,1,1]}}')
    with pytest.raises(MaterialError):
        parse_materials('{"m": {"specular": [1,1,1,1,1,1,1,1]}}')  # no diffuse


def test_invalid_surface_coefficients():
    mesh = RawMesh(
        vertices=np.eye(3, dtype=np.float32),
        faces=np.array([[0, 1, 2]]),
        face_materials=["m"],
    )
    bad = parse_materials(
        '{"m": {"specular": [2,0,0,0,0,0,0,0],'
        '       "diffuse":  [0,0,0,0,0,0,0,0]}}'
    )
    with pytest.raises(SceneError):
        compile_scene(mesh, bad)
    # out-of-range only past band 3 is tolerated (rayverb.cpp:467-474 quirk)
    quirky = parse_materials(
        '{"m": {"specular": [1,1,1,9,9,9,9,9],'
        '       "diffuse":  [0,0,0,0,0,0,0,0]}}'
    )
    compile_scene(mesh, quirky)


def test_padding_is_degenerate(assets_dir):
    scene = load_scene(
        str(assets_dir / "test_models" / "large_square.obj"),
        str(assets_dir / "materials" / "mat.json"),
    )
    assert scene.padded_triangles % 8 == 0
    pad = scene.tri_verts[scene.num_triangles :]
    assert np.all(pad == 0)


def test_all_demo_models_load(assets_dir):
    import glob
    import os

    count = 0
    for path in sorted(glob.glob(str(assets_dir / "test_models" / "*.obj"))):
        mesh = load_obj(path)
        assert mesh.num_triangles > 0, os.path.basename(path)
        count += 1
    assert count >= 18  # every .obj in the demo corpus
