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


def test_dxf_loader_synthetic(tmp_path):
    """3DFACE quads triangulate to the Assimp fan order; the entity layer
    becomes the face material name (dxfloader.py; reference imports DXF via
    Assimp, rayverb.cpp:447-461)."""
    from rayverb_tpu.scene.dxfloader import load_dxf

    pairs = [
        ("0", "SECTION"), ("2", "ENTITIES"),
        ("0", "3DFACE"), ("8", "wall"),
        ("10", "0"), ("20", "0"), ("30", "0"),
        ("11", "1"), ("21", "0"), ("31", "0"),
        ("12", "1"), ("22", "1"), ("32", "0"),
        ("13", "0"), ("23", "1"), ("33", "0"),   # quad -> 2 tris
        ("0", "3DFACE"), ("8", "floor"),
        ("10", "0"), ("20", "0"), ("30", "5"),
        ("11", "1"), ("21", "0"), ("31", "5"),
        ("12", "1"), ("22", "1"), ("32", "5"),
        ("13", "1"), ("23", "1"), ("33", "5"),   # corner4==corner3 -> tri
        ("0", "ENDSEC"),
    ]
    p = tmp_path / "t.dxf"
    p.write_text("\n".join(x for pair in pairs for x in pair) + "\n")
    mesh = load_dxf(str(p))
    assert mesh.faces.shape[0] == 3
    assert mesh.face_materials == ["wall", "wall", "floor"]
    np.testing.assert_allclose(mesh.vertices[mesh.faces[1]],
                               [[0, 0, 0], [1, 1, 0], [0, 1, 0]])


def test_dxf_rooms_load(assets_dir):
    """The reference's three DXF demo rooms import end to end."""
    from rayverb_tpu import load_scene

    scene = load_scene(
        str(assets_dir / "test_models" / "room3.dxf"),
        str(assets_dir / "materials" / "mat.json"),
    )
    # 876 real triangles (+ scene-compile padding rows)
    assert 876 <= scene.v0.shape[0] <= 896


def _write_binary_stl(path, tris):
    import struct

    tris = np.asarray(tris, np.float32)
    with open(path, "wb") as fh:
        fh.write(b"\0" * 80)
        fh.write(struct.pack("<I", len(tris)))
        for t in tris:
            fh.write(struct.pack("<3f", 0, 0, 0))  # normal (ignored)
            for v in t:
                fh.write(struct.pack("<3f", *v))
            fh.write(struct.pack("<H", 0))


def test_stl_binary_and_ascii(tmp_path):
    """STL (both encodings) loads as a soup bound to the default surface
    (the reference imports STL via Assimp, rayverb.cpp:447-461; STL has no
    material names, so faces land on surface row 0 like any unmatched
    material, rayverb.cpp:336-341)."""
    from rayverb_tpu.scene.stlply import load_stl

    tris = [
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
        [[0, 0, 1], [1, 0, 1], [0, 1, 1]],
    ]
    b = tmp_path / "m.stl"
    _write_binary_stl(b, tris)
    mesh = load_stl(str(b))
    assert mesh.num_triangles == 2
    np.testing.assert_allclose(mesh.vertices[mesh.faces[0]], tris[0])
    assert mesh.face_materials == ["", ""]

    a = tmp_path / "ma.stl"
    lines = ["solid synthetic"]
    for t in tris:
        lines += ["facet normal 0 0 0", "outer loop"]
        lines += [f"vertex {v[0]} {v[1]} {v[2]}" for v in t]
        lines += ["endloop", "endfacet"]
    lines.append("endsolid synthetic")
    a.write_text("\n".join(lines) + "\n")
    mesh2 = load_stl(str(a))
    assert mesh2.num_triangles == 2
    np.testing.assert_allclose(
        mesh2.vertices[mesh2.faces], mesh.vertices[mesh.faces]
    )


def test_ply_ascii_and_binary(tmp_path):
    """PLY quads fan-triangulate like Assimp's aiProcess_Triangulate; extra
    vertex properties and leading scalar face properties are skipped."""
    from rayverb_tpu.scene.stlply import load_ply

    verts = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]
    a = tmp_path / "m.ply"
    a.write_text(
        "ply\nformat ascii 1.0\ncomment synthetic\n"
        "element vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\n"
        "element face 1\n"
        "property uchar flags\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
        + "".join(f"{x} {y} {z} 255\n" for x, y, z in verts)
        + "7 4 0 1 2 3\n"
    )
    mesh = load_ply(str(a))
    assert mesh.num_triangles == 2  # quad -> 2 tris
    np.testing.assert_allclose(
        mesh.vertices[mesh.faces[0]], [verts[0], verts[1], verts[2]]
    )
    np.testing.assert_allclose(
        mesh.vertices[mesh.faces[1]], [verts[0], verts[2], verts[3]]
    )
    assert mesh.face_materials == ["", ""]

    import struct

    b = tmp_path / "mb.ply"
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        "element vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\n"
        "element face 1\n"
        "property uchar flags\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    )
    body = b"".join(
        struct.pack("<3fB", float(x), float(y), float(z), 255)
        for x, y, z in verts
    ) + struct.pack("<BB4i", 7, 4, 0, 1, 2, 3)
    b.write_bytes(header.encode("ascii") + body)
    mesh2 = load_ply(str(b))
    assert mesh2.num_triangles == 2
    np.testing.assert_allclose(
        mesh2.vertices[mesh2.faces], mesh.vertices[mesh.faces]
    )


def test_stl_scene_renders_end_to_end(tmp_path, assets_dir):
    """An STL copy of large_square renders the same first bounce as the
    OBJ original (format parity through the whole stack)."""
    from rayverb_tpu import load_obj
    from rayverb_tpu.ops.intersect import closest_hit_xla, soup_from_scene
    import jax.numpy as jnp

    src = load_obj(str(assets_dir / "test_models" / "large_square.obj"))
    p = tmp_path / "sq.stl"
    _write_binary_stl(p, src.vertices[src.faces])
    scene = load_scene(
        str(p), str(assets_dir / "materials" / "mat.json")
    )
    ref = load_scene(
        str(assets_dir / "test_models" / "large_square.obj"),
        str(assets_dir / "materials" / "mat.json"),
    )
    assert scene.num_triangles == ref.num_triangles
    o = jnp.zeros((4, 3), jnp.float32) + jnp.asarray([0.0, 2.0, 0.0])
    d = jnp.asarray(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32
    )
    h1 = closest_hit_xla(o, d, soup_from_scene(scene))
    h2 = closest_hit_xla(o, d, soup_from_scene(ref))
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(h1.hit), np.asarray(h2.hit))


def _glb_bytes(doc: dict, bin_chunk: bytes) -> bytes:
    """Pack a glTF 2.0 GLB container (JSON + BIN chunks, 4-byte aligned)."""
    import json as _json
    import struct

    j = _json.dumps(doc).encode("utf-8")
    j += b" " * ((4 - len(j) % 4) % 4)
    b = bin_chunk + b"\0" * ((4 - len(bin_chunk) % 4) % 4)
    total = 12 + 8 + len(j) + 8 + len(b)
    return (
        b"glTF"
        + struct.pack("<II", 2, total)
        + struct.pack("<II", len(j), 0x4E4F534A)
        + j
        + struct.pack("<II", len(b), 0x004E4942)
        + b
    )


def test_glb_indexed_triangles_with_transform(tmp_path):
    """GLB: u16-indexed TRIANGLES under a translated+rotated node; the
    primitive's material name flows into face_materials (-> material JSON
    matching downstream, like Assimp's named meshes in the reference)."""
    import struct

    from rayverb_tpu.scene.gltf import load_gltf

    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    bin_chunk = verts.tobytes() + idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        # 90 deg about +z then translate: (1,0,0) -> (0,1,0) -> +(5,0,0)
        "nodes": [
            {
                "mesh": 0,
                "translation": [5.0, 0.0, 0.0],
                "rotation": [0.0, 0.0, 0.7071067811865476, 0.7071067811865476],
            }
        ],
        "materials": [{"name": "brick"}],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0},
                        "indices": 1,
                        "material": 0,
                    }
                ]
            }
        ],
        "buffers": [{"byteLength": len(bin_chunk)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 12},
        ],
        "accessors": [
            {
                "bufferView": 0,
                "componentType": 5126,
                "count": 4,
                "type": "VEC3",
            },
            {
                "bufferView": 1,
                "componentType": 5123,
                "count": 6,
                "type": "SCALAR",
            },
        ],
    }
    p = tmp_path / "m.glb"
    p.write_bytes(_glb_bytes(doc, bin_chunk))
    mesh = load_gltf(str(p))
    assert mesh.num_triangles == 2
    assert mesh.face_materials == ["brick", "brick"]
    np.testing.assert_allclose(
        mesh.vertices[mesh.faces[0]],
        [[5, 0, 0], [5, 1, 0], [4, 1, 0]],
        atol=1e-6,
    )


def test_gltf_data_uri_strip_and_fan(tmp_path):
    """.gltf with a base64 data: buffer; TRIANGLE_STRIP keeps consistent
    winding (odd triangles swap) and TRIANGLE_FAN pivots on vertex 0."""
    import base64
    import json as _json

    from rayverb_tpu.scene.gltf import load_gltf

    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
    )
    blob = verts.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [{"mesh": 0}, {"mesh": 1}],
        "meshes": [
            {"primitives": [{"attributes": {"POSITION": 0}, "mode": 5}]},
            {"primitives": [{"attributes": {"POSITION": 0}, "mode": 6}]},
        ],
        "buffers": [
            {
                "byteLength": len(blob),
                "uri": "data:application/octet-stream;base64,"
                + base64.b64encode(blob).decode("ascii"),
            }
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(blob)}
        ],
        "accessors": [
            {
                "bufferView": 0,
                "componentType": 5126,
                "count": 4,
                "type": "VEC3",
            }
        ],
    }
    p = tmp_path / "m.gltf"
    p.write_text(_json.dumps(doc))
    mesh = load_gltf(str(p))
    assert mesh.num_triangles == 4  # 2 strip + 2 fan
    # strip: (0,1,2) then (2,1,3) — odd triangle swaps first two
    np.testing.assert_allclose(
        mesh.vertices[mesh.faces[1]], verts[[2, 1, 3]], atol=1e-6
    )
    # fan: (0,1,2), (0,2,3)
    np.testing.assert_allclose(
        mesh.vertices[mesh.faces[3]], verts[[0, 2, 3]], atol=1e-6
    )


def test_off_loader(tmp_path):
    from rayverb_tpu.scene.gltf import load_off

    p = tmp_path / "m.off"
    p.write_text(
        "OFF\n# synthetic\n4 1 4\n"
        "0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
        "4 0 1 2 3\n"
    )
    mesh = load_off(str(p))
    assert mesh.num_triangles == 2
    np.testing.assert_allclose(
        mesh.vertices[mesh.faces[1]], [[0, 0, 0], [1, 1, 0], [0, 1, 0]]
    )
    assert mesh.face_materials == ["", ""]


def test_load_mesh_dispatch_gltf_off(tmp_path, assets_dir):
    """load_scene accepts .glb end to end (scene compile + material
    matching on the primitive's material name)."""
    from rayverb_tpu import load_obj
    from rayverb_tpu.scene.objloader import load_mesh

    src = load_obj(str(assets_dir / "test_models" / "large_square.obj"))
    tri_verts = src.vertices[src.faces].astype(np.float32)
    flat = tri_verts.reshape(-1, 3)
    doc = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
        "buffers": [{"byteLength": flat.nbytes}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": flat.nbytes}
        ],
        "accessors": [
            {
                "bufferView": 0,
                "componentType": 5126,
                "count": len(flat),
                "type": "VEC3",
            }
        ],
    }
    p = tmp_path / "sq.glb"
    p.write_bytes(_glb_bytes(doc, flat.tobytes()))
    mesh = load_mesh(str(p))
    assert mesh.num_triangles == src.num_triangles
    scene = load_scene(str(p), str(assets_dir / "materials" / "mat.json"))
    assert scene.num_triangles == src.num_triangles
