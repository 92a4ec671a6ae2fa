"""Scene loader tests: OBJ/MTL, PLY (ascii+binary), PBRT, Mitsuba XML."""
import struct
import textwrap

import numpy as np
import pytest

from rustlight_tpu.scene.loaders import load_scene
from rustlight_tpu.scene.loaders.obj import load_obj
from rustlight_tpu.scene.loaders.ply import load_ply
from rustlight_tpu.integrators import IntegratorPathTracing, render


def test_obj_with_mtl(tmp_path):
    (tmp_path / "box.mtl").write_text(textwrap.dedent("""\
        newmtl red
        Kd 0.8 0.1 0.1
        newmtl lamp
        Kd 0 0 0
        Ke 5 5 5
    """))
    (tmp_path / "box.obj").write_text(textwrap.dedent("""\
        mtllib box.mtl
        v 0 0 0
        v 1 0 0
        v 1 1 0
        v 0 1 0
        vn 0 0 1
        vt 0 0
        vt 1 0
        vt 1 1
        vt 0 1
        usemtl red
        f 1/1/1 2/2/1 3/3/1 4/4/1
        usemtl lamp
        f 1/1/1 3/3/1 2/2/1
    """))
    meshes, mats, tex = load_obj(tmp_path / "box.obj")
    assert len(meshes) == 2
    red = next(m for m in meshes if "red" in m.name)
    lamp = next(m for m in meshes if "lamp" in m.name)
    assert red.n_triangles == 2   # quad fan
    assert lamp.is_light
    np.testing.assert_allclose(mats[red.material - 0].kd, (0.8, 0.1, 0.1))
    assert red.uvs is not None and red.normals is not None


def test_ply_ascii(tmp_path):
    (tmp_path / "t.ply").write_text(textwrap.dedent("""\
        ply
        format ascii 1.0
        element vertex 3
        property float x
        property float y
        property float z
        element face 1
        property list uchar int vertex_indices
        end_header
        0 0 0
        1 0 0
        0 1 0
        3 0 1 2
    """))
    m = load_ply(tmp_path / "t.ply")
    assert m.n_triangles == 1
    np.testing.assert_allclose(m.triangle_areas(), [0.5])


def test_ply_binary(tmp_path):
    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element vertex 4\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"element face 2\n"
              b"property list uchar int vertex_indices\nend_header\n")
    verts = struct.pack("<12f", 0, 0, 0, 1, 0, 0, 1, 1, 0, 0, 1, 0)
    faces = struct.pack("<B3i", 3, 0, 1, 2) + struct.pack("<B3i", 3, 0, 2, 3)
    (tmp_path / "q.ply").write_bytes(header + verts + faces)
    m = load_ply(tmp_path / "q.ply")
    assert m.n_triangles == 2
    np.testing.assert_allclose(m.total_area(), 1.0)


def test_pbrt_scene(tmp_path):
    (tmp_path / "s.pbrt").write_text(textwrap.dedent("""\
        LookAt 0 1 -4  0 1 0  0 1 0
        Camera "perspective" "float fov" [45]
        Film "image" "integer xresolution" [32] "integer yresolution" [32]
        WorldBegin
        AttributeBegin
          AreaLightSource "diffuse" "rgb L" [10 10 10]
          Shape "trianglemesh"
            "point P" [-0.5 1.9 -0.5  0.5 1.9 -0.5  0.5 1.9 0.5  -0.5 1.9 0.5]
            "integer indices" [0 1 2 0 2 3]
        AttributeEnd
        Material "matte" "rgb Kd" [0.7 0.7 0.7]
        Shape "trianglemesh"
          "point P" [-5 0 -5  5 0 -5  5 0 5  -5 0 5]
          "integer indices" [0 1 2 0 2 3]
        WorldEnd
    """))
    scene = load_scene(tmp_path / "s.pbrt")
    assert scene.camera.width == 32
    assert len(scene.meshes) == 2
    assert any(m.is_light for m in scene.meshes)
    sd = scene.compile()
    film = render(sd, IntegratorPathTracing(max_depth=3, hard_cap=3), spp=4)
    assert film["primal"].mean() > 0.0


def test_mitsuba_scene(tmp_path):
    (tmp_path / "s.xml").write_text(textwrap.dedent("""\
        <scene version="0.6.0">
          <sensor type="perspective">
            <float name="fov" value="45"/>
            <string name="fovAxis" value="x"/>
            <transform name="toWorld">
              <lookat origin="0, 1, -4" target="0, 1, 0" up="0, 1, 0"/>
            </transform>
            <film type="hdrfilm">
              <integer name="width" value="24"/>
              <integer name="height" value="24"/>
            </film>
          </sensor>
          <bsdf type="diffuse" id="white">
            <rgb name="reflectance" value="0.7, 0.7, 0.7"/>
          </bsdf>
          <shape type="rectangle">
            <transform name="toWorld">
              <rotate x="1" angle="-90"/>
              <scale value="5"/>
            </transform>
            <ref id="white"/>
          </shape>
          <shape type="sphere">
            <point name="center" x="0" y="1.8" z="0"/>
            <float name="radius" value="0.2"/>
            <ref id="white"/>
            <emitter type="area">
              <rgb name="radiance" value="8, 8, 8"/>
            </emitter>
          </shape>
        </scene>
    """))
    scene = load_scene(tmp_path / "s.xml")
    assert scene.camera.width == 24
    assert any(m.is_light for m in scene.meshes)
    sd = scene.compile()
    film = render(sd, IntegratorPathTracing(max_depth=3, hard_cap=3), spp=4)
    assert film["primal"].mean() > 0.0


def test_pbrt_object_instances(tmp_path):
    """ObjectBegin/ObjectInstance prototypes stamped at multiple transforms
    (reference scene_loader.rs:185-199). Real pbrt-v3 scenes (staircase
    class) depend on this."""
    (tmp_path / "s.pbrt").write_text(textwrap.dedent("""\
        Film "image" "integer xresolution" [16] "integer yresolution" [16]
        WorldBegin
        Material "matte" "rgb Kd" [0.6 0.2 0.2]
        ObjectBegin "post"
          Shape "trianglemesh"
            "point P" [-0.1 0 -0.1  0.1 0 -0.1  0.1 1 -0.1  -0.1 1 -0.1]
            "integer indices" [0 1 2 0 2 3]
        ObjectEnd
        AttributeBegin
          Translate 2 0 0
          ObjectInstance "post"
        AttributeEnd
        AttributeBegin
          Translate -2 0 0
          Scale 1 2 1
          ObjectInstance "post"
        AttributeEnd
        ObjectInstance "post"
        WorldEnd
    """))
    sc = load_scene(tmp_path / "s.pbrt")
    # the prototype itself is NOT in the scene; 3 instances are
    assert len(sc.meshes) == 3
    xs = sorted(float(m.vertices[:, 0].mean()) for m in sc.meshes)
    assert abs(xs[0] + 2) < 1e-5 and abs(xs[1]) < 1e-5 and abs(xs[2] - 2) < 1e-5
    heights = sorted(float(m.vertices[:, 1].max()) for m in sc.meshes)
    assert abs(heights[-1] - 2.0) < 1e-5   # scaled instance


def test_mitsuba_serialized_shape(tmp_path):
    """<shape type="serialized"> with shapeIndex selection
    (reference scene_loader.rs:499-500)."""
    from rustlight_tpu.scene.geometry import make_quad, make_sphere
    from rustlight_tpu.scene.loaders.serialized import (load_serialized,
                                                        save_serialized)
    quad = make_quad((-1, 0, -1), (1, 0, -1), (1, 0, 1), (-1, 0, 1))
    sph = make_sphere((0, 1, 0), 0.5, n_theta=6, n_phi=6)
    save_serialized(tmp_path / "m.serialized", [quad, sph])

    # direct reader round-trip
    m0 = load_serialized(tmp_path / "m.serialized", 0)
    m1 = load_serialized(tmp_path / "m.serialized", 1)
    np.testing.assert_allclose(m0.vertices, quad.vertices)
    np.testing.assert_array_equal(m1.indices, sph.indices)

    (tmp_path / "s.xml").write_text(textwrap.dedent("""\
        <scene version="0.6.0">
          <shape type="serialized">
            <string name="filename" value="m.serialized"/>
            <integer name="shapeIndex" value="1"/>
            <transform name="toWorld"><translate x="3"/></transform>
            <emitter type="area"><rgb name="radiance" value="5,5,5"/></emitter>
          </shape>
        </scene>
    """))
    sc = load_scene(tmp_path / "s.xml")
    assert len(sc.meshes) == 1
    assert sc.meshes[0].is_light
    assert abs(float(sc.meshes[0].vertices[:, 0].mean()) - 3.0) < 0.05


class TestLoaderTextures:
    """Texture conversion on the diffuse slot (reference bsdf_pbrt /
    bsdf_mts texture handling, src/bsdfs/mod.rs:293-386, 498-612)."""

    def test_pbrt_imagemap_and_checker(self, tmp_path):
        from rustlight_tpu.utils import image as rimage
        from rustlight_tpu.bsdfs.table import TEX_BITMAP, TEX_CHECKER
        tex = np.zeros((8, 8, 3), np.float32)
        tex[:, :4] = (1, 0, 0)
        tex[:, 4:] = (0, 0, 1)
        rimage.save(str(tmp_path / "t.pfm"), tex)
        (tmp_path / "s.pbrt").write_text('''
Film "image" "integer xresolution" [16] "integer yresolution" [16]
WorldBegin
Texture "wood" "spectrum" "imagemap" "string filename" ["t.pfm"]
Texture "check" "spectrum" "checkerboard" "rgb tex1" [0.1 0.1 0.1] "rgb tex2" [0.9 0.9 0.9]
Material "matte" "texture Kd" ["wood"]
Shape "trianglemesh" "point P" [-2 0 0  2 0 0  2 2 0  -2 2 0] "integer indices" [0 1 2 0 2 3] "float uv" [0 0 1 0 1 1 0 1]
Material "matte" "texture Kd" ["check"]
Shape "trianglemesh" "point P" [-2 -2 1  2 -2 1  2 0 1  -2 0 1] "integer indices" [0 1 2 0 2 3] "float uv" [0 0 1 0 1 1 0 1]
WorldEnd
''')
        from rustlight_tpu.scene.loaders import load_scene
        sc = load_scene(str(tmp_path / "s.pbrt"))
        assert sc.textures is not None and sc.textures.shape[0] == 1
        kinds = {m.tex_kind for m in sc.materials}
        assert TEX_BITMAP in kinds and TEX_CHECKER in kinds

    def test_mitsuba_bitmap(self, tmp_path):
        from rustlight_tpu.utils import image as rimage
        from rustlight_tpu.bsdfs.table import TEX_BITMAP
        tex = np.full((4, 4, 3), 0.25, np.float32)
        rimage.save(str(tmp_path / "t.pfm"), tex)
        (tmp_path / "s.xml").write_text('''<scene version="0.6.0">
  <bsdf type="diffuse" id="mat">
    <texture type="bitmap" name="reflectance">
      <string name="filename" value="t.pfm"/>
    </texture>
  </bsdf>
  <shape type="rectangle"><ref id="mat"/></shape>
</scene>''')
        from rustlight_tpu.scene.loaders import load_scene
        sc = load_scene(str(tmp_path / "s.xml"))
        assert sc.textures is not None
        assert any(m.tex_kind == TEX_BITMAP for m in sc.materials)


class TestNativeObjParser:
    """C++ OBJ parser (native/obj_loader.cpp) must match the Python parser
    bit for bit (it is ~8x faster on multi-MB meshes; tobj analogue)."""

    def test_native_matches_python(self, tmp_path):
        import rustlight_tpu.scene.loaders.obj as O
        rng = np.random.RandomState(0)
        verts = rng.uniform(-1, 1, (300, 3))
        lines = ["mtllib m.mtl"]
        for v in verts:
            lines.append(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}")
        for v in verts[:150]:
            lines.append(f"vn {v[0]:.4f} {v[1]:.4f} {v[2]:.4f}")
        for v in verts[:100]:
            lines.append(f"vt {abs(v[0]):.4f} {abs(v[1]):.4f}")
        lines.append("usemtl red")
        for i in range(0, 290, 4):   # quads with v/t/n
            lines.append(f"f {i+1}/{i%100+1}/{i%150+1} {i+2}/{i%100+2}/{i%150+2} "
                         f"{i+3}/{i%100+3}/{i%150+3} {i+4}/{i%100+4}/{i%150+4}")
        lines.append("usemtl blue")
        for i in range(1, 60, 3):    # negative position-only indices
            lines.append(f"f {-i} {-(i+1)} {-(i+2)}")
        (tmp_path / "t.obj").write_text("\n".join(lines))
        (tmp_path / "m.mtl").write_text(
            "newmtl red\nKd 0.8 0.1 0.1\nnewmtl blue\nKd 0.1 0.1 0.8\n")

        flat_n = O._parse_obj_native(tmp_path / "t.obj")
        flat_p = O._parse_obj_py(tmp_path / "t.obj")
        if flat_n is None:
            pytest.skip("no native toolchain")
        for a, b in zip(flat_n, flat_p):
            if isinstance(a, np.ndarray):
                np.testing.assert_array_equal(a, b)
            else:
                assert a == b
        meshes, mats, _ = O.load_obj(str(tmp_path / "t.obj"))
        assert len(meshes) == 2 and len(mats) == 2


class TestExampleScenes:
    def test_pbrt_cbox_matches_procedural(self):
        """examples/cbox.pbrt (the file-based cbox the reference's README
        points at but no longer ships) must reproduce the procedural scene
        exactly."""
        from pathlib import Path
        from rustlight_tpu.scene.loaders import load_scene
        from rustlight_tpu.models import cornell_box
        from rustlight_tpu.integrators import IntegratorPathTracing, render
        root = Path(__file__).parent.parent
        sc_file = load_scene(str(root / "examples" / "cbox.pbrt"))
        sc_file.camera = sc_file.camera.replace(width=24, height=24)
        f1 = render(sc_file.compile(),
                    IntegratorPathTracing(max_depth=3, hard_cap=3),
                    spp=8, seed=0)["primal"]
        f2 = render(cornell_box(24, 24).compile(),
                    IntegratorPathTracing(max_depth=3, hard_cap=3),
                    spp=8, seed=0)["primal"]
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)


def test_envglass_example_loads():
    """examples/envglass.xml: textured envmap + dielectric/roughconductor/
    substrate spheres through the Mitsuba loader."""
    from pathlib import Path
    from rustlight_tpu.scene.loaders.mitsuba import load_mitsuba
    root = Path(__file__).parent.parent
    sc = load_mitsuba(root / "examples" / "envglass.xml")
    assert sc.env_image is not None and sc.env_image.shape[2] == 3
    assert len(sc.meshes) == 4        # floor + 3 spheres
    assert sc.camera.width == 512 and sc.camera.height == 384
    sd = sc.compile()
    assert sd.geom.n_tris > 4         # tessellated spheres


def test_serialized_legacy_u32_footer(tmp_path):
    """Old (pre-0.4) .serialized files store the trailing mesh-offset
    dictionary as u32, not u64 — both widths must load (validated against
    the chunk magic)."""
    import struct, zlib
    import numpy as np
    from rustlight_tpu.scene.loaders.serialized import (MAGIC, _F_SINGLE,
                                                        load_serialized)
    blobs = []
    for k in (1, 2):
        payload = struct.pack("<I", _F_SINGLE)       # version 3: no name
        payload += struct.pack("<QQ", 3, 1)
        payload += np.arange(9, dtype=np.float32).tobytes()
        payload += (np.array([[0, 1, 2]], np.uint32) * k).tobytes()
        blobs.append(struct.pack("<HH", MAGIC, 3) + zlib.compress(payload))
    out, offs = b"", []
    for b in blobs:
        offs.append(len(out)); out += b
    out += struct.pack("<2I", *offs) + struct.pack("<I", 2)   # u32 footer
    p = tmp_path / "old.serialized"
    p.write_bytes(out)
    m0 = load_serialized(p, 0)
    m1 = load_serialized(p, 1)
    assert m0.vertices.shape == (3, 3) and m0.indices.tolist() == [[0, 1, 2]]
    assert m1.indices.tolist() == [[0, 2, 4]]


def test_mitsuba_named_ior(tmp_path):
    """Dielectric IORs given by material name resolve through the
    glass.rs:6-34 table (reference: mitsuba_rs handles the name lookup)."""
    from rustlight_tpu.bsdfs.fresnel import NAMED_IOR, resolve_ior
    from rustlight_tpu.bsdfs.table import KIND_GLASS
    (tmp_path / "s.xml").write_text(textwrap.dedent("""\
        <scene version="0.6.0">
          <sensor type="perspective">
            <float name="fov" value="45"/>
            <film type="hdrfilm">
              <integer name="width" value="8"/>
              <integer name="height" value="8"/>
            </film>
          </sensor>
          <bsdf type="dielectric" id="wat">
            <string name="intIOR" value="water"/>
            <string name="extIOR" value="air"/>
          </bsdf>
          <shape type="sphere">
            <point name="center" x="0" y="0" z="2"/>
            <float name="radius" value="0.5"/>
            <ref id="wat"/>
          </shape>
        </scene>
    """))
    scene = load_scene(tmp_path / "s.xml")
    mats = [m for m in scene.materials if m.kind == KIND_GLASS]
    assert len(mats) == 1
    assert mats[0].eta == pytest.approx(NAMED_IOR["water"]
                                        / NAMED_IOR["air"], rel=1e-6)
    # numeric strings and case-insensitive names both resolve
    assert resolve_ior("1.25", 0.0) == pytest.approx(1.25)
    assert resolve_ior("BK7", 0.0) == pytest.approx(1.5046)
    assert resolve_ior(None, 1.5) == 1.5
    with pytest.raises(ValueError):
        resolve_ior("unobtainium", 1.0)
