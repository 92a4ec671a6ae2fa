"""Statistical agreement between the wavefront renderer and the independent
scalar CPU oracle (tests/oracle_pt.py — VERDICT r3 item 4).

Both sides render the same cbox configurations with independent RNGs; their
per-pixel means must agree within the COMBINED Monte-Carlo noise of the two
estimates. The gate is a global z-test on the image-mean difference (the
per-pixel errors are independent across pixels, so the standard error of the
image mean is sqrt(sum var_i) / n_pix) plus a per-pixel outlier-rate check.
A shared wavefront-side estimator bias (the risk this oracle retires) would
shift every pixel the same way and trip the global test long before the
outlier one.
"""
import math

import numpy as np
import pytest

from rustlight_tpu.integrators.common import render
from rustlight_tpu.integrators.path import IntegratorPathTracing
from rustlight_tpu.models.cbox import cornell_box
from rustlight_tpu.scene.volume import make_volume

from oracle_pt import OracleScene

SIZE = 12      # tiny film: the oracle is deliberately slow scalar python


def _agree(config_name, host, max_depth, spp_wave, spp_oracle,
           volume=None, seed=7):
    if volume is not None:
        host.volume = volume
    oracle = OracleScene(host)
    sd = host.compile()

    integ = IntegratorPathTracing(max_depth=max_depth, rr_depth=None)
    film = render(sd, integ, spp_wave, seed=seed, variance=True)
    img_w = np.asarray(film.buffers["primal"], np.float64)
    var_w = np.asarray(film.buffers["variance"], np.float64) / spp_wave

    img_o, var_o = oracle.render(host.camera.width, host.camera.height,
                                 spp_oracle, seed=seed + 1,
                                 max_depth=max_depth)

    assert np.isfinite(img_w).all() and np.isfinite(img_o).all()
    assert img_w.mean() > 1e-3, f"{config_name}: wavefront render is black"
    assert img_o.mean() > 1e-3, f"{config_name}: oracle render is black"

    diff = img_w - img_o
    se2 = var_w + var_o                      # [h, w, 3] variance of diff
    n_pix = diff.size
    # global z-test per the docstring; small epsilon guards epsilon-policy
    # differences (ray offsets) that are not estimator bias
    gdiff = float(diff.mean())
    gse = float(np.sqrt(se2.sum()) / n_pix)
    tol = 6.0 * gse + 1e-3 * float(img_o.mean())
    assert abs(gdiff) < tol, (
        f"{config_name}: image means differ by {gdiff:.5f} "
        f"(allowed {tol:.5f}; wave {img_w.mean():.5f} vs oracle "
        f"{img_o.mean():.5f})")

    # outlier rate: fraction of per-pixel |z| > 5 must be tiny. se can be
    # under-estimated at low spp, so allow a small floor.
    z = np.abs(diff) / np.maximum(np.sqrt(se2), 1e-4)
    frac = float((z > 5.0).mean())
    assert frac < 0.02, f"{config_name}: {frac:.3f} of pixels |z|>5"


def test_oracle_direct_lighting():
    # max_depth=2 == emission + direct lighting (one NEE + one BSDF-hit MIS)
    host = cornell_box(SIZE, SIZE)
    _agree("direct(md=2)", host, max_depth=2, spp_wave=512, spp_oracle=96)


def test_oracle_path_nee_mis():
    host = cornell_box(SIZE, SIZE)
    _agree("path(md=5)", host, max_depth=5, spp_wave=384, spp_oracle=80)


def test_oracle_homogeneous_medium():
    host = cornell_box(SIZE, SIZE)
    vol = make_volume(sigma_s=(0.0025, 0.0025, 0.0025),
                      sigma_a=(0.0004, 0.0004, 0.0004), g=0.0)
    _agree("medium(md=4)", host, max_depth=4, spp_wave=384, spp_oracle=80,
           volume=vol)


def test_oracle_phong_cbox():
    """Glossy transport: cbox with Modified-Phong blocks — exercises the
    oracle's independent phong eval/pdf/sample (lobe mix, mirror-lobe
    normalization, mixture-pdf MIS against NEE)."""
    from rustlight_tpu.bsdfs import phong
    host = cornell_box(SIZE, SIZE, mat_overrides={
        "blocks": phong(kd=(0.2,) * 3, ks=(0.5,) * 3, exponent=50.0,
                        weight_specular=0.5)})
    _agree("cbox-phong(md=4)", host, max_depth=4, spp_wave=384,
           spp_oracle=80)


def test_oracle_veach_mis_direct():
    """The veach_mis MIS stress scene at max_depth=2 (emission + direct):
    four glossy plates (exponent 40..5000) x four light sizes — the
    configuration where a MIS-weight defect would separate the wavefront
    renderer from the oracle far outside the combined noise."""
    from rustlight_tpu.models.veach import veach_mis
    _agree("veach(md=2)", veach_mis(16, 12), max_depth=2, spp_wave=512,
           spp_oracle=96)


def test_oracle_glass_cbox():
    """Specular transport: cbox with smooth-dielectric (glass) blocks —
    delta chains through Fresnel-selected reflect/refract with the
    radiance-transport eta^2 scaling, NEE suppressed at delta vertices,
    emission picked up with weight 1 after a delta bounce."""
    from rustlight_tpu.bsdfs import glass
    host = cornell_box(SIZE, SIZE, mat_overrides={"blocks": glass()})
    _agree("cbox-glass(md=6)", host, max_depth=6, spp_wave=512,
           spp_oracle=96)


# --------------------------------------------------------------------------
# Round-5 scope extension (VERDICT r4 item 3): metal / substrate / blend /
# textures / envmap, plus the adjoint (light-tracing) path — the estimators
# that previously had no independent implementation checking them.
# --------------------------------------------------------------------------

def test_oracle_metal_cbox():
    """Rough-conductor transport, BOTH microfacet families: Beckmann blocks
    + GGX right wall (metal.rs:14-177, distribution.rs:25-145,
    fresnel_conductor of utils.rs:76-96). Exercises half-vector sampling,
    Smith G1, converted-measure pdfs MIS'd against NEE."""
    from rustlight_tpu.bsdfs import metal
    host = cornell_box(SIZE, SIZE, mat_overrides={
        "blocks": metal(alpha=0.25, dist_ggx=False),
        "right": metal(ks=(0.9, 0.4, 0.3), alpha=0.35, dist_ggx=True)})
    _agree("cbox-metal(md=4)", host, max_depth=4, spp_wave=384,
           spp_oracle=80)


def test_oracle_substrate_cbox():
    """FresnelBlend substrate (substrate.rs:21-225): 0.5/0.5 lobe mix,
    Schlick fresnel coat over diffuse, the 28/(23 pi) normalization."""
    from rustlight_tpu.bsdfs import substrate
    host = cornell_box(SIZE, SIZE, mat_overrides={
        "blocks": substrate(kd=(0.4, 0.5, 0.6), ks=(0.08, 0.08, 0.08),
                            alpha=0.3)})
    _agree("cbox-substrate(md=4)", host, max_depth=4, spp_wave=384,
           spp_oracle=80)


def test_oracle_blend_cbox():
    """Two-BSDF mixture (blend.rs:9-95): blocks = 0.4 phong + 0.6 diffuse.
    Lobe selection with random reuse, recombined mixture pdf/weight."""
    from rustlight_tpu.bsdfs import blend, phong
    host = cornell_box(SIZE, SIZE, mat_overrides={"blocks": blend(4, 0, 0.4)})
    host.add_material(phong(kd=(0.1,) * 3, ks=(0.6,) * 3, exponent=30.0,
                            weight_specular=0.5))
    _agree("cbox-blend(md=4)", host, max_depth=4, spp_wave=384,
           spp_oracle=80)


def test_oracle_textured_cbox():
    """Textured diffuse slots (BSDFColor, mod.rs:11-121): checkerboard
    walls + bitmap right wall through the scene texture atlas — uv
    interpolation, Rust truncation semantics, v-flip texel lookup."""
    from rustlight_tpu.bsdfs import MaterialDesc
    from rustlight_tpu.bsdfs.table import KIND_DIFFUSE, TEX_CHECKER, \
        TEX_BITMAP
    rng = np.random.default_rng(11)
    tex = (0.2 + 0.6 * rng.random((16, 16, 3))).astype(np.float32)
    host = cornell_box(SIZE, SIZE, mat_overrides={
        "white": MaterialDesc(kind=KIND_DIFFUSE, kd=(0.7, 0.7, 0.7),
                              tex_kind=TEX_CHECKER, tex_c1=(0.25, 0.25, 0.3),
                              tex_scale=(2.0, 2.0)),
        "right": MaterialDesc(kind=KIND_DIFFUSE, tex_kind=TEX_BITMAP,
                              tex_img=0)})
    host.textures = tex[None]
    _agree("cbox-textured(md=3)", host, max_depth=3, spp_wave=384,
           spp_oracle=80)


def test_oracle_env_glass_sphere():
    """The envglass-scope configuration (examples/envglass.xml class): a
    glass sphere + a smooth-metal sphere on a diffuse ground under a
    TEXTURED environment map — env 2D-CDF NEE with sin(theta) weighting
    (emitter.rs:300-568), escaped-ray MIS, delta chains through both
    dielectric and conductor mirrors."""
    from rustlight_tpu.scene import Scene, make_camera, look_at, \
        make_sphere, make_quad
    from rustlight_tpu.bsdfs import glass, metal, diffuse
    rng = np.random.default_rng(5)
    # smooth-ish env with a bright patch (exercises the CDF concentration)
    env = 0.3 + 0.4 * rng.random((12, 24, 3))
    env[3:5, 6:9] = (12.0, 10.0, 8.0)
    sc = Scene()
    mg = sc.add_material(glass())
    mm = sc.add_material(metal(alpha=0.0))
    md = sc.add_material(diffuse((0.5, 0.45, 0.4)))
    sc.add_mesh(make_sphere((-1.2, 1.0, 0), 1.0, material=mg))
    sc.add_mesh(make_sphere((1.2, 1.0, 0), 1.0, material=mm))
    sc.add_mesh(make_quad((-20, 0, -20), (20, 0, -20), (20, 0, 20),
                          (-20, 0, 20), material=md))
    sc.env_image = env.astype(np.float32)
    sc.camera = make_camera(SIZE, SIZE, fov=55.0,
                            to_world=look_at((0, 1.6, -6), (0, 1, 0),
                                             (0, 1, 0)))
    _agree("env-glass(md=6)", sc, max_depth=6, spp_wave=512, spp_oracle=96)


def test_oracle_constant_env_sphere():
    """Constant envmap: uniform-sphere NEE + escaped-ray MIS against the
    closed-form selection pdf 1/4pi (emitter.rs:300-341)."""
    from rustlight_tpu.models.presets import simple_sphere_scene
    _agree("const-env(md=3)", simple_sphere_scene(SIZE, SIZE), max_depth=3,
           spp_wave=384, spp_oracle=80)


def test_oracle_light_tracing_adjoint():
    """The adjoint path (VERDICT r4: 'zero independent validation'): the
    wavefront light tracer (camera sample_direct W_e splatting,
    light.rs:35-210 + camera.rs:94-138) against the oracle's independent
    scalar particle tracer, on a cbox with PHONG blocks so the camera
    connections evaluate a non-trivial f. Image means must agree within
    the combined seed-to-seed noise."""
    from rustlight_tpu.bsdfs import phong
    from rustlight_tpu.integrators import IntegratorLightTracing
    from rustlight_tpu.integrators.common import render_splat

    host = cornell_box(SIZE, SIZE, mat_overrides={
        "blocks": phong(kd=(0.2,) * 3, ks=(0.5,) * 3, exponent=50.0,
                        weight_specular=0.5)})
    oracle = OracleScene(host)
    sd = host.compile()

    wave = [float(np.asarray(
        render_splat(sd, IntegratorLightTracing(max_depth=4, hard_cap=4),
                     spp=48, seed=s)["primal"]).mean()) for s in (0, 1, 2)]
    n_paths = 6000
    orac = [oracle.render_light(SIZE, SIZE, n_paths, seed=100 + s,
                                max_depth=4).mean() for s in (0, 1, 2)]
    mw, mo = np.mean(wave), np.mean(orac)
    # SE of each 3-seed mean from the seed spread, combined in quadrature
    se = math.sqrt(np.var(wave, ddof=1) / 3 + np.var(orac, ddof=1) / 3)
    tol = 6.0 * se + 0.02 * mo
    assert mw > 1e-3 and mo > 1e-3, (mw, mo)
    assert abs(mw - mo) < tol, (
        f"light-tracing adjoint: wavefront {mw:.5f} vs oracle {mo:.5f} "
        f"(tol {tol:.5f}, seeds {wave} vs {orac})")


def test_oracle_point_and_directional_lights():
    """Delta emitters (PointEmitter emitter.rs:187-250, DirectionalLight
    :96-185): NEE-only atoms with weight I/d^2 resp. I, never MIS'd
    against BSDF hits. Floor + back wall under one of each."""
    from rustlight_tpu.scene import Scene, make_camera, look_at, make_quad
    from rustlight_tpu.bsdfs import diffuse
    sc = Scene()
    m = sc.add_material(diffuse((0.6, 0.55, 0.5)))
    sc.add_mesh(make_quad((-5, 0, -5), (5, 0, -5), (5, 0, 5), (-5, 0, 5),
                          material=m))
    sc.add_mesh(make_quad((-5, 0, -5), (-5, 4, -5), (5, 4, -5), (5, 0, -5),
                          material=m))
    sc.point_lights.append(((0.0, 3.0, 1.0), (8.0, 7.0, 6.0)))
    sc.directional_lights.append(((0.3, -1.0, 0.2), (0.6, 0.7, 0.8)))
    sc.camera = make_camera(SIZE, SIZE, fov=60.0,
                            to_world=look_at((0, 2.5, 6), (0, 1, 0),
                                             (0, 1, 0)))
    _agree("point+dir(md=4)", sc, max_depth=4, spp_wave=512, spp_oracle=96)


def smooth_blend_scene(size=SIZE):
    """A floor of blend(smooth metal, diffuse) under a LARGE overhead
    light: with NEE skipped on the smooth blend, ALL of the floor's light
    arrives via BSDF-sampled emitter hits, and the big light makes
    pdf_light comparable to the bounce pdf — the configuration where a
    missing prev_nee state (weighting those hits by balance() instead of
    1) darkens the image ~40% (measured: buggy-oracle z = 66 vs fixed
    z = 1.2)."""
    from rustlight_tpu.scene import Scene, make_camera, look_at, make_quad
    from rustlight_tpu.bsdfs import blend, metal, diffuse
    sc = Scene()
    sc.add_material(diffuse((0.7, 0.7, 0.7)))        # 0: the diffuse sub
    mb = sc.add_material(blend(3, 0, 0.5))           # 1: the floor blend
    lm = sc.add_material(diffuse((0, 0, 0)))         # 2: light surface
    sc.add_material(metal(alpha=0.0))                # 3: the delta sub
    sc.add_mesh(make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2),
                          material=mb))
    sc.add_mesh(make_quad((-4, 3, -4), (4, 3, -4), (4, 3, 4), (-4, 3, 4),
                          material=lm, emission=(3, 3, 3)))
    sc.camera = make_camera(size, size, fov=50.0,
                            to_world=look_at((0, 2.0, -4.5), (0, 0, 0),
                                             (0, 1, 0)))
    return sc


def test_oracle_smooth_blend_big_light():
    """Blend with a DELTA sub (smooth metal + diffuse): the whole material
    is 'smooth' (NEE skipped, mod.rs:139-161), so a non-delta-sampled
    continuation's emitter hit must carry MIS weight 1 — the prev_nee
    state the round-5 review found missing from the oracle's recursion
    (the wavefront renderer always had it, path.py nee_possible)."""
    _agree("smoothblend(md=3)", smooth_blend_scene(), max_depth=3,
           spp_wave=512, spp_oracle=96)


@pytest.mark.parametrize("kind", [1, 2])
def test_oracle_uv_emission(kind):
    """EmissionType::{HSV,Texture} (geometry.rs:99-104, 184-206):
    uv-dependent emission through NEE sampling AND BSDF-hit evaluation,
    z-tested against the wavefront renderer — the third independent
    implementation beyond the renderer's own forward-vs-adjoint check."""
    host = cornell_box(SIZE, SIZE)
    for m in host.meshes:
        if m.is_light:
            m.emission_kind = kind
            m.emission_scale = 15.0
            m.emission_tex = 0
    if kind == 2:
        yy, xx = np.mgrid[0:16, 0:16].astype(np.float32) / 15.0
        host.textures = np.stack([xx, yy, 0.5 * (1 - xx)], -1)[None]
    _agree(f"uv-emission(kind={kind})", host, max_depth=3, spp_wave=384,
           spp_oracle=80)
