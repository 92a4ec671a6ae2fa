"""Unit tests for math foundations: frames, warps, distributions, rng, image I/O.

Oracle strategy per SURVEY.md §4: closed-form checks (pdfs integrate to 1,
sample/pdf consistency) since the reference ships no unit tests of its own.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustlight_tpu.utils import (
    make_frame, to_world, to_local, warps,
    build_distribution_1d, sample_discrete_1d, pdf_discrete_1d,
    build_distribution_2d, sample_continuous_2d,
    make_stream, stream_next, stream_next2d,
)
from rustlight_tpu.utils import image as rimage


def _rand_dirs(n, seed=0):
    u = jax.random.uniform(jax.random.PRNGKey(seed), (n, 2))
    return warps.sample_uniform_sphere(u)


class TestFrame:
    def test_orthonormal(self):
        n = _rand_dirs(1024)
        t, b, nn = make_frame(n)
        for v in (t, b):
            np.testing.assert_allclose(np.sum(np.asarray(v) ** 2, -1), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.sum(np.asarray(t) * np.asarray(b), -1), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.sum(np.asarray(t) * np.asarray(n), -1), 0.0, atol=1e-5)
        # right-handed: t x b = n
        np.testing.assert_allclose(np.cross(t, b), np.asarray(n), atol=1e-5)

    def test_roundtrip(self):
        n = _rand_dirs(256, 1)
        v = _rand_dirs(256, 2)
        f = make_frame(n)
        np.testing.assert_allclose(np.asarray(to_world(f, to_local(f, v))), np.asarray(v), atol=1e-5)

    def test_z_maps_to_normal(self):
        n = _rand_dirs(64, 3)
        f = make_frame(n)
        z = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (64, 1))
        np.testing.assert_allclose(np.asarray(to_world(f, z)), np.asarray(n), atol=1e-6)


class TestWarps:
    def test_cosine_hemisphere_distribution(self):
        u = jax.random.uniform(jax.random.PRNGKey(0), (200_000, 2))
        d = warps.cosine_sample_hemisphere(u)
        d = np.asarray(d)
        assert (d[:, 2] >= 0).all()
        np.testing.assert_allclose(np.sum(d * d, -1), 1.0, atol=1e-4)
        # E[cos theta] under pdf cos/pi is 2/3
        np.testing.assert_allclose(d[:, 2].mean(), 2.0 / 3.0, atol=3e-3)

    def test_uniform_sphere_mean_zero(self):
        d = np.asarray(_rand_dirs(200_000))
        np.testing.assert_allclose(d.mean(0), 0.0, atol=5e-3)
        np.testing.assert_allclose(np.sum(d * d, -1), 1.0, atol=1e-4)

    def test_concentric_disk_in_unit_disk(self):
        u = jax.random.uniform(jax.random.PRNGKey(1), (10_000, 2))
        p = np.asarray(warps.concentric_sample_disk(u))
        assert (np.sum(p * p, -1) <= 1.0 + 1e-6).all()
        # uniform on disk: E[r^2] = 1/2
        np.testing.assert_allclose(np.sum(p * p, -1).mean(), 0.5, atol=5e-3)

    def test_degenerate_origin(self):
        p = warps.concentric_sample_disk(jnp.array([[0.5, 0.5]]))
        np.testing.assert_allclose(np.asarray(p), 0.0)

    def test_triangle_uniform(self):
        u = jax.random.uniform(jax.random.PRNGKey(2), (100_000, 2))
        b = np.asarray(warps.uniform_sample_triangle(u))
        assert (b >= 0).all() and (b.sum(-1) <= 1 + 1e-6).all()
        np.testing.assert_allclose(b.mean(0), 1.0 / 3.0, atol=3e-3)

    def test_spherical_roundtrip(self):
        d = _rand_dirs(1000, 5)
        th, ph = warps.to_spherical_coordinates(d)
        d2 = warps.from_spherical_coordinates(th, ph)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-5)


class TestDistribution1D:
    def test_cdf_shape_and_pdf(self):
        f = jnp.array([1.0, 3.0, 0.0, 4.0])
        d = build_distribution_1d(f)
        assert d.cdf.shape == (5,)
        np.testing.assert_allclose(float(d.cdf[0]), 0.0)
        np.testing.assert_allclose(float(d.cdf[-1]), 1.0)
        pdf = np.asarray(pdf_discrete_1d(d, jnp.arange(4)))
        np.testing.assert_allclose(pdf, np.array([1, 3, 0, 4]) / 8.0, atol=1e-6)

    def test_sampling_frequencies(self):
        f = jnp.array([1.0, 3.0, 0.0, 4.0])
        d = build_distribution_1d(f)
        u = jax.random.uniform(jax.random.PRNGKey(0), (100_000,))
        idx = np.asarray(sample_discrete_1d(d, u))
        freq = np.bincount(idx, minlength=4) / len(idx)
        np.testing.assert_allclose(freq, np.array([1, 3, 0, 4]) / 8.0, atol=5e-3)

    def test_func_int_matches_reference_convention(self):
        # reference: func_int = sum(f)/n before normalization
        f = jnp.array([2.0, 4.0])
        d = build_distribution_1d(f)
        np.testing.assert_allclose(float(d.func_int), 3.0)


class TestDistribution2D:
    def test_sampling_density(self):
        f = jnp.array([[1.0, 0.0], [1.0, 2.0]])
        d2 = build_distribution_2d(f)
        uv = jax.random.uniform(jax.random.PRNGKey(0), (200_000, 2))
        xy = np.asarray(sample_continuous_2d(d2, uv))
        xi = np.clip(xy[:, 0].astype(int), 0, 1)
        yi = np.clip(xy[:, 1].astype(int), 0, 1)
        counts = np.zeros((2, 2))
        np.add.at(counts, (yi, xi), 1)
        counts /= counts.sum()
        np.testing.assert_allclose(counts, np.array([[1, 0], [1, 2]]) / 4.0, atol=5e-3)


class TestRng:
    def test_deterministic(self):
        s = make_stream(42)
        u1, s1 = stream_next(s, (16,))
        u2, _ = stream_next(make_stream(42), (16,))
        np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
        u3, _ = stream_next(s1, (16,))
        assert not np.allclose(np.asarray(u1), np.asarray(u3))

    def test_2d_shape(self):
        u, _ = stream_next2d(make_stream(0), (8, 4))
        assert u.shape == (8, 4, 2)
        assert ((np.asarray(u) >= 0) & (np.asarray(u) < 1)).all()


class TestImageIO:
    def test_pfm_roundtrip(self, tmp_path):
        img = np.random.rand(13, 17, 3).astype(np.float32)
        p = tmp_path / "x.pfm"
        rimage.write_pfm(p, img)
        np.testing.assert_allclose(rimage.read_pfm(p), img, atol=0)

    def test_exr_roundtrip(self, tmp_path):
        img = np.random.rand(9, 11, 3).astype(np.float32) * 10.0
        p = tmp_path / "x.exr"
        rimage.write_exr(p, img)
        np.testing.assert_allclose(rimage.read_exr(p), img, atol=0)

    def test_exr_half_roundtrip(self, tmp_path):
        img = np.random.rand(4, 5, 3).astype(np.float32)
        p = tmp_path / "h.exr"
        rimage.write_exr(p, img, half=True)
        np.testing.assert_allclose(rimage.read_exr(p), img, atol=2e-3)


    def test_exr_zip_roundtrip(self, tmp_path):
        """ZIP (16-line blocks) and ZIPS (per-line) compression — the
        formats Mitsuba/Blender/pbrt emit — round-trip bit-exactly,
        including odd sizes that leave a short trailing block."""
        for comp in ("zip", "zips", "rle"):
            for shape in ((9, 11, 3), (33, 7, 3), (16, 16, 3)):
                img = (np.random.rand(*shape).astype(np.float32) * 10.0)
                p = tmp_path / f"{comp}_{shape[0]}x{shape[1]}.exr"
                rimage.write_exr(p, img, compression=comp)
                np.testing.assert_allclose(rimage.read_exr(p), img, atol=0)

    def test_exr_zip_half_roundtrip(self, tmp_path):
        img = np.random.rand(21, 5, 3).astype(np.float32)
        p = tmp_path / "zh.exr"
        rimage.write_exr(p, img, half=True, compression="zip")
        np.testing.assert_allclose(rimage.read_exr(p), img, atol=2e-3)

    def test_exr_piz_roundtrip(self, tmp_path):
        """PIZ (32-line blocks, wavelet+Huffman — OpenEXR's own default in
        many DCC tools) round-trips bit-exactly for FLOAT and HALF,
        including odd sizes (leftover wavelet rows/columns + short
        trailing block) and degenerate all-zero / constant images."""
        rng = np.random.default_rng(7)
        for shape in ((9, 11, 3), (33, 17, 3), (64, 64, 3), (100, 7, 3)):
            for half in (False, True):
                img = rng.gamma(1.5, 1.0, shape).astype(np.float32)
                img[0, 0] = 0.0
                p = tmp_path / f"piz_{shape[0]}x{shape[1]}_{half}.exr"
                rimage.write_exr(p, img, half=half, compression="piz")
                ref = img.astype(np.float16).astype(np.float32) if half else img
                np.testing.assert_array_equal(rimage.read_exr(p), ref)
        for img in (np.zeros((40, 40, 3), np.float32),
                    np.full((40, 40, 3), 2.5, np.float32)):
            p = tmp_path / "piz_deg.exr"
            rimage.write_exr(p, img, compression="piz")
            np.testing.assert_array_equal(rimage.read_exr(p), img)

    def test_piz_cross_implementation(self):
        """The native C++ codec and the pure-Python fallback are written
        independently from the PIZ spec; each must decode the other's
        output bit-exactly (the strongest conformance check available
        without an external OpenEXR sample: no binding, no egress)."""
        from rustlight_tpu.utils import piz
        if piz._load_native() is None:
            import pytest
            pytest.skip("no g++ for the native codec")
        rng = np.random.default_rng(1)
        for trial in range(6):
            chans = [(int(rng.integers(1, 70)), int(rng.integers(1, 33)),
                      int(rng.integers(1, 3)))
                     for _ in range(int(rng.integers(1, 4)))]
            # equalize ny across channels as in a real scanline block
            ny = chans[0][1]
            chans = [(nx, ny, s) for nx, _, s in chans]
            n = sum(nx * ny * s for nx, ny, s in chans)
            if trial % 2:
                planar = np.linspace(0, 3000, n).astype(np.uint16)  # w14 path
            else:
                planar = rng.integers(0, 60000, n).astype(np.uint16)  # w16 path
            c_pay = piz.piz_compress(planar, chans)
            p_pay = piz.piz_compress(planar, chans, force_python=True)
            for payload, force in ((c_pay, True), (c_pay, False),
                                   (p_pay, True), (p_pay, False)):
                out = piz.piz_uncompress(payload, chans, force_python=force)
                np.testing.assert_array_equal(out, planar)

    def test_piz_wavelet_invertible(self):
        """wav2 encode/decode are exact inverses on both the 14-bit and
        the mod-2^16 variants, for ragged shapes."""
        from rustlight_tpu.utils.piz import _wav2_encode, _wav2_decode
        rng = np.random.default_rng(3)
        for ny, nx in ((1, 1), (1, 7), (5, 1), (8, 8), (13, 29), (32, 96)):
            for mx in (100, 1 << 15):  # w14 and w16 paths
                hi = min(mx + 1, 1 << 16)
                v = rng.integers(0, hi, (ny, nx)).astype(np.uint16)
                ref = v.copy()
                _wav2_encode(v, mx)
                if min(ny, nx) >= 2:  # 1-wide arrays have no wavelet levels
                    assert not np.array_equal(v, ref)
                _wav2_decode(v, mx)
                np.testing.assert_array_equal(v, ref)

    def test_exr_piz_actually_compresses(self, tmp_path):
        img = np.zeros((64, 64, 3), np.float32)
        a = tmp_path / "n.exr"; b = tmp_path / "p.exr"
        rimage.write_exr(a, img)
        rimage.write_exr(b, img, compression="piz")
        import os
        assert os.path.getsize(b) < os.path.getsize(a) / 4

    def test_exr_zip_actually_compresses(self, tmp_path):
        img = np.zeros((64, 64, 3), np.float32)   # trivially compressible
        a = tmp_path / "n.exr"; b = tmp_path / "z.exr"
        rimage.write_exr(a, img)
        rimage.write_exr(b, img, compression="zip")
        import os
        assert os.path.getsize(b) < os.path.getsize(a) / 4

    def test_ldr_roundtrip(self, tmp_path):
        img = np.random.rand(8, 8, 3).astype(np.float32)
        p = tmp_path / "x.png"
        rimage.write_ldr(p, img)
        back = rimage.read_ldr(p)
        np.testing.assert_allclose(back, img, atol=2e-2)


class TestVarianceEstimator:
    def test_welford_matches_numpy(self):
        from rustlight_tpu.utils.variance import (
            variance_init, variance_add, variance_value)
        data = np.random.RandomState(0).normal(5.0, 2.0, (500, 3)).astype(np.float32)
        est = variance_init(np.zeros(3, np.float32))
        for x in data:
            est = variance_add(est, x)
        np.testing.assert_allclose(est.mean, data.mean(0), rtol=1e-5)
        np.testing.assert_allclose(variance_value(est), data.var(0, ddof=1),
                                   rtol=1e-4)


class TestSpectrum:
    def test_d65_white_and_roundtrip(self):
        from rustlight_tpu.utils.spectrum import (
            spectrum_to_xyz, spectrum_to_rgb, xyz_to_rgb, rgb_to_xyz)
        xyz = spectrum_to_xyz(np.ones(36))
        assert abs(xyz[1] - 1.0) < 1e-5                  # Y normalization
        rgb = spectrum_to_rgb(np.ones(36), illuminant=True)
        np.testing.assert_allclose(rgb, 1.0, atol=2e-3)  # D65 -> sRGB white
        c = np.array([0.2, 0.5, 0.8], np.float32)
        np.testing.assert_allclose(xyz_to_rgb(rgb_to_xyz(c)), c, atol=1e-5)


class TestSolvers:
    def test_quadratic(self):
        import jax.numpy as jnp
        from rustlight_tpu.utils.solvers import solve_quadratic
        a = jnp.asarray([1.0, 2.0, 0.0, 1.0])
        b = jnp.asarray([-3.0, 0.0, 4.0, 0.0])
        c = jnp.asarray([2.0, -8.0, -8.0, 1.0])
        x0, x1, has = solve_quadratic(a, b, c)
        np.testing.assert_allclose(np.asarray(x0)[:3], [1.0, -2.0, 2.0],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(x1)[:3], [2.0, 2.0, 2.0],
                                   atol=1e-5)
        assert not bool(has[3])   # x^2 + 1: no real root

    def test_cubic_matches_numpy_roots(self):
        import jax.numpy as jnp
        from rustlight_tpu.utils.solvers import solve_cubic
        rng = np.random.RandomState(1)
        coeffs = rng.uniform(-2, 2, (64, 4)).astype(np.float32)
        coeffs[:, 0] = np.where(np.abs(coeffs[:, 0]) < 0.2, 1.0, coeffs[:, 0])
        roots, count = solve_cubic(*[jnp.asarray(coeffs[:, k])
                                     for k in range(4)])
        roots = np.asarray(roots)
        for i in range(64):
            true = np.roots(coeffs[i])
            true = np.sort(true[np.abs(true.imag) < 1e-4].real)
            got = np.sort(np.unique(np.round(roots[i], 3)))[: len(true)]
            mine = np.sort(roots[i][: int(count[i])] if count[i] == 3
                           else roots[i][:1])
            # every reported root must satisfy the polynomial
            for r in mine:
                val = np.polyval(coeffs[i], r)
                scale = np.abs(coeffs[i]).sum() * max(1.0, abs(r)) ** 3
                assert abs(val) < 1e-3 * scale, (i, r, val)


def test_fused_attr_columns():
    """GeometryTables.attr fused rows mirror the individual columns, and
    Scene.compile appends the emission columns (scene/geometry.py A_*)."""
    import numpy as np
    from rustlight_tpu.scene import Scene, make_camera, look_at, make_quad, make_sphere
    from rustlight_tpu.bsdfs.table import MaterialDesc
    from rustlight_tpu.scene.geometry import (
        A_V0, A_E1, A_E2, A_NG, A_AREA, A_VN, A_VUV, A_HASN, A_MAT, A_EID,
        A_LE, A_PDFA, N_ATTR)

    sc = Scene(camera=make_camera(16, 16, 40.0,
                                  look_at((0., 1., -4.), (0., 1., 0.), (0, 1, 0))))
    m = sc.add_material(MaterialDesc(kd=(0.5, 0.5, 0.5)))
    sc.add_mesh(make_sphere((0, 1, 0), 1.0, material=m, n_theta=8, n_phi=8))
    sc.add_mesh(make_quad((1., 3., 1.), (2., 3., 1.), (2., 3., 2.), (1., 3., 2.),
                          emission=(5., 5., 5.)))
    sd = sc.compile()
    g = sd.host.data.geom
    em = sd.host.data.emitters
    a = np.asarray(g.attr)
    assert a.shape == (g.n_pad, N_ATTR)
    np.testing.assert_array_equal(a[:, A_V0], g.v0)
    np.testing.assert_array_equal(a[:, A_E1], g.e1)
    np.testing.assert_array_equal(a[:, A_E2], g.e2)
    np.testing.assert_array_equal(a[:, A_NG], g.n_g)
    np.testing.assert_array_equal(a[:, A_AREA], g.area)
    np.testing.assert_array_equal(a[:, A_VN], g.vn.reshape(g.n_pad, 9))
    np.testing.assert_array_equal(a[:, A_VUV], g.vuv.reshape(g.n_pad, 6))
    np.testing.assert_array_equal(a[:, A_HASN] > 0.5, g.has_normals)
    np.testing.assert_array_equal(a[:, A_MAT].astype(np.int32), g.mat_id)
    np.testing.assert_array_equal(a[:, A_EID].astype(np.int32), g.emitter_id)
    np.testing.assert_array_equal(a[:, A_LE], em.tri_emission)
    np.testing.assert_array_equal(a[:, A_PDFA], em.tri_pdf_area)


def test_stratified_stream_coverage():
    """StratifiedStream: across the spp passes, every pixel must land in
    each stratum of each stratified dimension exactly once (reference
    stratified.rs shuffled tables, nb_dim=4 as built by the CLI)."""
    import numpy as np
    import jax.numpy as jnp
    from rustlight_tpu.utils.rng import (make_stream, stream_fold,
                                         StratifiedStream, stream_next,
                                         stream_next2d)

    spp, n = 16, 8
    base = make_stream(5)
    pid = jnp.arange(n, dtype=jnp.int32)
    hits1 = np.zeros((4, n, spp), bool)
    hits2 = np.zeros((4, n, spp), bool)
    for s in range(spp):
        st = StratifiedStream(inner=stream_fold(base, s), pixel_ids=pid,
                              pass_idx=jnp.int32(s), spp=spp,
                              base_key=base.key)
        for dim in range(5):
            u2, st = stream_next2d(st, (n,))
            assert (np.asarray(u2) >= 0).all() and (np.asarray(u2) < 1).all()
            if dim < 4:
                k = (np.floor(np.asarray(u2[:, 0]) * 4).astype(int)
                     + 4 * np.floor(np.asarray(u2[:, 1]) * 4).astype(int))
                hits2[dim, np.arange(n), k] = True
        for dim in range(5):
            u1, st = stream_next(st, (n,))
            if dim < 4:
                k = np.floor(np.asarray(u1) * spp).astype(int)
                hits1[dim, np.arange(n), k] = True
    assert hits1.all(), "1D strata not fully covered"
    assert hits2.all(), "2D strata not fully covered"


def test_stratified_1d_2d_permutations_independent():
    """1D dim k and 2D dim k must use independent stratum permutations
    (the reference shuffles its 1D/2D tables separately): joint samples
    must cover off-diagonal stratum pairs, not just the diagonal."""
    import numpy as np
    import jax.numpy as jnp
    from rustlight_tpu.samplers.stratified import stratified_1d, stratified_2d
    from rustlight_tpu.utils.rng import make_stream

    spp, n = 16, 32
    key = make_stream(5).key
    pid = jnp.arange(n, dtype=jnp.int32)
    pair_hits = np.zeros((n, spp, spp), bool)   # (1D stratum, 2D linear stratum)
    for s in range(spp):
        u1 = stratified_1d(key, pid, jnp.int32(s), spp, 0,
                           jnp.zeros(n))
        u2 = stratified_2d(key, pid, jnp.int32(s), spp, 0,
                           jnp.zeros((n, 2)))
        k1 = np.floor(np.asarray(u1) * spp).astype(int)
        side = int(spp ** 0.5)
        k2 = (np.floor(np.asarray(u2[:, 0]) * side).astype(int)
              + side * np.floor(np.asarray(u2[:, 1]) * side).astype(int))
        pair_hits[np.arange(n), k1, k2] = True
    # with a SHARED permutation both draws land in the same stratum index
    # every pass (k1 == k2 always): only diagonal pairs get covered.
    # independent permutations scatter ~ (1 - 1/spp) of hits off-diagonal.
    diag = pair_hits[:, np.arange(spp), np.arange(spp)].sum()
    total = pair_hits.sum()
    assert total - diag > total / 2, (
        f"only {total - diag}/{total} stratum pairs off-diagonal — "
        f"1D/2D permutations correlated")


class TestPizSpecVectors:
    """Hand-computed PIZ payloads, built byte-by-byte from the format
    specification WITHOUT either codec — a conformance anchor independent
    of both implementations (no OpenEXR binding or sample files exist in
    this environment, so shared-misunderstanding bugs would otherwise be
    invisible to round-trip and cross-implementation tests)."""

    def _u32(self, v):
        return int(v).to_bytes(4, "little")

    def test_two_value_block(self):
        # channel nx=2 ny=1 size=1, data u16 [100, 300]:
        # - bitmap bytes 12 (bit 4: 100) and 37 (bit 4: 300)
        # - LUT: 0->0, 100->1, 300->2; wavelet is a no-op (min(nx,ny)=1)
        # - Huffman: symbols {1,2} + RLE pseudo-symbol 3;
        #   chosen canonical lengths l(1)=2, l(2)=2, l(3)=1
        #   => codes 1:00, 2:01, 3:1
        # - packed table (6-bit lengths 2,2,1): 0x08 0x20 0x40
        # - data bits 00 01 -> 0x10, nBits=4
        from rustlight_tpu.utils import piz
        table = bytes([0x08, 0x20, 0x40])
        data = bytes([0x10])
        huf = (self._u32(1) + self._u32(3) + self._u32(len(table))
               + self._u32(4) + self._u32(0) + table + data)
        bitmap = bytearray(26)
        bitmap[0] = 0x10           # byte 12: value 100 -> bit 4
        bitmap[25] = 0x10          # byte 37: value 300 -> bit 4
        payload = ((12).to_bytes(2, "little") + (37).to_bytes(2, "little")
                   + bytes(bitmap) + self._u32(len(huf)) + huf)
        chans = [(2, 1, 1)]
        expect = np.array([100, 300], np.uint16)
        out_py = piz.piz_uncompress(payload, chans, force_python=True)
        np.testing.assert_array_equal(out_py, expect)
        if piz._load_native() is not None:
            out_c = piz.piz_uncompress(payload, chans)
            np.testing.assert_array_equal(out_c, expect)

    def test_run_length_block(self):
        # channel nx=20 ny=1 size=1, data [7]*20:
        # - bitmap byte 0 = 0x80 (value 7 -> bit 7), min=max=0
        # - LUT: 0->0, 7->1; symbols {1} + RLE pseudo 2, lengths 1,1
        #   => codes 1:0, 2:1
        # - encoder run-folds: code(1), code(2), 8-bit count 19
        #   bits 0 1 00010011 -> 0x44 0xC0, nBits=10
        from rustlight_tpu.utils import piz
        table = bytes([0x04, 0x10])   # 6-bit lengths 1,1
        data = bytes([0x44, 0xC0])
        huf = (self._u32(1) + self._u32(2) + self._u32(len(table))
               + self._u32(10) + self._u32(0) + table + data)
        payload = ((0).to_bytes(2, "little") + (0).to_bytes(2, "little")
                   + bytes([0x80]) + self._u32(len(huf)) + huf)
        chans = [(20, 1, 1)]
        expect = np.full(20, 7, np.uint16)
        out_py = piz.piz_uncompress(payload, chans, force_python=True)
        np.testing.assert_array_equal(out_py, expect)
        if piz._load_native() is not None:
            out_c = piz.piz_uncompress(payload, chans)
            np.testing.assert_array_equal(out_c, expect)


class TestExrPxr24B44:
    """Decode-only PXR24 / B44 / B44A support, anchored the same way as PIZ:
    payloads built byte-by-byte from the format spec (ImfPxr24Compressor /
    ImfB44Compressor semantics) with hand-computed expected pixels — no
    OpenEXR available offline, so the spec vectors ARE the conformance
    anchor (independent of the decoder under test)."""

    @staticmethod
    def _mk_exr(channels, comp, w, h, payloads, tmp_path, name):
        """Handcraft a minimal scanline EXR container: channels (name, pt),
        compression byte, dataWindow, one chunk per payload."""
        import struct
        chl = b""
        for cn, pt in channels:
            chl += cn.encode() + b"\0" + struct.pack("<iiii", pt, 0, 1, 1)
        chl += b"\0"
        hdr = b"\x76\x2f\x31\x01" + struct.pack("<i", 2)
        hdr += b"channels\0chlist\0" + struct.pack("<i", len(chl)) + chl
        hdr += b"compression\0compression\0" + struct.pack("<i", 1) \
            + bytes([comp])
        dw = struct.pack("<iiii", 0, 0, w - 1, h - 1)
        hdr += b"dataWindow\0box2i\0" + struct.pack("<i", 16) + dw
        hdr += b"\0"
        body = b""
        offs = []
        base = len(hdr) + 8 * len(payloads)
        from rustlight_tpu.utils.image import _EXR_LINES_PER_BLOCK
        lpb = _EXR_LINES_PER_BLOCK.get(comp, 32)
        for i, pl in enumerate(payloads):
            offs.append(base + len(body))
            body += struct.pack("<ii", i * lpb, len(pl)) + pl
        out = hdr + b"".join(struct.pack("<Q", o) for o in offs) + body
        p = tmp_path / name
        p.write_bytes(out)
        return p

    def test_pxr24_hand_vector(self, tmp_path):
        """FLOAT channel, 32x1: difference-coded MSB-first byte planes,
        deflated. The leading bytes are computed by hand from the f32 bit
        patterns; the tail repeats 0.25 (zero diffs) so the deflated chunk
        is genuinely smaller than raw (the reader treats an un-shrunk chunk
        as a raw fallback, as OpenEXR writers do)."""
        import zlib
        from rustlight_tpu.utils.image import read_exr
        w = 32
        # 1.0 2.0 -0.5 0.25 -> top-24 0x3F8000 400000 BF0000 3E8000
        # diffs mod 2^24: 3F8000 008000 7F0000 7F8000, then zeros
        msb = bytes([0x3F, 0x00, 0x7F, 0x7F] + [0] * (w - 4))
        mid = bytes([0x80, 0x80, 0x00, 0x80] + [0] * (w - 4))
        low = bytes(w)
        p = self._mk_exr([("G", 2)], 5, w, 1,
                         [zlib.compress(msb + mid + low)],
                         tmp_path, "pxr24.exr")
        img = read_exr(p)
        expect = np.float32([1.0, 2.0, -0.5] + [0.25] * (w - 3))
        np.testing.assert_array_equal(img[0, :, 0], expect)

    def test_pxr24_half_spec_encoder(self, tmp_path):
        """HALF channel, independent spec encoder in the test: per scanline
        difference-coded 2-byte planes, one deflate over the block."""
        import zlib
        from rustlight_tpu.utils.image import read_exr
        rng = np.random.default_rng(3)
        h, w = 5, 64
        vals = (rng.integers(0, 8, (h, w)) * 256
                + np.float16(0.5).view(np.uint16)
                ).astype(np.uint16).view(np.float16)
        parts = []
        for y in range(h):
            u = vals[y].view(np.uint16).astype(np.int64)
            diff = np.diff(np.concatenate([[0], u])) & 0xFFFF
            parts.append(np.concatenate([(diff >> 8) & 0xFF, diff & 0xFF])
                         .astype(np.uint8))
        payload = zlib.compress(np.concatenate(parts).tobytes())
        p = self._mk_exr([("G", 1)], 5, w, h, [payload], tmp_path,
                         "pxr24h.exr")
        img = read_exr(p)
        np.testing.assert_array_equal(img[..., 0], vals.astype(np.float32))

    @staticmethod
    def _monotonic(u16):
        """The compressor's order-preserving half transform
        (ImfB44Compressor: inf/nan -> 0x8000; neg -> ~s; pos -> s|0x8000)."""
        s = int(u16)
        if (s & 0x7C00) == 0x7C00:
            return 0x8000
        return (~s) & 0xFFFF if s & 0x8000 else s | 0x8000

    @classmethod
    def _pack14(cls, tile4x4_u16):
        """Independent spec encoder for one 4x4 HALF tile at shift=0 (the
        caller guarantees all chained deltas fit in biased 6 bits)."""
        s = [cls._monotonic(v) for v in tile4x4_u16.reshape(-1)]
        order = [(4, 0), (8, 4), (12, 8), (1, 0), (5, 4), (9, 8), (13, 12),
                 (2, 1), (6, 5), (10, 9), (14, 13), (3, 2), (7, 6),
                 (11, 10), (15, 14)]
        d = [s[a] - s[b] + 0x20 for a, b in order]
        assert all(0 <= x < 64 for x in d), "test tile needs shift > 0"
        b = [s[0] >> 8, s[0] & 0xFF,
             (0 << 2) | (d[0] >> 4),
             ((d[0] & 0xF) << 4) | (d[1] >> 2),
             ((d[1] & 0x3) << 6) | d[2],
             (d[3] << 2) | (d[4] >> 4),
             ((d[4] & 0xF) << 4) | (d[5] >> 2),
             ((d[5] & 0x3) << 6) | d[6],
             (d[7] << 2) | (d[8] >> 4),
             ((d[8] & 0xF) << 4) | (d[9] >> 2),
             ((d[9] & 0x3) << 6) | d[10],
             (d[11] << 2) | (d[12] >> 4),
             ((d[12] & 0xF) << 4) | (d[13] >> 2),
             ((d[13] & 0x3) << 6) | d[14]]
        return bytes(b)

    def test_b44a_constant_tile_hand_vector(self, tmp_path):
        """B44A 3-byte constant tile: half(1.5) = 0x3E00, monotonic 0xBE00,
        marker byte 0xFC."""
        from rustlight_tpu.utils.image import read_exr
        p = self._mk_exr([("G", 1)], 7, 4, 4, [bytes([0xBE, 0x00, 0xFC])],
                         tmp_path, "b44a.exr")
        img = read_exr(p)
        np.testing.assert_array_equal(img[..., 0], np.full((4, 4), 1.5,
                                                           np.float32))

    def test_b44_tile_spec_encoder(self, tmp_path):
        """B44 14-byte tile via the independent spec encoder; values chosen
        with small half-bit deltas so shift=0 is exact."""
        from rustlight_tpu.utils.image import read_exr
        base = np.float16(0.5).view(np.uint16)
        tile = (base + np.arange(16, dtype=np.uint16)
                .reshape(4, 4) * 7).view(np.float16)
        p = self._mk_exr([("G", 1)], 6, 4, 4,
                         [self._pack14(tile.view(np.uint16))],
                         tmp_path, "b44.exr")
        img = read_exr(p)
        np.testing.assert_array_equal(img[..., 0],
                                      tile.astype(np.float32))

    def test_b44_edge_tiles_and_mixed_channels(self, tmp_path):
        """A 6x3 image (ragged 4x4 grid) with one HALF channel (tiles pad
        by edge replication on write; decode ignores the padding) plus one
        raw FLOAT channel."""
        from rustlight_tpu.utils.image import read_exr
        rng = np.random.default_rng(5)
        w, h = 6, 3
        half_img = (np.float16(0.25).view(np.uint16)
                    + (rng.integers(0, 16, (h, w)) * 2).astype(np.uint16)
                    ).view(np.float16)
        f32_img = rng.normal(size=(h, w)).astype(np.float32)
        # channel order: alphabetical ("F" float raw, then "H" half tiles)
        payload = f32_img.astype("<f4").tobytes()
        for y0 in range(0, h, 4):
            for x0 in range(0, w, 4):
                tile = np.zeros((4, 4), np.uint16)
                sub = half_img.view(np.uint16)[y0:y0 + 4, x0:x0 + 4]
                tile[:sub.shape[0], :sub.shape[1]] = sub
                # edge replication, exactly like the reference encoder
                tile[sub.shape[0]:, :] = tile[sub.shape[0] - 1, :]
                tile[:, sub.shape[1]:] = tile[:, sub.shape[1] - 1:sub.shape[1]]
                payload += self._pack14(tile)
        p = self._mk_exr([("F", 2), ("H", 1)], 6, w, h, [payload],
                         tmp_path, "b44mix.exr")
        img = read_exr(p)
        np.testing.assert_array_equal(img[..., 0], f32_img)
        np.testing.assert_array_equal(img[..., 1],
                                      half_img.astype(np.float32))

class TestExrDwa:
    """DWAA/DWAB decode, anchored like PIZ/B44: an independent in-test spec
    ENCODER (written from the ImfDwaCompressor format spec, not from the
    decoder) produces complete DWA chunks — 11-u64 header, serialized v2
    channel rules, huf/deflate AC, EXR-Zip DC, byte-planar RLE, raw UNKNOWN
    — and the expected pixels are computed by the test's own half/DCT/CSC/
    LUT pipeline. No OpenEXR exists offline; these spec vectors are the
    conformance anchor."""

    # ---- independent spec pipeline (test-side, no image.py internals) ----
    _ZIG = np.array([
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

    @staticmethod
    def _dct_mat():
        x = np.arange(8, dtype=np.float64)
        t = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16.0)
        t[0] *= np.sqrt(1 / 8)
        t[1:] *= 0.5
        return t.astype(np.float32)

    @staticmethod
    def _nonlinear(h16):
        v = h16.astype(np.float32)
        return (np.sign(v) * np.abs(v) ** np.float32(1 / 2.2)) \
            .astype(np.float16)

    @staticmethod
    def _linear(h16):
        v = h16.astype(np.float32)
        return (np.sign(v) * np.abs(v) ** np.float32(2.2)).astype(np.float16)

    # BT.709 inverse (the decode-side matrix per the spec); forward is its
    # numeric inverse
    _CSC_INV = np.array([[1.0, 0.0, 1.5747],
                         [1.0, -0.1873, -0.4682],
                         [1.0, 1.8556, 0.0]], np.float32)

    @staticmethod
    def _quantize(coef):
        """The encoder's lossy step: AC coefficients below a dead zone are
        zeroed (keeps the AC token stream sparse, like real DWA at its
        default quality). DC ([..., 0, 0]) is never quantized."""
        q = np.abs(coef) < 2e-3
        q[..., 0, 0] = False
        return np.where(q, 0.0, coef)

    _RULES = ([("R", 1, pt, 0) for pt in (1, 2)]
              + [("G", 1, pt, 1) for pt in (1, 2)]
              + [("B", 1, pt, 2) for pt in (1, 2)]
              + [(s, 1, pt, -1) for s in ("Y", "BY", "RY") for pt in (1, 2)]
              + [("A", 2, pt, -1) for pt in (0, 1, 2)])

    @classmethod
    def _classify(cls, name, pt):
        sfx = name.rsplit(".", 1)[-1]
        for r_sfx, scheme, r_pt, csc in cls._RULES:
            if sfx == r_sfx and pt == r_pt:
                return scheme, csc
        return 0, -1

    @classmethod
    def _encode_dwa(cls, channels, data, w, h, ac_scheme=0):
        """channels: [(name, pixel_type)]; data: name -> [h, w] array
        (float16 for HALF, float32 for FLOAT, uint32 for UINT). Returns one
        DWA chunk payload. Blocks pad by edge replication."""
        import struct
        import zlib
        from rustlight_tpu.utils.piz import huf_compress
        from rustlight_tpu.utils.image import _zip_do, _rle_encode

        # serialize the default rules (v2 stream form)
        rules_b = b""
        for sfx, scheme, r_pt, csc in cls._RULES:
            flags = ((csc + 1) << 4) | (scheme << 2)
            rules_b += sfx.encode() + b"\0" + bytes([flags, r_pt])
        rule_size = 2 + len(rules_b)

        schemes = {nm: cls._classify(nm, pt) for nm, pt in channels}
        # csc grouping (complete 0/1/2 prefix sets), file order by first
        by_pre = {}
        for ci, (nm, pt) in enumerate(channels):
            s, csc = schemes[nm]
            if s == 1 and csc >= 0:
                by_pre.setdefault(nm.rsplit(".", 1)[0] if "." in nm else "",
                                  {})[csc] = ci
        in_set, sets = {}, {}
        for pre, m in by_pre.items():
            if len(m) == 3:
                first = min(m.values())
                sets[first] = [m[0], m[1], m[2]]
                for ci in m.values():
                    in_set[ci] = first
        order, done = [], set()
        for ci in range(len(channels)):
            if ci in done:
                continue
            g = sets[in_set[ci]] if ci in in_set else [ci]
            order.append(g)
            done.update(g)

        nbx, nby = -(-w // 8), -(-h // 8)
        tmat = cls._dct_mat()
        csc_fwd = np.linalg.inv(cls._CSC_INV)
        ac_tokens, dc_vals = [], []
        rle_bytes, unk_bytes = b"", b""
        for g in order:
            scheme, _ = schemes[channels[g[0]][0]]
            if scheme == 1:                                  # LOSSY_DCT
                comps = []
                for ci in g:
                    nm, pt = channels[ci]
                    halfs = data[nm].astype(np.float16)
                    nl = cls._nonlinear(halfs).astype(np.float32)
                    pad = np.empty((nby * 8, nbx * 8), np.float32)
                    pad[:h, :w] = nl
                    pad[h:, :w] = nl[-1:, :]
                    pad[:, w:] = pad[:, w - 1:w]
                    comps.append(pad)
                comps = np.stack(comps)                      # [c, H, W]
                if len(g) == 3:
                    comps = np.einsum("rc,cij->rij", csc_fwd, comps)
                blocks = comps.reshape(len(g), nby, 8, nbx, 8) \
                    .transpose(1, 3, 0, 2, 4)                # [by,bx,c,8,8]
                coef = np.einsum("ux,...xy,vy->...uv", tmat, blocks, tmat)
                coef = cls._quantize(coef)
                ch16 = coef.astype(np.float16).view(np.uint16)
                # zig[i] = raster[ZIG[i]]
                zig = ch16.reshape(nby * nbx, len(g), 64)[:, :, cls._ZIG]
                dc_comp = [zig[:, c, 0] for c in range(len(g))]
                dc_vals.extend(dc_comp)
                for b in range(nby * nbx):
                    for c in range(len(g)):
                        row = zig[b, c]
                        dct = 1
                        while dct < 64:
                            if row[dct] != 0:
                                ac_tokens.append(int(row[dct]))
                                dct += 1
                                continue
                            run = 1
                            while dct + run < 64 and row[dct + run] == 0:
                                run += 1
                            if dct + run >= 64:
                                ac_tokens.append(0xFF00)     # EOB
                                break
                            ac_tokens.append(0xFF00 | run)
                            dct += run
            elif scheme == 2:                                # RLE
                nm, pt = channels[g[0]]
                nb = {0: 4, 1: 2, 2: 4}[pt]
                raw = np.ascontiguousarray(data[nm]).view(np.uint8) \
                    .reshape(h * w, nb)
                rle_bytes += raw.T.copy().tobytes()          # byte planes
            else:                                            # UNKNOWN
                nm, pt = channels[g[0]]
                unk_bytes += np.ascontiguousarray(data[nm]).tobytes()

        ac = np.asarray(ac_tokens, np.uint16)
        dc = np.concatenate(dc_vals).astype(np.uint16) if dc_vals \
            else np.empty(0, np.uint16)
        ac_seg = (huf_compress(ac) if ac_scheme == 0
                  else zlib.compress(ac.astype("<u2").tobytes())) \
            if ac.size else b""
        dc_seg = _zip_do(dc.astype("<u2").tobytes()) if dc.size else b""
        rle_rle = _rle_encode(rle_bytes) if rle_bytes else b""
        rle_seg = zlib.compress(rle_rle) if rle_bytes else b""
        unk_seg = zlib.compress(unk_bytes) if unk_bytes else b""
        hdr = struct.pack(
            "<11Q", 2, len(unk_bytes), len(unk_seg), len(ac_seg),
            len(dc_seg), len(rle_seg), len(rle_rle), len(rle_bytes),
            ac.size, dc.size, ac_scheme)
        return (hdr + struct.pack("<H", rule_size) + rules_b
                + unk_seg + ac_seg + dc_seg + rle_seg)

    @classmethod
    def _expected_dct(cls, channels_in_set, data, w, h):
        """Expected decode of one DCT set via the test pipeline: half-
        rounded coefficients -> idct -> (csc inverse) -> half -> toLinear."""
        tmat = cls._dct_mat()
        csc_fwd = np.linalg.inv(cls._CSC_INV)
        nbx, nby = -(-w // 8), -(-h // 8)
        comps = []
        for nm in channels_in_set:
            nl = cls._nonlinear(data[nm].astype(np.float16)) \
                .astype(np.float32)
            pad = np.empty((nby * 8, nbx * 8), np.float32)
            pad[:h, :w] = nl
            pad[h:, :w] = nl[-1:, :]
            pad[:, w:] = pad[:, w - 1:w]
            comps.append(pad)
        comps = np.stack(comps)
        if len(channels_in_set) == 3:
            comps = np.einsum("rc,cij->rij", csc_fwd, comps)
        blocks = comps.reshape(len(comps), nby, 8, nbx, 8) \
            .transpose(1, 3, 0, 2, 4)
        coef = cls._quantize(
            np.einsum("ux,...xy,vy->...uv", tmat, blocks, tmat)) \
            .astype(np.float16).astype(np.float32)           # half-rounded
        idct = np.einsum("ux,...uv,vy->...xy", tmat, coef, tmat)
        if len(channels_in_set) == 3:
            idct = np.einsum("rc,pqcij->pqrij", cls._CSC_INV, idct)
        out = []
        for c in range(len(channels_in_set)):
            plane = idct[:, :, c].transpose(0, 2, 1, 3) \
                .reshape(nby * 8, nbx * 8)[:h, :w]
            out.append(cls._linear(plane.astype(np.float16)))
        return out

    def test_dwa_constant_block_exact(self, tmp_path):
        """DC-only path: constant 0.25 HALF 'Y' channel. Expected value
        computed independently: toLinear(half(idct(half(8*nonlinear(0.25)))))
        — and the subnormal-AC rounding crumbs the spec encoder emits for a
        constant block exercise the literal-token path too. 24x24 so the
        chunk genuinely compresses (writers store raw otherwise)."""
        from rustlight_tpu.utils.image import read_exr
        w = h = 24
        vals = np.full((h, w), 0.25, np.float16)
        payload = self._encode_dwa([("Y", 1)], {"Y": vals}, w, h)
        assert len(payload) < w * h * 2, "test chunk must compress"
        p = TestExrPxr24B44._mk_exr([("Y", 1)], 8, w, h, [payload],
                                    tmp_path, "dwa_const.exr")
        img = read_exr(p)
        nl = self._nonlinear(vals[:1, :1])
        dcv = np.float16(8.0 * nl.astype(np.float32))
        rec = np.float16(dcv.astype(np.float32) / 8.0)
        expect = self._linear(rec).astype(np.float32)
        np.testing.assert_allclose(
            img[..., 0], np.full((h, w), expect.reshape(()), np.float32),
            rtol=2e-3, atol=1e-6)

    def test_dwa_rgb_csc_set(self, tmp_path):
        """R/G/B HALF channels form a CSC set: YCbCr forward on encode,
        inverse on decode, shared AC stream, component-planar DC."""
        from rustlight_tpu.utils.image import read_exr
        w, h = 32, 16
        yy, xx = np.mgrid[:h, :w].astype(np.float32)
        # smooth content: high-frequency DCT coefficients round to zero in
        # half, so the chunk genuinely compresses below the raw size
        data = {"R": (0.4 + 0.3 * np.sin(xx / 7.0)).astype(np.float16),
                "G": (0.5 + 0.2 * np.cos(yy / 5.0)).astype(np.float16),
                "B": (0.3 + 0.1 * np.sin((xx + yy) / 9.0)).astype(np.float16)}
        chans = [("B", 1), ("G", 1), ("R", 1)]   # alphabetical file order
        payload = self._encode_dwa(chans, data, w, h)
        assert len(payload) < w * h * 2 * 3, "test chunk must compress"
        p = TestExrPxr24B44._mk_exr(chans, 8, w, h, [payload], tmp_path,
                                    "dwa_rgb.exr")
        img = read_exr(p)
        exp = self._expected_dct(["R", "G", "B"], data, w, h)
        # read_exr reorders B,G,R files to R,G,B planes
        for k in range(3):
            np.testing.assert_allclose(img[..., k],
                                       exp[k].astype(np.float32),
                                       rtol=4e-3, atol=1e-4)

    def test_dwa_rle_and_unknown_channels(self, tmp_path):
        """A (HALF) classifies to RLE byte-planes; Z (FLOAT) matches no rule
        -> UNKNOWN raw deflate. Both must decode bit-exactly."""
        from rustlight_tpu.utils.image import read_exr
        rng = np.random.default_rng(7)
        w, h = 32, 9
        # quantized/ramp content so RLE+deflate genuinely shrink the chunk
        a = (rng.integers(0, 8, (h, w)) * 0.125).astype(np.float16)
        z = (np.arange(h * w, dtype=np.float32).reshape(h, w) * 0.25) \
            .astype("<f4")
        chans = [("A", 1), ("Z", 2)]
        payload = self._encode_dwa(chans, {"A": a, "Z": z}, w, h)
        assert len(payload) < w * h * (2 + 4), "test chunk must compress"
        p = TestExrPxr24B44._mk_exr(chans, 8, w, h, [payload], tmp_path,
                                    "dwa_rle_unk.exr")
        img = read_exr(p)
        np.testing.assert_array_equal(img[..., 0], a.astype(np.float32))
        np.testing.assert_array_equal(img[..., 1], z)

    def test_dwa_deflate_ac_and_edge_blocks(self, tmp_path):
        """acCompression=DEFLATE variant + a ragged 11x6 image (edge blocks
        crop on decode) on a standalone FLOAT DCT channel ('Y' FLOAT rides
        the half pipeline, lossy)."""
        from rustlight_tpu.utils.image import read_exr
        w, h = 33, 10
        xx = np.arange(w, dtype=np.float32)[None, :]
        yy = np.arange(h, dtype=np.float32)[:, None]
        y = 0.8 + 0.5 * np.sin(xx / 6.0) * np.cos(yy / 4.0)
        payload = self._encode_dwa([("Y", 2)], {"Y": y}, w, h, ac_scheme=1)
        assert len(payload) < w * h * 4, "test chunk must compress"
        p = TestExrPxr24B44._mk_exr([("Y", 2)], 9, w, h, [payload],
                                    tmp_path, "dwa_deflate.exr")
        img = read_exr(p)
        exp = self._expected_dct(["Y"], {"Y": y}, w, h)[0].astype(np.float32)
        np.testing.assert_allclose(img[..., 0], exp, rtol=4e-3, atol=1e-4)

    def test_unknown_compression_raises(self, tmp_path):
        from rustlight_tpu.utils.image import read_exr
        p = TestExrPxr24B44._mk_exr([("G", 1)], 10, 4, 4, [b"\0"],
                                    tmp_path, "unknown_comp.exr")
        with pytest.raises(NotImplementedError):
            read_exr(p)

    def test_dwa_multi_chunk_dwaa(self, tmp_path):
        """DWAA = 32-scanline chunks: a 32x64 image needs two chunks, each
        an independent DWA block."""
        from rustlight_tpu.utils.image import read_exr
        w, h = 32, 64
        yy, xx = np.mgrid[:h, :w].astype(np.float32)
        g = (0.5 + 0.4 * np.sin(xx / 8.0 + yy / 11.0)).astype(np.float16)
        p0 = self._encode_dwa([("G", 1)], {"G": g[:32]}, w, 32)
        p1 = self._encode_dwa([("G", 1)], {"G": g[32:]}, w, 32)
        assert max(len(p0), len(p1)) < w * 32 * 2, "chunks must compress"
        p = TestExrPxr24B44._mk_exr([("G", 1)], 8, w, h, [p0, p1],
                                    tmp_path, "dwa_two_chunks.exr")
        img = read_exr(p)
        e0 = self._expected_dct(["G"], {"G": g[:32]}, w, 32)[0]
        e1 = self._expected_dct(["G"], {"G": g[32:]}, w, 32)[0]
        exp = np.concatenate([e0, e1]).astype(np.float32)
        np.testing.assert_allclose(img[..., 0], exp, rtol=4e-3, atol=1e-4)


class TestExrDecodeFuzz:
    """Randomized cross-format decode fuzz: random sizes and contents
    through the independent spec encoders (PXR24 / B44 / B44A / DWA) and
    through write_exr for the read+write formats — every OpenEXR scanline
    compression exercised on shapes the hand-picked vectors don't cover."""

    def test_write_formats_random_shapes(self, tmp_path):
        from rustlight_tpu.utils import image as rimage
        rng = np.random.default_rng(123)
        for i, comp in enumerate(["none", "rle", "zips", "zip", "piz"]):
            h, w = int(rng.integers(1, 70)), int(rng.integers(1, 70))
            img = rng.normal(size=(h, w, 3)).astype(np.float32)
            p = tmp_path / f"f_{comp}_{i}.exr"
            rimage.write_exr(p, img, compression=comp)
            np.testing.assert_array_equal(rimage.read_exr(p), img)

    def test_pxr24_random_half_shapes(self, tmp_path):
        import zlib
        from rustlight_tpu.utils.image import read_exr, _EXR_LINES_PER_BLOCK
        rng = np.random.default_rng(7)
        for trial in range(6):
            h, w = int(rng.integers(1, 40)), int(rng.integers(2, 80))
            if trial < 3:     # smooth-ish halfs: small diffs, compressible
                base = rng.integers(0, 1 << 12)
                vals = ((base + np.cumsum(
                    rng.integers(-3, 4, h * w)).reshape(h, w)) & 0x7FFF) \
                    .astype(np.uint16).view(np.float16)
            else:             # full-entropy halfs: forces raw fallback
                vals = (rng.integers(0, 1 << 15, (h, w)).astype(np.uint16)) \
                    .view(np.float16)
            lpb = _EXR_LINES_PER_BLOCK[5]
            payloads, n_compressed = [], 0
            for y0 in range(0, h, lpb):
                ny = min(lpb, h - y0)
                parts, raw_parts = [], []
                for y in range(y0, y0 + ny):
                    u = vals[y].view(np.uint16).astype(np.int64)
                    raw_parts.append(vals[y].tobytes())
                    diff = np.diff(np.concatenate([[0], u])) & 0xFFFF
                    parts.append(np.concatenate(
                        [(diff >> 8) & 0xFF, diff & 0xFF]).astype(np.uint8))
                z = zlib.compress(np.concatenate(parts).tobytes())
                raw = b"".join(raw_parts)
                # real writers fall back to raw when zlib doesn't win
                if len(z) < len(raw):
                    payloads.append(z)
                    n_compressed += 1
                else:
                    payloads.append(raw)
            if trial < 3:
                assert n_compressed > 0   # smooth trials must hit PXR24
            p = TestExrPxr24B44._mk_exr([("G", 1)], 5, w, h, payloads,
                                        tmp_path, f"fz_pxr24_{trial}.exr")
            img = read_exr(p)
            np.testing.assert_array_equal(img[..., 0],
                                          vals.astype(np.float32))

    def test_dwa_random_smooth_images(self, tmp_path):
        from rustlight_tpu.utils.image import read_exr
        rng = np.random.default_rng(17)
        for trial in range(3):
            h = int(rng.integers(4, 40))
            w = int(rng.integers(4, 60))
            yy, xx = np.mgrid[:h, :w].astype(np.float32)
            f = float(rng.uniform(3, 12))
            g = (0.4 + 0.35 * np.sin(xx / f + yy / (f + 2))) \
                .astype(np.float16)
            payload = TestExrDwa._encode_dwa([("G", 1)], {"G": g}, w, h)
            if len(payload) >= w * h * 2:
                continue        # writers would store this chunk raw
            p = TestExrPxr24B44._mk_exr([("G", 1)], 8, w, h, [payload],
                                        tmp_path, f"fz_dwa_{trial}.exr")
            img = read_exr(p)
            exp = TestExrDwa._expected_dct(["G"], {"G": g}, w, h)[0]
            np.testing.assert_allclose(img[..., 0],
                                       exp.astype(np.float32),
                                       rtol=4e-3, atol=1e-4)

    def test_b44a_mixed_constant_and_packed_tiles(self, tmp_path):
        """B44A with interleaved 3-byte constant and 14-byte packed tiles —
        the variable-stride offset scan's hard case."""
        from rustlight_tpu.utils.image import read_exr
        rng = np.random.default_rng(31)
        w, h = 32, 16
        base = np.float16(0.5).view(np.uint16)
        img = np.zeros((h, w), np.uint16)
        payload = b""
        for ti, y0 in enumerate(range(0, h, 4)):
            for x0 in range(0, w, 4):
                if (ti + x0 // 4) % 2 == 0:
                    v = np.uint16(base + 2 * ((ti + x0) % 5))
                    img[y0:y0 + 4, x0:x0 + 4] = v
                    mono = TestExrPxr24B44._monotonic(v)
                    payload += bytes([mono >> 8, mono & 0xFF, 0xFC])
                else:
                    tile = (base + (rng.integers(0, 16, (4, 4)) * 2)
                            .astype(np.uint16))
                    img[y0:y0 + 4, x0:x0 + 4] = tile
                    payload += TestExrPxr24B44._pack14(tile)
        assert len(payload) < w * h * 2
        p = TestExrPxr24B44._mk_exr([("G", 1)], 7, w, h, [payload],
                                    tmp_path, "fz_b44a.exr")
        out = read_exr(p)
        np.testing.assert_array_equal(out[..., 0],
                                      img.view(np.float16)
                                      .astype(np.float32))

    def test_b44_truncated_payload_raises_codec_error(self, tmp_path):
        """A B44 payload cut mid-tile-grid must raise the codec ValueError,
        not an IndexError from the marker read running off the array."""
        import pytest
        from rustlight_tpu.utils.image import read_exr
        base = np.float16(0.5).view(np.uint16)
        tile = (base + np.arange(16, dtype=np.uint16)
                .reshape(4, 4) * 2)
        # 8x4 image = 2 tiles; ship one full tile + a single stray byte
        payload = TestExrPxr24B44._pack14(tile) + b"\x00"
        p = TestExrPxr24B44._mk_exr([("G", 1)], 6, 8, 4, [payload],
                                    tmp_path, "b44_trunc.exr")
        with pytest.raises(ValueError, match="truncated"):
            read_exr(p)

    def test_dwa_ac_batch_matches_scalar(self):
        """The vectorized AC token expansion is bit-identical to the scalar
        reference loop on randomized streams (runs, literals, EOBs, slot-64
        exits, trailing unconsumed tokens)."""
        from rustlight_tpu.utils.image import (_dwa_unrle_ac,
                                               _dwa_unrle_ac_batch)
        rng = np.random.default_rng(23)
        for trial in range(60):
            nb = int(rng.integers(1, 10))
            toks = []
            for _ in range(nb):
                dct = 1
                while dct < 64:
                    kind = rng.integers(0, 3)
                    if kind == 0:
                        toks.append(0xFF00)
                        break
                    if kind == 1:
                        r = int(rng.integers(1, 70))
                        toks.append(0xFF00 + min(r, 255))
                        dct += min(r, 255)
                    else:
                        toks.append(int(rng.integers(0, 0xFF00)))
                        dct += 1
            toks += list(rng.integers(0, 0xFF00,
                                      size=int(rng.integers(0, 5))))
            ac = np.array(toks, np.uint16)
            ref = np.zeros((nb, 64), np.uint16)
            cur = 0
            for b in range(nb):
                cur = _dwa_unrle_ac(ac, cur, ref[b])
            out, cur2 = _dwa_unrle_ac_batch(ac, 0, nb)
            assert cur2 == cur
            np.testing.assert_array_equal(out, ref)

    def test_dwa_ac_batch_underrun(self):
        import pytest
        from rustlight_tpu.utils.image import _dwa_unrle_ac_batch
        with pytest.raises(ValueError, match="underrun"):
            _dwa_unrle_ac_batch(np.array([1, 2, 3], np.uint16), 0, 1)
        with pytest.raises(ValueError, match="underrun"):
            _dwa_unrle_ac_batch(np.array([0xFF00], np.uint16), 0, 2)

    def test_dwa_ac_encode_batch_matches_scalar(self):
        """The vectorized write-side AC run-length tokenizer is bit-identical
        to the scalar spec loop (literals, interior runs merged to one token,
        EOB only for blocks ending in a trailing zero run — a FULL block must
        not be followed by EOB because the decoder stops at slot 64 without
        consuming a token; same loop as the in-test spec encoder)."""
        from rustlight_tpu.utils.image import _dwa_rle_ac_batch

        def scalar(flat):
            # same pre-tokenization guard as the batch coder: halfs in
            # 0xFF00-0xFFFF (negative NaNs) collide with the run/EOB token
            # prefix and are canonicalized to quiet NaN 0x7E00 (ADVICE r4)
            flat = np.where((flat & np.uint16(0xFF00)) == np.uint16(0xFF00),
                            np.uint16(0x7E00), flat)
            out = []
            for b in range(flat.shape[0]):
                row = flat[b]
                toks = []
                dct = 1
                while dct < 64:
                    if row[dct] != 0:
                        toks.append(int(row[dct]))
                        dct += 1
                        continue
                    run = 1
                    while dct + run < 64 and row[dct + run] == 0:
                        run += 1
                    if dct + run >= 64:
                        toks.append(0xFF00)                  # EOB
                        break
                    toks.append(0xFF00 | run)
                    dct += run
                out.append(np.asarray(toks, np.uint16))
            return (np.concatenate(out) if out
                    else np.empty(0, np.uint16))

        rng = np.random.default_rng(5)
        for _ in range(40):
            nb = int(rng.integers(1, 30))
            flat = rng.integers(0, 6, (nb, 64)).astype(np.uint16)
            flat[flat < 4] = 0                       # zero-heavy, real runs
            flat *= rng.integers(1, 20000, (nb, 64)).astype(np.uint16)
            got = _dwa_rle_ac_batch(flat)
            np.testing.assert_array_equal(got, scalar(flat))
        # edges: all-zero row (EOB only), dense row, single trailing run
        edge = np.zeros((3, 64), np.uint16)
        edge[1, :] = 7
        edge[2, 1] = 5
        np.testing.assert_array_equal(_dwa_rle_ac_batch(edge), scalar(edge))


class TestExrWriteEncoders:
    """Write-side PXR24/B44/B44A/DWAA/DWAB encoders (VERDICT r3 item 9:
    write_exr must accept the full OpenEXR scanline enum 0-9, reference
    src/structure.rs:490-642). Every test is an encode->decode round trip
    through the production read path; where the format is conditionally
    lossless (PXR24 HALF, B44 at shift 0, B44A constant tiles) the trip is
    asserted bit-exact."""

    @staticmethod
    def _float24_ref(img):
        # scalar transliteration of OpenEXR's floatToFloat24 (round to
        # nearest; NaN keeps a nonzero 24-bit mantissa)
        out = np.empty(img.size, np.uint32)
        for i, u in enumerate(img.view(np.uint32).ravel()):
            u = int(u)
            s, e, m = u & 0x80000000, u & 0x7F800000, u & 0x007FFFFF
            if e == 0x7F800000:
                if m:
                    m24 = m >> 8
                    i24 = (e >> 8) | m24 | (0 if m24 else 1)
                else:
                    i24 = e >> 8
            else:
                i24 = ((e | m) + (m & 0x80)) >> 8
            out[i] = ((s >> 8) | i24) << 8
        return out.reshape(img.shape).view(np.float32)

    def test_pxr24_float_rounds_like_openexr(self, tmp_path):
        from rustlight_tpu.utils import image as rimage
        rng = np.random.default_rng(41)
        img = rng.gamma(1.5, 1.0, (19, 23, 3)).astype(np.float32)
        # exercise the special cases (ADVICE r4): Inf, canonical NaN, and a
        # NaN whose top 15 mantissa bits are zero (must NOT collapse to Inf)
        img[0, 0, 0] = np.inf
        img[0, 1, 0] = -np.inf
        img[0, 2, 0] = np.nan
        img.view(np.uint32)[0, 3, 0] = 0x7F800001    # low-mantissa NaN
        img.view(np.uint32)[0, 4, 0] = 0xFF800055    # negative low NaN
        p = tmp_path / "pxr24_f.exr"
        rimage.write_exr(p, img, compression="pxr24")
        exp = self._float24_ref(img)
        got = rimage.read_exr(p)
        np.testing.assert_array_equal(got.view(np.uint32),
                                      exp.view(np.uint32))
        assert np.isnan(got[0, 2, 0]) and np.isnan(got[0, 3, 0])
        assert np.isnan(got[0, 4, 0]) and np.isinf(got[0, 0, 0])

    def test_pxr24_half_lossless(self, tmp_path):
        from rustlight_tpu.utils import image as rimage
        rng = np.random.default_rng(42)
        for shape in ((9, 11, 3), (33, 7, 3), (64, 64, 3)):
            img = rng.normal(size=shape).astype(np.float32)
            p = tmp_path / f"pxr24_h_{shape[0]}.exr"
            rimage.write_exr(p, img, half=True, compression="pxr24")
            exp = img.astype(np.float16).astype(np.float32)
            np.testing.assert_array_equal(rimage.read_exr(p), exp)

    def test_b44_small_delta_tiles_lossless(self, tmp_path):
        """At shift 0 the 6-bit chained-delta quantization is exact, so any
        image whose 4x4 tiles keep chained monotonic-half deltas within
        [-32, 31] must round-trip bit-exactly — a strong structural check
        on _b44_pack14_batch's bit stream, not just a tolerance band."""
        from rustlight_tpu.utils import image as rimage
        rng = np.random.default_rng(43)
        base = np.float16(0.5).view(np.uint16).astype(np.int64)
        for w, h in ((16, 8), (13, 9), (4, 4)):
            bits = (base + rng.integers(-14, 15, (h, w, 3))) \
                .astype(np.uint16)
            img = bits.view(np.float16).astype(np.float32)
            p = tmp_path / f"b44_{w}x{h}.exr"
            rimage.write_exr(p, img, half=True, compression="b44")
            np.testing.assert_array_equal(rimage.read_exr(p), img)

    def test_b44_hard_tiles_bounded_error(self, tmp_path):
        """Full-range random halfs force large shifts; the reconstruction
        chains against the RECONSTRUCTED predecessor, so per-pixel error in
        the monotonic-u16 domain stays < 2^shift <= 2^13 and never
        accumulates across the tile."""
        from rustlight_tpu.utils import image as rimage
        from rustlight_tpu.utils.image import (_b44_to_monotonic,
                                               _b44_pack14_batch)
        rng = np.random.default_rng(44)
        bits = rng.integers(0, 0x7C00, (12, 20, 3)).astype(np.uint16)
        img = bits.view(np.float16).astype(np.float32)
        p = tmp_path / "b44_hard.exr"
        rimage.write_exr(p, img, half=True, compression="b44")
        out = rimage.read_exr(p).astype(np.float16).view(np.uint16)
        a = _b44_to_monotonic(bits).astype(np.int64)
        b = _b44_to_monotonic(out).astype(np.int64)
        assert np.abs(a - b).max() < (1 << 13)
        # idempotence: a second trip through the codec is a fixed point
        p2 = tmp_path / "b44_hard2.exr"
        rimage.write_exr(p2, out.view(np.float16).astype(np.float32),
                         half=True, compression="b44")
        np.testing.assert_array_equal(
            rimage.read_exr(p2).astype(np.float16).view(np.uint16), out)
        # and the packer must refuse nothing: every tile found a shift
        tiles = _b44_to_monotonic(bits[:4, :4, 0]).reshape(1, 16)
        assert _b44_pack14_batch(tiles).shape == (1, 14)

    def test_b44a_constant_tiles_exact_and_smaller(self, tmp_path):
        from rustlight_tpu.utils import image as rimage
        img = np.full((16, 16, 3), 0.25, np.float32)
        # a non-constant tile whose chained deltas stay within the shift-0
        # band, so B44A stays bit-exact while mixing 3- and 14-byte tiles
        bits = np.float16(0.25).view(np.uint16).astype(np.int64)
        wiggle = (bits + np.arange(48).reshape(4, 4, 3) % 7) \
            .astype(np.uint16)
        img[4:8, 4:8] = wiggle.view(np.float16).astype(np.float32)
        pa = tmp_path / "b44a.exr"
        pb = tmp_path / "b44.exr"
        rimage.write_exr(pa, img, half=True, compression="b44a")
        rimage.write_exr(pb, img, half=True, compression="b44")
        exp = img.astype(np.float16).astype(np.float32)
        np.testing.assert_array_equal(rimage.read_exr(pa), exp)
        # 3-byte constant tiles must beat the 14-byte packed encoding
        assert pa.stat().st_size < pb.stat().st_size

    def test_dwa_smooth_rgb_roundtrip(self, tmp_path):
        """DWAA + DWAB on a smooth RGB image: the R/G/B channels ride the
        forward CSC + DCT path as one set; round-trip error is bounded by
        the half quantization of the DCT coefficients."""
        from rustlight_tpu.utils import image as rimage
        rng = np.random.default_rng(45)
        for comp, (h, w) in (("dwaa", (37, 29)), ("dwab", (70, 18))):
            yy, xx = np.mgrid[:h, :w].astype(np.float32)
            f = float(rng.uniform(4, 9))
            img = np.stack([
                0.4 + 0.3 * np.sin(xx / f + yy / (f + 1) + c)
                for c in range(3)], axis=-1).astype(np.float32)
            p = tmp_path / f"{comp}.exr"
            rimage.write_exr(p, img, half=True, compression=comp)
            out = rimage.read_exr(p)
            np.testing.assert_allclose(out, img, rtol=3e-2, atol=3e-3)

    def test_dwa_high_contrast_full_blocks(self, tmp_path):
        """Hard edges drive nonzero AC up to zigzag slot 63 (a FULL block).
        The decoder ends such a block at slot 64 without consuming a token,
        so the encoder must not append EOB after it — a stray EOB desyncs
        every later block (shipped-encoder bug caught on a real cbox render:
        emitter pixels came back ~0 with maxerr 18.6)."""
        from rustlight_tpu.utils import image as rimage
        img = np.full((16, 16, 3), 0.2, np.float32)
        img[4:8, 4:12] = np.array([18.4, 15.6, 8.0], np.float32)  # light quad
        for comp in ("dwaa", "dwab"):
            p = tmp_path / f"hc_{comp}.exr"
            rimage.write_exr(p, img, half=True, compression=comp)
            out = rimage.read_exr(p)
            err = np.abs(out - img) / (np.abs(img) + 0.1)
            assert float(err.max()) < 0.05, (
                f"{comp}: relative error {float(err.max()):.3f} — "
                "AC stream desynced on full blocks?")

    def test_dwa_nan_pixels_do_not_desync(self, tmp_path):
        """ADVICE r4: a NaN pixel cast float32->float16 can produce a half in
        0xFF00-0xFFFF whose bit pattern collides with the AC zero-run/EOB
        token prefix; un-sanitized it desyncs every later block.  The encoder
        canonicalizes such coefficients to quiet NaN — the file must decode
        with all NON-NaN-adjacent blocks intact."""
        from rustlight_tpu.utils import image as rimage
        rng = np.random.default_rng(7)
        img = rng.gamma(1.2, 0.7, (40, 40, 3)).astype(np.float32)
        # negative NaN with high payload -> half bits in 0xFF01-0xFFFF
        img.view(np.uint32)[2, 3, 1] = 0xFFC00123
        img.view(np.uint32)[2, 4, 1] = 0xFF800001
        for comp in ("dwaa", "dwab"):
            p = tmp_path / f"nan_{comp}.exr"
            rimage.write_exr(p, img, half=True, compression=comp)
            out = rimage.read_exr(p)            # must not raise / desync
            # blocks away from the NaN block round-trip within DWA tolerance
            clean = np.ones((40, 40), bool)
            clean[0:8, 0:8] = False             # the 8x8 block holding NaNs
            ref = img.astype(np.float16).astype(np.float32)
            err = np.abs(out - ref) / (np.abs(ref) + 0.1)
            assert float(err[clean].max()) < 0.05, f"{comp} desynced"

    def test_tiled_write_rejects_bad_dims(self, tmp_path):
        from rustlight_tpu.utils import image as rimage
        img = np.zeros((8, 8, 3), np.float32)
        for bad in ((0, 16), (16, 0), (-4, 16), (16, -1)):
            with pytest.raises(ValueError, match="positive tile dims"):
                rimage.write_exr(tmp_path / "bad.exr", img, tiled=bad)

    def test_dwa_grayscale_and_multichunk(self, tmp_path):
        """Single 'Y' channel is LOSSY_DCT without a CSC set; 70 rows under
        DWAA (32-line blocks) exercises the multi-chunk write path."""
        from rustlight_tpu.utils import image as rimage
        yy, xx = np.mgrid[:70, :22].astype(np.float32)
        img = (0.3 + 0.25 * np.cos(xx / 5.0 + yy / 7.0)).astype(np.float32)
        p = tmp_path / "dwaa_y.exr"
        rimage.write_exr(p, img[..., None].repeat(1, axis=2), half=True,
                         compression="dwaa")
        out = rimage.read_exr(p)
        np.testing.assert_allclose(out[..., 0], img, rtol=3e-2, atol=3e-3)

    def test_all_write_formats_random_shapes(self, tmp_path):
        """Fuzz: every compression enum 0-9 through write_exr on random
        shapes; lossless formats bit-exact, lossy ones finite and close in
        the half domain."""
        from rustlight_tpu.utils import image as rimage
        rng = np.random.default_rng(46)
        for comp in ("none", "rle", "zips", "zip", "piz", "pxr24",
                     "b44", "b44a", "dwaa", "dwab"):
            h, w = int(rng.integers(1, 70)), int(rng.integers(1, 70))
            img = (rng.random((h, w, 3)).astype(np.float32) * 0.9 + 0.05)
            p = tmp_path / f"fz_{comp}.exr"
            rimage.write_exr(p, img, half=True, compression=comp)
            out = rimage.read_exr(p)
            exp = img.astype(np.float16).astype(np.float32)
            if comp in ("b44", "b44a", "dwaa", "dwab"):
                assert out.shape == exp.shape and np.isfinite(out).all()
                assert np.abs(out - exp).max() < 0.25
            else:
                np.testing.assert_array_equal(out, exp)


def test_resize_camera_rederives_projection():
    """resize_camera must rebuild the projection for the new aspect; a bare
    dataclass replace keeps the old aspect baked into sample_to_camera
    (anamorphic renders of non-square scenes)."""
    from rustlight_tpu.scene import make_camera, resize_camera, look_at
    to_world = look_at((0.0, 1.0, 4.0), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0))
    wide = make_camera(448, 336, fov=40.0, to_world=to_world, fov_axis="x")
    resized = resize_camera(wide, 128, 128)
    fresh = make_camera(128, 128, fov=40.0, to_world=to_world, fov_axis="x")
    np.testing.assert_array_equal(resized.sample_to_camera,
                                  fresh.sample_to_camera)
    np.testing.assert_array_equal(resized.camera_to_sample,
                                  fresh.camera_to_sample)
    assert (resized.width, resized.height) == (128, 128)
    # the bug being guarded against: replace() keeps the 448x336 aspect
    bare = wide.replace(width=128, height=128)
    assert not np.array_equal(bare.sample_to_camera, fresh.sample_to_camera)


class TestExrVersionFlags:
    def test_deep_multipart_rejected_loudly(self, tmp_path):
        """Deep (0x800) must raise instead of misparsing the chunk table; a
        multipart flag (0x1000) on a single-part layout is malformed (its
        one header lacks the required chunkCount) and raises too; a tiled
        flag (0x200) with no 'tiles' attribute is also malformed."""
        import struct
        from rustlight_tpu.utils import image as rimage
        p = tmp_path / "ok.exr"
        rimage.write_exr(p, np.ones((4, 4, 3), np.float32))
        raw = bytearray(p.read_bytes())
        (v,) = struct.unpack_from("<I", raw, 4)
        struct.pack_into("<I", raw, 4, v | 0x800)
        q = tmp_path / "f800.exr"
        q.write_bytes(bytes(raw))
        with pytest.raises(NotImplementedError, match="deep"):
            rimage.read_exr(q)
        struct.pack_into("<I", raw, 4, v | 0x1000)
        q = tmp_path / "f1000.exr"
        q.write_bytes(bytes(raw))
        with pytest.raises(ValueError, match="chunkCount"):
            rimage.read_exr(q)
        struct.pack_into("<I", raw, 4, v)   # restore
        (v,) = struct.unpack_from("<I", raw, 4)
        struct.pack_into("<I", raw, 4, v | 0x200)
        q = tmp_path / "tiled_noattr.exr"
        q.write_bytes(bytes(raw))
        with pytest.raises(ValueError, match="tiles"):
            rimage.read_exr(q)
        struct.pack_into("<I", raw, 4, v)
        # long-names (0x400) leaves the header layout unchanged: still reads
        (v,) = struct.unpack_from("<I", raw, 4)
        struct.pack_into("<I", raw, 4, v | 0x400)
        q = tmp_path / "longnames.exr"
        q.write_bytes(bytes(raw))
        np.testing.assert_array_equal(rimage.read_exr(q),
                                      np.ones((4, 4, 3), np.float32))


class TestExrTiled:
    """Single-part TILED files (version flag 0x200): one chunk per tile
    through the same codecs, level-0 scatter; the reference reads these
    via OpenEXR (structure.rs:490-642), and B44 in particular is designed
    for tiled access."""

    def test_tiled_roundtrip_all_codecs(self, tmp_path):
        from rustlight_tpu.utils import image as rimage
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 4, (37, 29, 3)).astype(np.float32)  # ragged
        for comp in ("none", "rle", "zips", "zip", "piz", "pxr24",
                     "b44", "b44a", "dwaa", "dwab"):
            pt = tmp_path / f"t_{comp}.exr"
            ps = tmp_path / f"s_{comp}.exr"
            rimage.write_exr(pt, img, compression=comp, tiled=(16, 16))
            rimage.write_exr(ps, img, compression=comp)
            back_t = rimage.read_exr(pt)
            back_s = rimage.read_exr(ps)
            if comp in ("dwaa", "dwab"):
                # DCT blocks partition differently across tile boundaries:
                # not bit-equal to the scanline encode, but both stay
                # within the codec's lossy bound
                np.testing.assert_allclose(back_t, img, atol=0.05)
            else:
                np.testing.assert_array_equal(back_t, back_s)

    def test_tiled_single_channel_half(self, tmp_path):
        from rustlight_tpu.utils import image as rimage
        img = np.linspace(0, 2, 20 * 24).reshape(20, 24).astype(np.float32)
        p = tmp_path / "y.exr"
        rimage.write_exr(p, img, half=True, compression="zip",
                         tiled=(8, 8))
        np.testing.assert_array_equal(
            rimage.read_exr(p)[:, :, 0], img.astype(np.float16))

    def test_mipmap_reads_level_zero_only(self, tmp_path):
        """A MIPMAP_LEVELS file (mode byte 1) stores every level's tiles in
        the offset table; the reader must return the level-(0,0) image and
        skip the rest. Built byte-by-byte from the format spec."""
        import struct
        from rustlight_tpu.utils import image as rimage

        w = h = 8
        tx = ty = 4
        img0 = np.arange(w * h, dtype=np.float32).reshape(h, w)
        img1 = np.full((4, 4), 99.0, np.float32)        # level 1 (decoy)
        img2 = np.full((2, 2), 77.0, np.float32)
        img3 = np.full((1, 1), 55.0, np.float32)

        chlist = b"Y\0" + struct.pack("<iiii", 2, 0, 1, 1) + b"\0"
        header = b"\x76\x2f\x31\x01" + struct.pack("<i", 2 | 0x200)
        header += rimage._exr_attr(b"channels", b"chlist", chlist)
        header += rimage._exr_attr(b"compression", b"compression", b"\0")
        box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
        header += rimage._exr_attr(b"dataWindow", b"box2i", box)
        header += rimage._exr_attr(b"displayWindow", b"box2i", box)
        header += rimage._exr_attr(b"lineOrder", b"lineOrder", b"\0")
        header += rimage._exr_attr(b"tiles", b"tiledesc",
                                   struct.pack("<IIB", tx, ty, 1))  # MIPMAP
        header += b"\0"

        chunks = []
        for lv, im in ((0, img0), (1, img1), (2, img2), (3, img3)):
            lw, lh = im.shape[1], im.shape[0]
            for dy in range((lh + ty - 1) // ty):
                for dx in range((lw + tx - 1) // tx):
                    bw = min(tx, lw - dx * tx)
                    bny = min(ty, lh - dy * ty)
                    raw = b"".join(
                        im[y, dx * tx:dx * tx + bw].astype("<f4").tobytes()
                        for y in range(dy * ty, dy * ty + bny))
                    chunks.append(struct.pack("<iiiii", dx, dy, lv, lv,
                                              len(raw)) + raw)
        n = len(chunks)
        assert n == rimage._exr_tile_chunk_count(w, h, tx, ty, 1)
        table_off = len(header) + 8 * n
        offsets, acc = [], table_off
        for c in chunks:
            offsets.append(acc)
            acc += len(c)
        p = tmp_path / "mip.exr"
        p.write_bytes(header + struct.pack("<%dQ" % n, *offsets)
                      + b"".join(chunks))
        out = rimage.read_exr(p)
        np.testing.assert_array_equal(out[:, :, 0], img0)
        assert not (out == 99.0).any()


class TestExrMultipart:
    """Multipart single-part read (VERDICT r4 item 9; OpenEXR >= 2.0
    layout: header sequence terminated by an empty header, a chunkCount
    attribute per part, one offset table per part, every chunk prefixed
    with its i32 part number — ImfMultiPartInputFile). The container
    below is an independent in-test spec writer (same anchoring
    discipline as the PIZ/B44/DWA encoders): it never calls write_exr."""

    @staticmethod
    def _attr(name, typ, val):
        import struct
        return name + b"\0" + typ + b"\0" + struct.pack("<i", len(val)) + val

    @classmethod
    def _part_header(cls, name, ptype, channels, comp, w, h, n_chunks):
        import struct
        chl = b""
        for cn, pt in channels:
            chl += cn.encode() + b"\0" + struct.pack("<iiii", pt, 0, 1, 1)
        chl += b"\0"
        hdr = cls._attr(b"channels", b"chlist", chl)
        hdr += cls._attr(b"compression", b"compression", bytes([comp]))
        dw = struct.pack("<iiii", 0, 0, w - 1, h - 1)
        hdr += cls._attr(b"dataWindow", b"box2i", dw)
        hdr += cls._attr(b"displayWindow", b"box2i", dw)
        hdr += cls._attr(b"name", b"string", name.encode())
        hdr += cls._attr(b"type", b"string", ptype.encode())
        hdr += cls._attr(b"chunkCount", b"int", struct.pack("<i", n_chunks))
        hdr += cls._attr(b"lineOrder", b"lineOrder", b"\0")
        hdr += cls._attr(b"pixelAspectRatio", b"float",
                         struct.pack("<f", 1.0))
        return hdr + b"\0"

    @classmethod
    def _mk_multipart(cls, parts, tmp_path, fname):
        """parts: list of dicts {name, type, channels, comp, w, h,
        payloads (list of (y_or_none, bytes))}; deep parts pass
        payloads=[] and get a zero chunkCount."""
        import struct
        from rustlight_tpu.utils.image import _EXR_LINES_PER_BLOCK
        out = b"\x76\x2f\x31\x01" + struct.pack("<i", 2 | 0x1000)
        for p in parts:
            out += cls._part_header(p["name"], p["type"], p["channels"],
                                    p["comp"], p["w"], p["h"],
                                    len(p["payloads"]))
        out += b"\0"                          # empty header = sequence end
        table_base = len(out)
        n_total = sum(len(p["payloads"]) for p in parts)
        body_base = table_base + 8 * n_total
        body = b""
        tables = []
        for pi, p in enumerate(parts):
            lpb = _EXR_LINES_PER_BLOCK.get(p["comp"], 32)
            offs = []
            for ci, pl in enumerate(p["payloads"]):
                offs.append(body_base + len(body))
                body += struct.pack("<iii", pi, ci * lpb, len(pl)) + pl
            tables.append(offs)
        for offs in tables:
            out += b"".join(struct.pack("<Q", o) for o in offs)
        out += body
        fp = tmp_path / fname
        fp.write_bytes(out)
        return fp

    @staticmethod
    def _raw_payloads(img, comp_lpb):
        """Uncompressed single-channel HALF scanline payloads."""
        h = img.shape[0]
        out = []
        for y0 in range(0, h, comp_lpb):
            rows = img[y0:y0 + comp_lpb].astype(np.float16)
            out.append(rows.tobytes())
        return out

    def test_two_scanline_parts(self, tmp_path):
        from rustlight_tpu.utils import image as rimage
        rng = np.random.default_rng(21)
        a = rng.normal(size=(7, 9)).astype(np.float32)
        b = rng.normal(size=(5, 9)).astype(np.float32)
        parts = [
            dict(name="beauty", type="scanlineimage",
                 channels=[("G", 1)], comp=0, w=9, h=7,
                 payloads=self._raw_payloads(a, 1)),
            dict(name="depth", type="scanlineimage",
                 channels=[("G", 1)], comp=0, w=9, h=5,
                 payloads=self._raw_payloads(b, 1)),
        ]
        fp = self._mk_multipart(parts, tmp_path, "mp2.exr")
        # default = first non-deep part
        np.testing.assert_array_equal(
            rimage.read_exr(fp)[:, :, 0], a.astype(np.float16))
        # by index and by name
        np.testing.assert_array_equal(
            rimage.read_exr(fp, part=1)[:, :, 0], b.astype(np.float16))
        np.testing.assert_array_equal(
            rimage.read_exr(fp, part="depth")[:, :, 0],
            b.astype(np.float16))
        np.testing.assert_array_equal(
            rimage.read_exr(fp, part="beauty")[:, :, 0],
            a.astype(np.float16))

    def test_deep_part_skipped_and_rejected(self, tmp_path):
        from rustlight_tpu.utils import image as rimage
        rng = np.random.default_rng(22)
        img = rng.normal(size=(4, 6)).astype(np.float32)
        parts = [
            dict(name="deeppart", type="deepscanline",
                 channels=[("G", 1)], comp=0, w=6, h=4, payloads=[]),
            dict(name="flat", type="scanlineimage",
                 channels=[("G", 1)], comp=0, w=6, h=4,
                 payloads=self._raw_payloads(img, 1)),
        ]
        fp = self._mk_multipart(parts, tmp_path, "mpdeep.exr")
        # default selection skips the deep part
        np.testing.assert_array_equal(
            rimage.read_exr(fp)[:, :, 0], img.astype(np.float16))
        # explicitly selecting the deep part raises loudly
        with pytest.raises(NotImplementedError, match="deep"):
            rimage.read_exr(fp, part="deeppart")
        with pytest.raises(NotImplementedError, match="deep"):
            rimage.read_exr(fp, part=0)

    def test_compressed_parts_and_errors(self, tmp_path):
        """zip-compressed multipart part (reuses the single-part codec
        through the shared chunk decoder) + missing-part errors."""
        import zlib
        from rustlight_tpu.utils import image as rimage
        from rustlight_tpu.utils.image import _EXR_LINES_PER_BLOCK
        rng = np.random.default_rng(23)
        img = rng.normal(size=(37, 8)).astype(np.float32)
        lpb = _EXR_LINES_PER_BLOCK[3]
        payloads = []
        for y0 in range(0, 37, lpb):
            raw = img[y0:y0 + lpb].astype(np.float16).tobytes()
            # EXR-zip predictor: interleave split + delta encode
            arr = np.frombuffer(raw, np.uint8).astype(np.int16)
            half = (len(arr) + 1) // 2
            inter = np.zeros_like(arr)
            inter[:half], inter[half:] = arr[0::2], arr[1::2]
            d = np.empty_like(inter)
            d[0] = inter[0]
            d[1:] = (inter[1:] - inter[:-1] + 128 + 256) % 256
            z = zlib.compress(d.astype(np.uint8).tobytes())
            payloads.append(z if len(z) < len(raw) else raw)
        parts = [dict(name="z", type="scanlineimage", channels=[("G", 1)],
                      comp=3, w=8, h=37, payloads=payloads)]
        fp = self._mk_multipart(parts, tmp_path, "mpz.exr")
        np.testing.assert_array_equal(
            rimage.read_exr(fp)[:, :, 0], img.astype(np.float16))
        with pytest.raises(ValueError, match="not found"):
            rimage.read_exr(fp, part="nope")
        with pytest.raises(ValueError, match="out of range"):
            rimage.read_exr(fp, part=3)

    def test_multipart_fuzz_shapes(self, tmp_path):
        """Random part counts / shapes / block counts; every part must
        round-trip under any selection."""
        from rustlight_tpu.utils import image as rimage
        rng = np.random.default_rng(24)
        for trial in range(8):
            n_parts = int(rng.integers(1, 5))
            parts, imgs = [], []
            for pi in range(n_parts):
                w = int(rng.integers(1, 20))
                h = int(rng.integers(1, 20))
                img = rng.normal(size=(h, w)).astype(np.float32)
                imgs.append(img)
                parts.append(dict(name=f"p{pi}", type="scanlineimage",
                                  channels=[("G", 1)], comp=0, w=w, h=h,
                                  payloads=self._raw_payloads(img, 1)))
            fp = self._mk_multipart(parts, tmp_path, f"fz{trial}.exr")
            for pi in range(n_parts):
                got = rimage.read_exr(fp, part=pi)[:, :, 0]
                np.testing.assert_array_equal(
                    got, imgs[pi].astype(np.float16), err_msg=f"t{trial}p{pi}")
