"""BVH build + traversal vs brute-force dense intersection (the reference's
NaiveAcceleration-vs-BVH oracle, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustlight_tpu.accel import intersect_rays
from rustlight_tpu.accel.bvh import build_bvh, intersect_bvh, _load_native
from rustlight_tpu.models import cornell_box, furnace_scene


def _random_rays(n, center, radius, seed=0):
    k = jax.random.PRNGKey(seed)
    o = center + jax.random.normal(k, (n, 3)) * radius
    d = jax.random.normal(jax.random.fold_in(k, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


class TestBVH:
    def test_native_builder_compiles(self):
        assert _load_native() is not None, "C++ BVH builder failed to compile"

    @pytest.mark.parametrize("scene_fn,center,radius", [
        (lambda: cornell_box(16, 16), (278.0, 273.0, 100.0), 200.0),
        (lambda: furnace_scene(8, 8), (0.0, 0.0, 0.0), 2.0),
    ])
    def test_matches_dense(self, scene_fn, center, radius):
        sd = scene_fn().compile()
        bvh = build_bvh(sd.geom)
        o, d = _random_rays(512, jnp.asarray(center), radius)
        ref = intersect_rays(sd.geom, o, d)
        got = intersect_bvh(bvh, o, d)
        np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
        m = np.asarray(ref.hit)
        np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m],
                                   rtol=1e-4, atol=1e-3)
        # triangle ids must agree except for shared-edge ties
        tri_match = (np.asarray(got.tri)[m] == np.asarray(ref.tri)[m])
        assert tri_match.mean() > 0.98

    def test_sweep_builder_matches_dense(self):
        """Full sweep-SAH build (the reference's exact algorithm,
        src/accel.rs:115-199) must traverse to the same hits as the dense
        oracle and the binned build."""
        rng = np.random.RandomState(7)
        from rustlight_tpu.scene.geometry import (TriMesh,
                                                  build_geometry_tables)
        nt = 600
        c = rng.uniform(-5, 5, (nt, 3)).astype(np.float32)
        v = (c[:, None, :]
             + rng.uniform(-0.4, 0.4, (nt, 3, 3))).astype(np.float32)
        idx = np.arange(3 * nt, dtype=np.int32).reshape(nt, 3)
        geom = build_geometry_tables(
            [TriMesh(vertices=v.reshape(-1, 3), indices=idx, material=0)],
            [-1])
        o, d = _random_rays(256, jnp.zeros(3), 6.0, seed=3)
        ref = intersect_rays(geom, o, d)
        got = intersect_bvh(build_bvh(geom, builder="sweep"), o, d)
        np.testing.assert_array_equal(np.asarray(got.hit),
                                      np.asarray(ref.hit))
        m = np.asarray(ref.hit)
        np.testing.assert_allclose(np.asarray(got.t)[m],
                                   np.asarray(ref.t)[m], rtol=1e-4,
                                   atol=1e-3)

    def test_skip_links_terminate(self):
        sd = cornell_box(8, 8).compile()
        bvh = build_bvh(sd.geom, max_leaf=2)
        skips = np.asarray(bvh.skip)
        assert (skips >= -1).all() and (skips < bvh.n_nodes).all()
        # preorder skip links always point forward
        idx = np.arange(bvh.n_nodes)
        fw = skips[skips >= 0] > idx[skips >= 0]
        assert fw.all()


class TestClustered:
    """Two-level clustered intersector (accel/clustered.py) — the large-scene
    TPU path — must agree with the flat dense scan."""

    def _scene(self):
        from rustlight_tpu.scene import (Scene, make_camera, look_at,
                                         make_sphere, make_quad)
        from rustlight_tpu import bsdfs as B
        sc = Scene()
        m = sc.add_material(B.diffuse((0.7,) * 3))
        rng = np.random.RandomState(0)
        for i in range(16):
            c = rng.uniform(-8, 8, 3)
            c[1] = abs(c[1]) + 0.5
            sc.add_mesh(make_sphere(c, 0.9, material=m, n_theta=8, n_phi=7))
        sc.add_mesh(make_quad((-20, 0, -20), (20, 0, -20), (20, 0, 20),
                              (-20, 0, 20), material=m))
        sc.add_mesh(make_quad((-3, 18, -3), (3, 18, -3), (3, 18, 3),
                              (-3, 18, 3), material=m, emission=(30,) * 3))
        sc.camera = make_camera(24, 24, fov=60.0,
                                to_world=look_at((0, 8, -25), (0, 4, 0),
                                                 (0, 1, 0)))
        return sc

    def test_matches_dense(self):
        import jax
        import jax.numpy as jnp
        from rustlight_tpu.accel import intersect_rays
        from rustlight_tpu.accel.clustered import (build_clusters,
                                                   intersect_clustered,
                                                   occluded_clustered)
        from rustlight_tpu.accel.dense import occluded_rays
        sd = self._scene().compile()
        assert sd.geom.clusters is not None   # above CLUSTER_THRESHOLD
        n = 4096
        key = jax.random.PRNGKey(1)
        o = jnp.tile(jnp.asarray([[0.0, 8.0, -25.0]]), (n, 1))
        d0 = jax.random.normal(key, (n, 3))
        d = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
        rd = intersect_rays(sd.geom.replace(clusters=None), o, d)
        rc = intersect_clustered(sd.geom.clusters, o, d)
        np.testing.assert_array_equal(np.asarray(rd.hit), np.asarray(rc.hit))
        both = np.asarray(rd.hit)
        np.testing.assert_array_equal(np.asarray(rd.tri)[both],
                                      np.asarray(rc.tri)[both])
        np.testing.assert_allclose(np.asarray(rd.t)[both],
                                   np.asarray(rc.t)[both], rtol=1e-4)
        tfar = jnp.full(n, 12.0)
        tnear = jnp.full(n, 1e-4)
        od = occluded_rays(sd.geom.replace(clusters=None), o, d, tnear, tfar)
        oc = occluded_clustered(sd.geom.clusters, o, d, tnear, tfar)
        np.testing.assert_array_equal(np.asarray(od), np.asarray(oc))

    def test_end_to_end_render_identical(self):
        import rustlight_tpu.scene.geometry as G
        from rustlight_tpu.integrators import IntegratorPathTracing, render
        sc = self._scene()
        sd = sc.compile()
        # pin nee_rr: the tier-aware default (walk tier -> RR on, dense ->
        # off) would otherwise change the ESTIMATOR between the two tiers;
        # this test isolates accel parity
        f1 = render(sd, IntegratorPathTracing(max_depth=3, hard_cap=3,
                                              nee_rr=None),
                    spp=8, seed=0)["primal"]
        thr = G.CLUSTER_THRESHOLD
        try:
            G.CLUSTER_THRESHOLD = 10 ** 9
            sd2 = sc.compile()
        finally:
            G.CLUSTER_THRESHOLD = thr
        f2 = render(sd2, IntegratorPathTracing(max_depth=3, hard_cap=3,
                                              nee_rr=None),
                    spp=8, seed=0)["primal"]
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)


def test_visible_mask_contract():
    """visible(mask=...): masked-off lanes shoot inert tfar=0 rays and
    report True (unoccluded); unmasked lanes are unchanged."""
    import numpy as np
    import jax.numpy as jnp
    from rustlight_tpu.scene.geometry import TriMesh, build_geometry_tables
    from rustlight_tpu.accel import visible

    # one big triangle at z=1 blocking the segment (0,0,0) -> (0,0,2)
    verts = np.asarray([[-5, -5, 1], [5, -5, 1], [0, 5, 1]], np.float32)
    idx = np.asarray([[0, 1, 2]], np.int32)
    geom = build_geometry_tables([TriMesh(vertices=verts, indices=idx,
                                          material=0)], [-1])
    p0 = jnp.zeros((4, 3), jnp.float32)
    p1 = jnp.tile(jnp.asarray([[0.0, 0.0, 2.0]]), (4, 1))
    mask = jnp.asarray([True, False, True, False])
    vis_masked = np.asarray(visible(geom, p0, p1, mask=mask))
    vis_plain = np.asarray(visible(geom, p0, p1))
    assert not vis_plain.any()                       # all blocked
    assert (vis_masked == np.asarray([False, True, False, True])).all()
