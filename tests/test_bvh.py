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

    def test_skip_links_terminate(self):
        sd = cornell_box(8, 8).compile()
        bvh = build_bvh(sd.geom, max_leaf=2)
        skips = np.asarray(bvh.skip)
        assert (skips >= -1).all() and (skips < bvh.n_nodes).all()
        # preorder skip links always point forward
        idx = np.arange(bvh.n_nodes)
        fw = skips[skips >= 0] > idx[skips >= 0]
        assert fw.all()
