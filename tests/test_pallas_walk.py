"""Pallas tile-walk intersector (accel/pallas_walk.py) parity tests.

The walk kernel is the TPU production path for large scenes; on this CPU
test backend it runs in Pallas interpret mode, checked against the flat
dense intersector (the brute-force oracle, reference NaiveAcceleration
src/accel.rs:14-77).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from rustlight_tpu.scene.geometry import TriMesh, build_geometry_tables
from rustlight_tpu.accel.dense import _intersect_impl
from rustlight_tpu.accel.pallas_walk import (
    build_walk_tables, intersect_walk, occluded_walk)


@pytest.fixture(scope="module")
def soup():
    rng = np.random.default_rng(7)
    nt = 1500
    c = rng.uniform(-1, 1, (nt, 3)).astype(np.float32)
    v0 = c + rng.normal(0, .06, (nt, 3)).astype(np.float32)
    v1 = c + rng.normal(0, .06, (nt, 3)).astype(np.float32)
    v2 = c + rng.normal(0, .06, (nt, 3)).astype(np.float32)
    verts = np.concatenate([v0, v1, v2], 0).astype(np.float32)
    idx = np.arange(3 * nt).reshape(3, nt).T.astype(np.int32)
    geom = build_geometry_tables(
        [TriMesh(vertices=verts, indices=idx, material=0)], [-1])
    wt = build_walk_tables(geom)

    nr = 512
    o = rng.uniform(-2.5, -1.8, (nr, 3)).astype(np.float32)
    targ = c[rng.integers(0, nt, nr)]
    d = targ - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return geom, wt, jnp.asarray(o), jnp.asarray(d)


def test_closest_hit_matches_dense(soup):
    geom, wt, o, d = soup
    nr = o.shape[0]
    ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                          jnp.full(nr, jnp.inf), False)
    out = intersect_walk(wt, o, d, interpret=True)
    assert np.array_equal(np.asarray(ref.hit), np.asarray(out.hit))
    both = np.asarray(ref.hit)
    assert both.mean() > 0.5, "test rays should mostly hit"
    np.testing.assert_allclose(np.asarray(out.t)[both],
                               np.asarray(ref.t)[both], rtol=1e-5, atol=1e-6)
    assert (np.asarray(ref.tri)[both] == np.asarray(out.tri)[both]).all()
    np.testing.assert_allclose(np.asarray(out.u)[both],
                               np.asarray(ref.u)[both], rtol=1e-4, atol=1e-5)


def test_any_hit_matches_dense(soup):
    geom, wt, o, d = soup
    nr = o.shape[0]
    tfar = jnp.full(nr, 2.2)
    ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4), tfar,
                          True)
    out = occluded_walk(wt, o, d, tfar=tfar, interpret=True)
    assert np.array_equal(np.asarray(ref), np.asarray(out))


def test_hbm_variant_matches_dense(soup, monkeypatch):
    """The double-buffered HBM-DMA kernels (>262k-tri scenes) produce the
    same hits; forced here by shrinking the VMEM residency threshold."""
    import rustlight_tpu.accel.pallas_walk as W
    geom, _, o, d = soup
    monkeypatch.setattr(W, "MAX_VMEM_CLUSTERS", 1)
    wt = W.build_walk_tables(geom)
    assert not wt.resident and wt.ids is None
    nr = o.shape[0]
    ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                          jnp.full(nr, jnp.inf), False)
    out = W.intersect_walk(wt, o, d, interpret=True)
    assert np.array_equal(np.asarray(ref.hit), np.asarray(out.hit))
    both = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(out.t)[both],
                               np.asarray(ref.t)[both], rtol=1e-5, atol=1e-6)
    assert (np.asarray(ref.tri)[both] == np.asarray(out.tri)[both]).all()
    occ_ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                              jnp.full(nr, 2.2), True)
    occ = W.occluded_walk(wt, o, d, tfar=jnp.full(nr, 2.2), interpret=True)
    assert np.array_equal(np.asarray(occ_ref), np.asarray(occ))


def test_wide_mode_matches_dense(soup):
    """Wide pop path (> 2^14-cluster scenes: unpacked entries + argmin
    recovery) must stay bit-identical to the dense oracle; forced on the
    small scene via wide=True, both table variants."""
    import rustlight_tpu.accel.pallas_walk as W
    geom, wt, o, d = soup
    nr = o.shape[0]
    ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                          jnp.full(nr, jnp.inf), False)
    out = intersect_walk(wt, o, d, interpret=True, wide=True)
    assert np.array_equal(np.asarray(ref.hit), np.asarray(out.hit))
    both = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(out.t)[both],
                               np.asarray(ref.t)[both], rtol=1e-5, atol=1e-6)
    assert (np.asarray(ref.tri)[both] == np.asarray(out.tri)[both]).all()
    occ_ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                              jnp.full(nr, 2.2), True)
    occ = occluded_walk(wt, o, d, tfar=jnp.full(nr, 2.2), interpret=True,
                        wide=True)
    assert np.array_equal(np.asarray(occ_ref), np.asarray(occ))


def test_cluster_cap_lifted():
    """build_walk_tables accepts > 2^14 clusters (multi-M-tri scenes) and
    walk_supported admits them up to _MAX_CLUSTERS (VERDICT round-1 item:
    the 2^14 cap dropped such scenes to the minutes-slow XLA fallback)."""
    import rustlight_tpu.accel.pallas_walk as W
    assert W._MAX_CLUSTERS > (1 << W._ID_BITS)
    # a fake wide table passes the support gate (backend check aside)
    wt = W.WalkTables(n_tris=4_200_000, n_clusters=33024, n_real=32800,
                      resident=False)
    assert wt.n_clusters > (1 << W._ID_BITS)
    assert wt.n_clusters <= W._MAX_CLUSTERS


class TestPairWalk:
    """Per-ray pair scheduling (accel/pair_walk.py) vs the dense oracle —
    including the cutoff-fallback path (km=2 forces overflow on most rays)."""

    def test_closest_matches_dense(self, soup):
        from rustlight_tpu.accel.pair_walk import intersect_pairs
        geom, wt, o, d = soup
        nr = o.shape[0]
        ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                              jnp.full(nr, jnp.inf), False)
        for km in (8, 2):
            out = intersect_pairs(wt, o, d, interpret=True, km=km)
            assert np.array_equal(np.asarray(ref.hit), np.asarray(out.hit)), km
            both = np.asarray(ref.hit)
            np.testing.assert_allclose(np.asarray(out.t)[both],
                                       np.asarray(ref.t)[both],
                                       rtol=1e-5, atol=1e-6)
            assert (np.asarray(ref.tri)[both]
                    == np.asarray(out.tri)[both]).all(), km
            np.testing.assert_allclose(np.asarray(out.u)[both],
                                       np.asarray(ref.u)[both],
                                       rtol=1e-4, atol=1e-5)

    def test_anyhit_matches_dense(self, soup):
        from rustlight_tpu.accel.pair_walk import occluded_pairs
        geom, wt, o, d = soup
        nr = o.shape[0]
        tfar = jnp.full(nr, 2.2)
        ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                              tfar, True)
        for km in (8, 2):
            out = occluded_pairs(wt, o, d, tfar=tfar, interpret=True, km=km)
            assert np.array_equal(np.asarray(ref), np.asarray(out)), km

    def test_bounded_tfar_and_padding(self, soup):
        from rustlight_tpu.accel.pair_walk import intersect_pairs
        geom, wt, o, d = soup
        o2, d2 = o[:300], d[:300]
        tfar = jnp.full(300, 2.0)
        ref = _intersect_impl(geom.inter_rows, o2, d2, jnp.full(300, 1e-4),
                              tfar, False)
        out = intersect_pairs(wt, o2, d2, tfar=tfar, interpret=True)
        assert np.array_equal(np.asarray(ref.hit), np.asarray(out.hit))
        both = np.asarray(ref.hit)
        np.testing.assert_allclose(np.asarray(out.t)[both],
                                   np.asarray(ref.t)[both],
                                   rtol=1e-5, atol=1e-6)


def test_ray_padding_and_bounded_tfar(soup):
    """Non-multiple-of-tile ray counts and finite tfar behave."""
    geom, wt, o, d = soup
    o2, d2 = o[:300], d[:300]
    tfar = jnp.full(300, 2.0)
    ref = _intersect_impl(geom.inter_rows, o2, d2, jnp.full(300, 1e-4),
                          tfar, False)
    out = intersect_walk(wt, o2, d2, tfar=tfar, interpret=True)
    assert np.array_equal(np.asarray(ref.hit), np.asarray(out.hit))
    both = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(out.t)[both],
                               np.asarray(ref.t)[both], rtol=1e-5, atol=1e-6)


def test_treelet_packing_invariants(soup):
    """Treelet re-pack (build_walk_tables): clusters tile the primitive
    array contiguously in preorder, fill exceeds 50% on average (maximality
    of the cut), and every cluster AABB tightly contains its triangles."""
    geom, wt, _, _ = soup
    ids = np.asarray(wt.ids)                         # [C, K] global tri ids
    real_rows = ids[ids.max(axis=1) >= 0]
    counts = (real_rows >= 0).sum(axis=1)
    assert counts.sum() == geom.n_tris
    # ids unique and complete
    flat = real_rows[real_rows >= 0]
    assert len(np.unique(flat)) == geom.n_tris
    # >50% average fill (guaranteed >50% pairwise; average is stronger)
    assert counts.mean() > 0.5 * ids.shape[1]
    # per-cluster bounds contain the member triangles
    lo = np.asarray(wt.lo); hi = np.asarray(wt.hi)   # [3, C]
    v0 = np.asarray(geom.v0[: geom.n_tris])
    e1 = np.asarray(geom.e1[: geom.n_tris])
    e2 = np.asarray(geom.e2[: geom.n_tris])
    for ci in range(ids.shape[0]):
        mem = ids[ci][ids[ci] >= 0]
        if len(mem) == 0:
            continue
        pts = np.concatenate([v0[mem], v0[mem] + e1[mem], v0[mem] + e2[mem]])
        assert (pts >= lo[:, ci] - 1e-5).all() and (pts <= hi[:, ci] + 1e-5).all()


def test_hier_mode_matches_dense(soup, monkeypatch):
    """Two-level hierarchical walk (> 2^14-cluster scenes: packed super
    pops + lazy per-super child entries) must stay bit-identical to the
    dense oracle; forced on the small scene via hier=True over HBM tables
    (hier production scenes are always non-resident)."""
    import rustlight_tpu.accel.pallas_walk as W
    geom, _, o, d = soup
    monkeypatch.setattr(W, "MAX_VMEM_CLUSTERS", 1)
    wt = W.build_walk_tables(geom)
    assert not wt.resident and wt.n_sup >= 1 and wt.lo_h is not None
    nr = o.shape[0]
    ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                          jnp.full(nr, jnp.inf), False)
    out = W.intersect_walk(wt, o, d, interpret=True, hier=True)
    assert np.array_equal(np.asarray(ref.hit), np.asarray(out.hit))
    both = np.asarray(ref.hit)
    assert both.mean() > 0.5
    np.testing.assert_allclose(np.asarray(out.t)[both],
                               np.asarray(ref.t)[both], rtol=1e-5, atol=1e-6)
    assert (np.asarray(ref.tri)[both] == np.asarray(out.tri)[both]).all()
    np.testing.assert_allclose(np.asarray(out.u)[both],
                               np.asarray(ref.u)[both], rtol=1e-4, atol=1e-5)
    occ_ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                              jnp.full(nr, 2.2), True)
    occ = W.occluded_walk(wt, o, d, tfar=jnp.full(nr, 2.2), interpret=True,
                          hier=True)
    assert np.array_equal(np.asarray(occ_ref), np.asarray(occ))


def test_hier_super_tables_invariants(soup):
    """Super AABBs union exactly their real children; grouped child tables
    mirror the flat cluster tables; pads stay distant points."""
    import rustlight_tpu.accel.pallas_walk as W
    geom, wt, o, d = soup
    c, ns = wt.n_real, wt.n_sup
    assert ns == -(-c // W.SUP)
    lo_flat = wt.lo_h.reshape(3, -1)[:, :wt.n_clusters]
    hi_flat = wt.hi_h.reshape(3, -1)[:, :wt.n_clusters]
    assert np.array_equal(lo_flat, wt.lo)
    assert np.array_equal(hi_flat, wt.hi)
    for s in range(ns):
        r0, r1 = s * W.SUP, min((s + 1) * W.SUP, c)
        assert np.array_equal(wt.slo[:, s], wt.lo[:, r0:r1].min(1))
        assert np.array_equal(wt.shi[:, s], wt.hi[:, r0:r1].max(1))
    assert (wt.slo[:, ns:] == W._BIG).all()


def test_hier_multi_super_traversal(soup, monkeypatch):
    """Force MANY supers (SUP=4 children each) so the outer super loop,
    per-super child expansion, and cross-super termination all run on a
    scene whose production build would fit one super."""
    import rustlight_tpu.accel.pallas_walk as W
    geom, _, o, d = soup
    monkeypatch.setattr(W, "MAX_VMEM_CLUSTERS", 1)
    monkeypatch.setattr(W, "SUP", 4)
    monkeypatch.setattr(W, "_CHILD_BITS", 2)
    monkeypatch.setattr(W, "K", 128)   # small clusters: force >= 3 supers
    wt = W.build_walk_tables(geom)
    assert wt.n_sup >= 3, wt.n_sup
    nr = o.shape[0]
    ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                          jnp.full(nr, jnp.inf), False)
    out = W.intersect_walk(wt, o, d, interpret=True, hier=True)
    assert np.array_equal(np.asarray(ref.hit), np.asarray(out.hit))
    both = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(out.t)[both],
                               np.asarray(ref.t)[both], rtol=1e-5, atol=1e-6)
    assert (np.asarray(ref.tri)[both] == np.asarray(out.tri)[both]).all()
    occ_ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                              jnp.full(nr, 2.2), True)
    occ = W.occluded_walk(wt, o, d, tfar=jnp.full(nr, 2.2), interpret=True,
                          hier=True)
    assert np.array_equal(np.asarray(occ_ref), np.asarray(occ))


def test_mxu_tritest_matches_dense(soup, monkeypatch):
    """RUSTLIGHT_TPU_MXU_TRITEST=1 folds the two [R,4]x[4,3K] affine
    products onto the MXU; hits must stay dense-oracle-exact (t within the
    f32-dot tolerance).

    The flag is read at TRACE time, and _walk_impl's jit cache is keyed on
    shapes/static-args only — calling with the same 512-ray shape the other
    tests already traced would silently reuse the VPU executable and test
    nothing. Use a ray count unique to this test so the monkeypatched flag
    is live when the kernel traces (and assert the branch was taken)."""
    import rustlight_tpu.accel.pallas_walk as W
    geom, wt, o, d = soup
    monkeypatch.setattr(W, "MXU_TRITEST", True)
    taken = []
    orig = W._test_rows

    def spy(*a, **k):
        taken.append(W.MXU_TRITEST)
        return orig(*a, **k)

    monkeypatch.setattr(W, "_test_rows", spy)
    o, d = o[:320], d[:320]          # unique shape -> fresh trace
    nr = o.shape[0]
    ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                          jnp.full(nr, jnp.inf), False)
    out = W.intersect_walk(wt, o, d, interpret=True)
    assert taken and all(taken), "MXU branch never traced (stale jit cache?)"
    assert np.array_equal(np.asarray(ref.hit), np.asarray(out.hit))
    both = np.asarray(ref.hit)
    assert both.mean() > 0.5
    np.testing.assert_allclose(np.asarray(out.t)[both],
                               np.asarray(ref.t)[both], rtol=1e-5, atol=1e-6)
    assert (np.asarray(ref.tri)[both] == np.asarray(out.tri)[both]).all()
    occ_ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                              jnp.full(nr, 2.2), True)
    occ = W.occluded_walk(wt, o, d, tfar=jnp.full(nr, 2.2), interpret=True)
    assert np.array_equal(np.asarray(occ_ref), np.asarray(occ))


def test_subtile_schedule_matches_dense(soup):
    """RUSTLIGHT_TPU_SUBTILES / sub=N splits each ray tile into N groups
    with private entry heaps and termination caps (_closest_kernel_sub).
    Measured slower on-chip (see the kernel comment) but kept opt-in; its
    hits must stay EXACTLY dense-oracle-equal at every split factor."""
    geom, wt, o, d = soup
    nr = o.shape[0]
    ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                          jnp.full(nr, jnp.inf), False)
    occ_ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                              jnp.full(nr, 2.2), True)
    both = np.asarray(ref.hit)
    for sub in (2, 4, 8):
        out = intersect_walk(wt, o, d, interpret=True, sub=sub)
        assert np.array_equal(np.asarray(ref.hit), np.asarray(out.hit)), sub
        np.testing.assert_allclose(np.asarray(out.t)[both],
                                   np.asarray(ref.t)[both], rtol=1e-5,
                                   atol=1e-6)
        assert (np.asarray(ref.tri)[both] == np.asarray(out.tri)[both]).all()
        occ = occluded_walk(wt, o, d, tfar=jnp.full(nr, 2.2),
                            interpret=True, sub=sub)
        assert np.array_equal(np.asarray(occ_ref), np.asarray(occ)), sub


def test_degenerate_and_duplicate_triangles(monkeypatch):
    """Zero-area (collapsed) and exactly-duplicated triangles must not
    produce NaN entries or walk/dense divergence — degenerate rows appear in
    real exports (T-junction collapses, double-welded faces)."""
    import rustlight_tpu.accel.pallas_walk as W
    rng = np.random.default_rng(11)
    nt = 600
    c = rng.uniform(-1, 1, (nt, 3)).astype(np.float32)
    v0 = c + rng.normal(0, .05, (nt, 3)).astype(np.float32)
    v1 = c + rng.normal(0, .05, (nt, 3)).astype(np.float32)
    v2 = c + rng.normal(0, .05, (nt, 3)).astype(np.float32)
    v1[:40] = v0[:40]                      # zero-area: two identical verts
    v2[40:60] = v0[40:60] = v1[40:60]      # fully collapsed to a point
    verts = np.concatenate([v0, v1, v2], 0).astype(np.float32)
    idx = np.arange(3 * nt).reshape(3, nt).T.astype(np.int32)
    idx = np.concatenate([idx, idx[100:140]], 0)   # exact duplicates
    geom = build_geometry_tables(
        [TriMesh(vertices=verts, indices=idx, material=0)], [-1])
    wt = W.build_walk_tables(geom)
    nr = 256
    o = rng.uniform(-2.5, -1.8, (nr, 3)).astype(np.float32)
    targ = c[rng.integers(0, nt, nr)]
    d = targ - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                          jnp.full(nr, jnp.inf), False)
    out = W.intersect_walk(wt, o, d, interpret=True)
    assert np.array_equal(np.asarray(ref.hit), np.asarray(out.hit))
    both = np.asarray(ref.hit)
    assert both.mean() > 0.4
    np.testing.assert_allclose(np.asarray(out.t)[both],
                               np.asarray(ref.t)[both], rtol=1e-5, atol=1e-6)
    assert np.isfinite(np.asarray(out.t)[both]).all()


def test_sparse_visit_matches_dense(soup):
    """RUSTLIGHT_TPU_SPARSE_VISIT / sparse=True keeps the production tile
    schedule (one heap, one pop sequence) but narrows each visit's triangle
    test to the rays whose slab entry overlaps the popped cluster, gathered
    and scattered with exact one-hot matmuls (_closest_kernel_sparse).
    Results must stay EXACTLY dense-oracle-equal; both the sparse branch
    (divergent tiles) and the dense fallback (cnt > SPARSE_CAP) are live on
    this soup because coherent 512-ray wavefronts mix both regimes."""
    geom, wt, o, d = soup
    nr = o.shape[0]
    ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                          jnp.full(nr, jnp.inf), False)
    out = intersect_walk(wt, o, d, interpret=True, sparse=True)
    # fetch everything eagerly: late fetches of interpret-mode outputs have
    # deadlocked intermittently on the CPU backend with the axon plugin
    oh, ot = np.asarray(out.hit), np.asarray(out.t)
    otri, ou, ov = np.asarray(out.tri), np.asarray(out.u), np.asarray(out.v)
    assert np.array_equal(np.asarray(ref.hit), oh)
    both = np.asarray(ref.hit)
    assert both.mean() > 0.5
    np.testing.assert_allclose(ot[both], np.asarray(ref.t)[both],
                               rtol=1e-5, atol=1e-6)
    assert (np.asarray(ref.tri)[both] == otri[both]).all()
    occ_ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                              jnp.full(nr, 2.2), True)
    occ = occluded_walk(wt, o, d, tfar=jnp.full(nr, 2.2),
                        interpret=True, sparse=True)
    assert np.array_equal(np.asarray(occ_ref), np.asarray(occ))


def test_inert_ray_compaction_parity(soup):
    """The opt-in inert-compaction key (RUSTLIGHT_TPU_COMPACT_INERT=1,
    resolved at import; the kernel takes it as the compact_inert STATIC
    arg so this test cannot be poisoned by earlier cached traces; measured
    on-chip it is neutral-to-negative, see _sort_key docstring) must not
    change any result: a wavefront with 50% interleaved inert lanes — the
    shape visible(mask=...) and dead persistent lanes produce every bounce
    — matches the dense oracle per lane, and the inert lanes report
    miss."""
    import rustlight_tpu.accel.pallas_walk as W
    geom, wt, o, d = soup
    nr = o.shape[0]
    inert = (np.arange(nr) % 2) == 0
    tfar = jnp.where(jnp.asarray(inert), 0.0, jnp.inf)
    ref = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                          jnp.full(nr, jnp.inf), False)
    out = W._walk_impl(wt, o, d, jnp.full(nr, 1e-4), tfar, False,
                       interpret=True, compact_inert=True)
    live = ~inert
    assert not np.asarray(out.hit)[inert].any()
    assert np.array_equal(np.asarray(ref.hit)[live], np.asarray(out.hit)[live])
    both = live & np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(out.t)[both],
                               np.asarray(ref.t)[both], rtol=1e-5, atol=1e-6)
    assert (np.asarray(ref.tri)[both] == np.asarray(out.tri)[both]).all()
    # the key actually segregates: every inert lane sorts after every live
    # (the inert bit rides the MAJOR key of the two-key sort)
    kmaj, _ = W._sort_key(wt, o, d, tfar)
    kmaj = np.asarray(kmaj)
    assert kmaj[inert].min() > kmaj[live].max()
    # any-hit variant too
    occ = W._walk_impl(wt, o, d, jnp.full(nr, 1e-4), tfar, True,
                       interpret=True, compact_inert=True)
    assert not np.asarray(occ)[inert].any()
    ref_occ = _intersect_impl(geom.inter_rows, o, d, jnp.full(nr, 1e-4),
                              jnp.where(jnp.asarray(inert), 0.0, 1e8), True)
    assert np.array_equal(np.asarray(ref_occ)[live], np.asarray(occ)[live])


def test_sort_key_point_origin_wavefront_uses_fine_direction_bits():
    """The r4 two-key coherence sort (major = octant|origin-morton5,
    minor = |d|-morton5): for a point-origin wavefront the major key
    collapses to the octant and the FINE minor key must spread the rays
    over many direction cones — the property that halved the coherent
    tile union in tools/perf/sortkey_lab.py. Also pins the int32 pair
    contract (x64 stays off) and that origins still dominate the major
    key for spread-origin wavefronts."""
    import numpy as np
    import jax.numpy as jnp
    import rustlight_tpu.accel.pallas_walk as W

    wt = W.WalkTables(
        n_tris=0, n_clusters=0,
        world_lo=jnp.zeros(3), world_hi=jnp.ones(3) * 10.0)
    rng = np.random.default_rng(5)
    n = 4096
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    # point origin: major = octant only (8 values), minor spreads
    o_pt = np.full((n, 3), 5.0, np.float32)
    kmaj, kmin = W._sort_key(wt, jnp.asarray(o_pt), jnp.asarray(d))
    assert kmaj.dtype == jnp.int32 and kmin.dtype == jnp.int32
    assert len(np.unique(np.asarray(kmaj))) == 8
    per_octant_cones = [
        len(np.unique(np.asarray(kmin)[np.asarray(kmaj) == v]))
        for v in np.unique(np.asarray(kmaj))]
    assert min(per_octant_cones) > 32   # fine cones, not the old 3-bit 512
    # spread origins: the major key separates spatial cells within octants
    o_sp = rng.uniform(0, 10, (n, 3)).astype(np.float32)
    kmaj2, _ = W._sort_key(wt, jnp.asarray(o_sp), jnp.asarray(d))
    assert len(np.unique(np.asarray(kmaj2))) > 1000


def test_incidence_sort_matches_morton_sort(soup):
    """The set-similarity (incidence) coherence key is a pure permutation:
    closest-hit AND any-hit results must be bit-identical to the morton
    key's (VERDICT r4 item 1 — the key only reorders rays before the
    lane-id un-sort)."""
    geom, wt, o, d = soup
    nr = o.shape[0]
    a = intersect_walk(wt, o, d, interpret=True, inc_sort=False)
    b = intersect_walk(wt, o, d, interpret=True, inc_sort=True)
    assert np.array_equal(np.asarray(a.hit), np.asarray(b.hit))
    assert np.array_equal(np.asarray(a.t), np.asarray(b.t))
    assert np.array_equal(np.asarray(a.tri), np.asarray(b.tri))
    tfar = jnp.full(nr, 2.2)
    oa = occluded_walk(wt, o, d, tfar=tfar, interpret=True, inc_sort=False)
    ob = occluded_walk(wt, o, d, tfar=tfar, interpret=True, inc_sort=True)
    assert np.array_equal(np.asarray(oa), np.asarray(ob))
