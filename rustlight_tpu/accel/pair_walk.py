"""Per-ray traversal via ray x cluster PAIR scheduling.

The tile-walk kernel (pallas_walk.py) is tile-synchronous: every visit
tests all RAY_TILE rays against the popped cluster, so a tile's work scales
with the UNION of its rays' cluster lists. Measured on the 122k-tri
divergent set (round 1): union ~175 clusters per 64-ray tile while each ray
overlaps only ~4 — 40x SIMD waste. This is the reference's per-ray ordered
descent (src/accel.rs:243-288) rebuilt as a TPU schedule:

  1. SHORTLIST (XLA): per ray, the km nearest overlapped clusters by slab
     entry distance (lax.top_k over the [rays, C] entry matrix, chunked),
     plus the (km+1)-th entry as an exactness CUTOFF.
  2. PAIR KERNEL (Pallas): pairs = (ray, cluster) laid out [n, km] and
     flattened; each 64-pair tile loops over its DISTINCT cluster ids only.
     Rays are coherence-sorted first, so consecutive pairs share clusters
     and a 64-pair tile spans ~a dozen distinct clusters instead of 175.
  3. REDUCE (XLA): per-ray min over its km pair results (min t, then min
     global tri id on exact ties — the dense oracle's rule).
  4. FALLBACK: a ray is EXACT iff its best hit beats the cutoff (any
     cluster holding a nearer hit would have entry <= t* <= cutoff and
     hence be in the shortlist). Rays that overflow (finite cutoff) and
     miss or hit beyond it re-trace through the tile walk with all other
     lanes inert (tfar=0) — exactness without dynamic shapes.

Opt-in via RUSTLIGHT_TPU_PAIR_WALK=1 (resident tables only). MEASURED
VERDICT (v5e, 2026-08-17): the schedule LOSES to the tile walk everywhere
— 0.80x/0.54x (coherent/divergent primary sets, km=4; worse at km=8/12)
and 2.2x slower warm end-to-end on the 122k-tri grid render (8.9s -> 20s).
The [rays, C] entry matrix + top_k shortlist costs more than the 40x SIMD
waste it removes: the tile walk's union-visits are VPU-dense triangle
tests, while the shortlist pass is bandwidth-bound on a [R, C] matrix that
the tile walk never materializes per-ray. Kept opt-in as the scaffold for
a future in-kernel per-lane schedule; the tile walk stays production.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import EPSILON
from .dense import RayHit
from .pallas_walk import (
    K, WalkTables, _sort_key, _test_cluster, _walk_impl,
)

PAIR_TILE = 64
KM = 8                   # shortlist length (per-ray overlap averages ~4)
_BIGI = np.int32(2 ** 30)
_INT_MAX = np.int32(2 ** 31 - 1)


# --------------------------------------------------------------- shortlist
def _entries_block(lo, hi, n_real, o, d, tnear, tfar, km):
    """Slab entries of one ray block vs ALL clusters -> (cids [b, km],
    cutoff [b]). Same slab math as pallas_walk._tile_entries, per ray."""
    cp = lo.shape[1]
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d,
                          jnp.where(d >= 0, 1e-12, -1e-12))
    tmin = jnp.full((o.shape[0], cp), -jnp.inf)
    tmax = jnp.full((o.shape[0], cp), jnp.inf)
    for j in range(3):
        t0 = (lo[j][None, :] - o[:, j][:, None]) * inv[:, j][:, None]
        t1 = (hi[j][None, :] - o[:, j][:, None]) * inv[:, j][:, None]
        tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
        tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
    entry = jnp.maximum(tmin, tnear[:, None])
    ciota = lax.broadcasted_iota(jnp.int32, (1, cp), 1)
    ok = ((tmax >= entry) & (entry < tfar[:, None]) & (ciota < n_real)
          & jnp.isfinite(entry))
    ent = jnp.where(ok, entry, jnp.inf)
    neg, idx = lax.top_k(-ent, km + 1)
    ents = -neg
    cids = jnp.where(jnp.isfinite(ents[:, :km]), idx[:, :km], _BIGI)
    cutoff = ents[:, km]
    return cids, cutoff


def _shortlist(wt: WalkTables, o, d, tnear, tfar, km: int, block: int = 4096):
    """Chunked shortlist over the whole wavefront via lax.map (one traced
    block, sequential sweeps — [block, C] transients stay bounded)."""
    n = o.shape[0]
    pad = (-n) % block
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3))], 0)
        d = jnp.concatenate([d, jnp.ones((pad, 3))], 0)
        tnear = jnp.concatenate([tnear, jnp.full(pad, jnp.inf)], 0)
        tfar = jnp.concatenate([tfar, jnp.zeros(pad)], 0)
    nb = o.shape[0] // block

    def one(args):
        ob, db, tnb, tfb = args
        return _entries_block(wt.lo, wt.hi, wt.n_real, ob, db, tnb, tfb, km)

    cids, cutoff = lax.map(one, (o.reshape(nb, block, 3),
                                 d.reshape(nb, block, 3),
                                 tnear.reshape(nb, block),
                                 tfar.reshape(nb, block)))
    return cids.reshape(-1, km)[:n], cutoff.reshape(-1)[:n]


# -------------------------------------------------------------- pair kernel
def _pair_closest_kernel(n_real, rows_ref, ids_ref,
                         o_ref, d_ref, tnear_ref, tcap_ref, cid_ref,
                         t_ref, tri_ref, u_ref, v_ref):
    o = o_ref[:]
    d = d_ref[:]
    tnear = tnear_ref[:, 0]
    tcap = tcap_ref[:, 0]
    cid = cid_ref[:, 0]
    p = o.shape[0]
    kiota = lax.broadcasted_iota(jnp.int32, (p, K), 1)
    cid_m = jnp.where((cid >= 0) & (cid < n_real), cid, _BIGI)
    c0 = jnp.min(cid_m)

    def cond(s):
        nv, c_cur = s[0], s[1]
        return (c_cur < n_real) & (nv < p)

    def body(s):
        nv, c_cur, best_t, best_i, best_u, best_v = s
        t, u, v, valid = _test_cluster(rows_ref, c_cur, o, d, tnear, best_t)
        active = cid_m == c_cur
        tm = jnp.where(valid & active[:, None], t, jnp.inf)
        bt = jnp.min(tm, axis=1)
        better = bt < best_t
        j = jnp.minimum(jnp.min(jnp.where(tm == bt[:, None], kiota, K), 1),
                        K - 1)
        jhot = (kiota == j[:, None]) & better[:, None]
        ids = ids_ref[pl.ds(c_cur, 1), :]                # [1, K]
        tri_new = jnp.sum(jnp.where(jhot, ids, 0), axis=1)
        best_u = jnp.where(better, jnp.sum(jnp.where(jhot, u, 0.0), 1),
                           best_u)
        best_v = jnp.where(better, jnp.sum(jnp.where(jhot, v, 0.0), 1),
                           best_v)
        best_t = jnp.where(better, bt, best_t)
        best_i = jnp.where(better, tri_new, best_i)
        c_next = jnp.min(jnp.where(cid_m > c_cur, cid_m, _BIGI))
        return nv + 1, c_next, best_t, best_i, best_u, best_v

    init = (jnp.int32(0), c0, tcap, jnp.full(p, -1, jnp.int32),
            jnp.zeros(p), jnp.zeros(p))
    _, _, best_t, best_i, best_u, best_v = lax.while_loop(cond, body, init)
    t_ref[:, 0] = jnp.where(best_i >= 0, best_t, jnp.inf)
    tri_ref[:, 0] = best_i
    u_ref[:, 0] = best_u
    v_ref[:, 0] = best_v


def _pair_anyhit_kernel(n_real, rows_ref, ids_ref,
                        o_ref, d_ref, tnear_ref, tfar_ref, cid_ref, occ_ref):
    o = o_ref[:]
    d = d_ref[:]
    tnear = tnear_ref[:, 0]
    tfar = tfar_ref[:, 0]
    cid = cid_ref[:, 0]
    p = o.shape[0]
    cid_m = jnp.where((cid >= 0) & (cid < n_real), cid, _BIGI)
    c0 = jnp.min(cid_m)

    def cond(s):
        nv, c_cur = s[0], s[1]
        return (c_cur < n_real) & (nv < p)

    def body(s):
        nv, c_cur, occ = s
        # occluded pairs shoot inert rays: shrink their range to 0 so their
        # lanes cannot extend the loop's work
        cap = jnp.where(occ > 0, 0.0, tfar)
        _, _, _, valid = _test_cluster(rows_ref, c_cur, o, d, tnear, cap)
        active = cid_m == c_cur
        occ = jnp.maximum(
            occ, jnp.any(valid & active[:, None], axis=1).astype(jnp.int32))
        c_next = jnp.min(jnp.where(cid_m > c_cur, cid_m, _BIGI))
        return nv + 1, c_next, occ

    init = (jnp.int32(0), c0, jnp.zeros(p, jnp.int32))
    _, _, occ = lax.while_loop(cond, body, init)
    occ_ref[:, 0] = occ


# ------------------------------------------------------------------ driver
@partial(jax.jit, static_argnames=("any_hit", "interpret", "km"))
def _pairs_impl(wt: WalkTables, o, d, tnear, tfar, any_hit: bool,
                interpret: bool = False, km: int = KM):
    assert wt.resident, "pair mode needs VMEM-resident tables"
    n = o.shape[0]
    cp = wt.n_clusters
    # sanitize exactly like _walk_impl
    tfar = jnp.where(tfar > 0, tfar, 0.0)
    tnear = jnp.where(tnear >= 0, tnear, jnp.inf)

    # coherence sort: consecutive pairs then share clusters, bounding each
    # pair tile's distinct-cluster count
    kmaj, kmin = _sort_key(wt, jnp.where(jnp.isfinite(o), o, 0.0),
                           jnp.where(jnp.isfinite(d), d, 0.0))
    lane = lax.iota(jnp.int32, n)
    (_, _, o0, o1, o2, d0, d1, d2, tnear, tfar, lane) = lax.sort(
        (kmaj, kmin, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         tnear, tfar, lane), dimension=0, num_keys=2)
    o = jnp.stack([o0, o1, o2], -1)
    d = jnp.stack([d0, d1, d2], -1)

    cids, cutoff = _shortlist(wt, o, d, tnear, tfar, km)

    # pair expansion: [n, km] -> [n*km] (+ tile padding)
    m = n * km
    pad = (-m) % PAIR_TILE
    rep = lambda x: jnp.repeat(x, km, axis=0)
    po, pd = rep(o), rep(d)
    ptn, ptf = rep(tnear), rep(tfar)
    pcid = cids.reshape(-1)
    if pad:
        po = jnp.concatenate([po, jnp.zeros((pad, 3))], 0)
        pd = jnp.concatenate([pd, jnp.ones((pad, 3))], 0)
        ptn = jnp.concatenate([ptn, jnp.full(pad, jnp.inf)], 0)
        ptf = jnp.concatenate([ptf, jnp.zeros(pad)], 0)
        pcid = jnp.concatenate([pcid, jnp.full(pad, _BIGI, jnp.int32)], 0)
    mp = po.shape[0]
    grid = (mp // PAIR_TILE,)

    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    ray2 = pl.BlockSpec((PAIR_TILE, 3), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    row = pl.BlockSpec((PAIR_TILE, 1), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    in_specs = [const((4, cp, 3 * K)), const((cp, K)),
                ray2, ray2, row, row, row]
    args = (wt.rows, wt.ids, po, pd, ptn.reshape(mp, 1), ptf.reshape(mp, 1),
            pcid.reshape(mp, 1))
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=20 * 1024 * 1024 + 4 * cp * 3 * K * 4)

    if any_hit:
        occ = pl.pallas_call(
            partial(_pair_anyhit_kernel, wt.n_real),
            grid=grid, in_specs=in_specs, out_specs=row,
            out_shape=jax.ShapeDtypeStruct((mp, 1), jnp.int32),
            interpret=interpret, compiler_params=cparams,
        )(*args)
        occ = jnp.any(occ[:m, 0].reshape(n, km) > 0, axis=1)
        # overflow rays not yet occluded may be blocked by an unlisted
        # cluster — re-trace them through the tile walk, others inert
        fb = (~occ) & jnp.isfinite(cutoff)
        occ_fb = _walk_impl(wt, o, d, tnear, jnp.where(fb, tfar, 0.0), True,
                            interpret, sort_rays=False)
        occ = occ | (fb & occ_fb)
        _, occ = lax.sort((lane, occ.astype(jnp.int32)), dimension=0,
                          num_keys=1)
        return occ > 0

    t, tri, u, v = pl.pallas_call(
        partial(_pair_closest_kernel, wt.n_real),
        grid=grid, in_specs=in_specs, out_specs=(row, row, row, row),
        out_shape=(
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((mp, 1), jnp.int32),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ),
        interpret=interpret, compiler_params=cparams,
    )(*args)

    # per-ray reduction over the km pair results: min t, then min global
    # tri id on exact ties (dense oracle rule, dense.py winner selection)
    t2 = t[:m, 0].reshape(n, km)
    tri2 = tri[:m, 0].reshape(n, km)
    u2 = u[:m, 0].reshape(n, km)
    v2 = v[:m, 0].reshape(n, km)
    tm = jnp.where(tri2 >= 0, t2, jnp.inf)
    bt = jnp.min(tm, axis=1)
    cand = jnp.where(tm == bt[:, None], tri2, _INT_MAX)
    btri = jnp.min(cand, axis=1)
    sel = (tm == bt[:, None]) & (tri2 == btri[:, None])
    bu = jnp.sum(jnp.where(sel, u2, 0.0), 1)
    bv = jnp.sum(jnp.where(sel, v2, 0.0), 1)
    hit = jnp.isfinite(bt)

    # exactness: a hit at t* <= cutoff is provably closest (any cluster
    # holding a nearer hit has entry <= t* and is in the shortlist);
    # overflow rays (finite cutoff) missing or hitting beyond re-trace
    fb = jnp.isfinite(cutoff) & (bt >= cutoff)
    rh = _walk_impl(wt, o, d, tnear, jnp.where(fb, tfar, 0.0), False,
                    interpret, sort_rays=False)
    bt = jnp.where(fb, rh.t, jnp.where(hit, bt, jnp.inf))
    btri = jnp.where(fb, rh.tri, jnp.where(hit, btri, -1))
    bu = jnp.where(fb, rh.u, bu)
    bv = jnp.where(fb, rh.v, bv)

    _, bt, btri, bu, bv = lax.sort((lane, bt, btri, bu, bv), dimension=0,
                                   num_keys=1)
    hit = btri >= 0
    return RayHit(t=jnp.where(hit, bt, jnp.inf), tri=btri, u=bu, v=bv,
                  hit=hit)


def pair_walk_enabled(wt) -> bool:
    import os
    return (os.environ.get("RUSTLIGHT_TPU_PAIR_WALK") == "1"
            and wt is not None and wt.resident)


def intersect_pairs(wt, o, d, tnear=None, tfar=None, interpret=False,
                    km: int = KM):
    n = o.shape[0]
    if tnear is None:
        tnear = jnp.full(n, EPSILON, jnp.float32)
    if tfar is None:
        tfar = jnp.full(n, jnp.inf, jnp.float32)
    return _pairs_impl(wt, o, d, tnear, tfar, False, interpret, km)


def occluded_pairs(wt, o, d, tnear=None, tfar=None, interpret=False,
                   km: int = KM):
    n = o.shape[0]
    if tnear is None:
        tnear = jnp.full(n, EPSILON, jnp.float32)
    if tfar is None:
        tfar = jnp.full(n, jnp.inf, jnp.float32)
    return _pairs_impl(wt, o, d, tnear, tfar, True, interpret, km)
