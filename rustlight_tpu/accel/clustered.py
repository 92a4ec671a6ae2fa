"""Two-level clustered intersector: the large-scene TPU path.

The reference scales via a SAH BVH / Embree (src/accel.rs) — per-ray pointer
chasing that this backend cannot run at wavefront width (per-lane dynamic
table access lowers to whole-table broadcasts, see accel/bvh.py). This module
is the TPU-shaped equivalent of a two-level BVH:

  * triangles are reordered into SAH-build preorder (spatially coherent) and
    grouped into fixed clusters of CLUSTER=32;
  * every ray precomputes slab entry distances to ALL cluster AABBs — one
    dense [N, C] elementwise pass, no traversal;
  * a lax.while_loop then processes, per lane, its nearest unvisited cluster:
    selection is a masked min over [N, C] (pure VPU), the cluster's triangle
    rows are fetched with a ONE-HOT MXU matmul (no gathers; exact f32 — the
    same bit-exact selection trick as ops/gather.py), and the 32-column dense
    test updates the running closest hit;
  * a lane goes inactive once its nearest remaining cluster entry exceeds its
    current best hit — the provably-sufficient front-to-back termination —
    so the loop runs max-clusters-touched iterations, not C.

Cost: O(N*C) only in cheap compare/min lanes + one [N,C]@[C,...] selection
matmul per iteration; the expensive triangle math is O(N * clusters_touched
* 32) instead of the flat dense path's O(N * T). Measured on v5e, 262k
coherent rays: 58 ms vs 135 ms flat at ~4k tris (2.3x), 449 ms vs 1726 ms
at ~51k tris (3.8x); renders are bit-identical to the flat path.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax

from .. import EPSILON
from .dense import RayHit

CLUSTER = 32          # triangles per cluster (one dense test block)
_PREC = lax.Precision.HIGHEST


@struct.dataclass
class ClusterTables:
    n_tris: int = struct.field(pytree_node=False)
    n_clusters: int = struct.field(pytree_node=False)
    lo: Any           # [C, 3] cluster AABB
    hi: Any           # [C, 3]
    # SAH-preorder triangle rows packed per cluster in _chunk_test layout
    # ([4, 3*CLUSTER] per cluster, flattened)
    rows: Any         # [C, 4*3*CLUSTER] f32
    orig_id: Any      # [C, CLUSTER] f32 original triangle ids (exact < 2^24)


def build_clusters(geom, bvh=None) -> ClusterTables:
    """Host build: BVH-order the triangles, chunk into clusters of 32.

    Accepts GeometryTables or SceneData (host mirror used, no readbacks).
    `bvh` lets the caller share one build (build_walk_tables needs the
    identical max_leaf=8 BVH — at 4.9M tris each build is tens of
    seconds of host time)."""
    from .bvh import build_bvh
    if hasattr(geom, "host") and geom.host is not None:
        geom = geom.host.data.geom
    if bvh is None:
        bvh = build_bvh(geom, max_leaf=8)
    order = np.asarray(bvh.prim_index)           # SAH preorder
    rows = np.asarray(geom.inter_rows[: geom.n_tris])[order]   # [T, 3, 4]
    t = rows.shape[0]
    c = max(1, (t + CLUSTER - 1) // CLUSTER)
    pad = c * CLUSTER - t
    if pad:
        rows = np.concatenate([rows, np.zeros((pad, 3, 4), np.float32)], 0)
        order = np.concatenate([order, np.full(pad, -1, np.int64)], 0)

    v0 = np.asarray(geom.v0[: geom.n_tris])[np.maximum(order[: t], 0)]
    # cluster AABBs from the reordered triangle vertices
    e1 = np.asarray(geom.e1[: geom.n_tris])[order[: t]]
    e2 = np.asarray(geom.e2[: geom.n_tris])[order[: t]]
    p0, p1, p2 = v0, v0 + e1, v0 + e2
    tri_lo = np.minimum(np.minimum(p0, p1), p2)
    tri_hi = np.maximum(np.maximum(p0, p1), p2)
    if pad:
        tri_lo = np.concatenate([tri_lo, np.full((pad, 3), np.inf)], 0)
        tri_hi = np.concatenate([tri_hi, np.full((pad, 3), -np.inf)], 0)
    lo = tri_lo.reshape(c, CLUSTER, 3).min(1)
    hi = tri_hi.reshape(c, CLUSTER, 3).max(1)

    # per-cluster [4, 3*CLUSTER] N|U|V blocks (same layout as _chunk_test)
    packed = (rows.reshape(c, CLUSTER, 3, 4)
              .transpose(0, 2, 1, 3)              # [C, 3, 32, 4]
              .reshape(c, 3 * CLUSTER, 4)
              .transpose(0, 2, 1)                 # [C, 4, 96]
              .reshape(c, 4 * 3 * CLUSTER)).astype(np.float32)
    return ClusterTables(
        n_tris=t, n_clusters=c,
        lo=lo.astype(np.float32), hi=hi.astype(np.float32),
        rows=packed,
        orig_id=order.reshape(c, CLUSTER).astype(np.float32),
    )


def _entry_distances(ct: ClusterTables, o, d, tnear, tfar):
    """Slab entry distance to each cluster AABB; +inf when missed."""
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d,
                          jnp.where(d >= 0, 1e-12, -1e-12))
    t0 = (ct.lo[None] - o[:, None]) * inv[:, None]     # [N, C, 3]
    t1 = (ct.hi[None] - o[:, None]) * inv[:, None]
    tmin = jnp.max(jnp.minimum(t0, t1), -1)
    tmax = jnp.min(jnp.maximum(t0, t1), -1)
    entry = jnp.maximum(tmin, tnear[:, None])
    ok = (tmax >= entry) & (entry < tfar[:, None])
    return jnp.where(ok, entry, jnp.inf)


@partial(jax.jit, static_argnames=("any_hit",))
def _intersect_clustered_impl(ct: ClusterTables, o, d, tnear, tfar,
                              any_hit: bool):
    n = o.shape[0]
    C = ct.n_clusters
    k = CLUSTER
    o4 = jnp.concatenate([o, jnp.ones((n, 1), o.dtype)], -1)
    d4 = jnp.concatenate([d, jnp.zeros((n, 1), d.dtype)], -1)
    entry = _entry_distances(ct, o, d, tnear, tfar)     # [N, C]
    c_iota = lax.broadcasted_iota(jnp.int32, (n, C), 1)
    k_iota = lax.broadcasted_iota(jnp.int32, (n, k), 1)

    def cond(s):
        return jnp.any(s["active"])

    # clusters processed per while-loop step: amortizes the [N, C] done-mask
    # carry traffic (the dominant HBM cost at large C) over several fetches
    K_PER_STEP = 4

    def body(s):
        ent = jnp.where(s["done"], jnp.inf, entry)
        best_t = s["best_t"]
        best_tri = s["best_tri"]
        best_u = s["best_u"]
        best_v = s["best_v"]
        occluded = s["occluded"]
        done = s["done"]
        active = s["active"]

        for _ in range(K_PER_STEP):
            emin = jnp.min(ent, 1)
            # nearest unvisited cluster (min + iota compare; no argmin)
            csel = jnp.min(jnp.where(ent == emin[:, None], c_iota, C), 1)
            lane = active & (emin < best_t) & jnp.isfinite(emin)
            sel = (c_iota == csel[:, None]) & lane[:, None]
            onehot = sel.astype(jnp.float32)
            ent = jnp.where(sel, jnp.inf, ent)
            done = done | sel

            # bit-exact f32 row fetch: one-hot matmul at HIGHEST precision
            # (ops/gather.py make_taker trick); [N, 4*3k]
            rows = jnp.dot(onehot, ct.rows, precision=_PREC)
            p = rows.reshape(n, 4, 3 * k)
            ao = jnp.einsum("nk,nkc->nc", o4, p)        # 4 FMAs per column
            ad = jnp.einsum("nk,nkc->nc", d4, p)
            no, uo, vo = ao[:, :k], ao[:, k:2 * k], ao[:, 2 * k:]
            nd, ud, vd = ad[:, :k], ad[:, k:2 * k], ad[:, 2 * k:]
            live = jnp.abs(nd) > 1e-20
            t = -no / jnp.where(live, nd, 1.0)
            u = uo + t * ud
            v = vo + t * vd
            valid = (live & (t > tnear[:, None]) & (t < jnp.minimum(
                best_t, tfar)[:, None])
                & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & lane[:, None])
            tm = jnp.where(valid, t, jnp.inf)
            bt = jnp.min(tm, 1)
            better = bt < best_t
            j = jnp.minimum(jnp.min(jnp.where(tm == bt[:, None], k_iota, k),
                                    1), k - 1)
            jhot = (k_iota == j[:, None]) & better[:, None]
            # original triangle id via the same one-hot chain (exact in f32)
            ids = jnp.dot(onehot, ct.orig_id, precision=_PREC)   # [N, k]
            tri_new = jnp.sum(jnp.where(jhot, ids, 0.0), 1).astype(jnp.int32)
            best_u = jnp.where(better, jnp.sum(jnp.where(jhot, u, 0.0), 1),
                               best_u)
            best_v = jnp.where(better, jnp.sum(jnp.where(jhot, v, 0.0), 1),
                               best_v)
            best_t = jnp.where(better, bt, best_t)
            best_tri = jnp.where(better, tri_new, best_tri)
            if any_hit:
                occluded = occluded | better
                active = lane & (~occluded)
            else:
                active = lane

        return dict(best_t=best_t, best_tri=best_tri, best_u=best_u,
                    best_v=best_v, done=done, active=active,
                    occluded=occluded)

    state = dict(best_t=jnp.minimum(tfar, jnp.inf),
                 best_tri=jnp.full(n, -1, jnp.int32),
                 best_u=jnp.zeros(n), best_v=jnp.zeros(n),
                 done=jnp.zeros((n, C), bool),
                 active=jnp.ones(n, bool),
                 occluded=jnp.zeros(n, bool))
    out = lax.while_loop(cond, body, state)
    if any_hit:
        return out["occluded"]
    hit = out["best_tri"] >= 0
    return RayHit(t=jnp.where(hit, out["best_t"], jnp.inf),
                  tri=out["best_tri"], u=out["best_u"], v=out["best_v"],
                  hit=hit)


def intersect_clustered(ct: ClusterTables, o, d, tnear=None, tfar=None):
    n = o.shape[0]
    if tnear is None:
        tnear = jnp.full(n, EPSILON)
    if tfar is None:
        tfar = jnp.full(n, jnp.inf)
    return _intersect_clustered_impl(ct, o, d, tnear, tfar, False)


def occluded_clustered(ct: ClusterTables, o, d, tnear=None, tfar=None):
    n = o.shape[0]
    if tnear is None:
        tnear = jnp.full(n, EPSILON)
    if tfar is None:
        tfar = jnp.full(n, jnp.inf)
    return _intersect_clustered_impl(ct, o, d, tnear, tfar, True)
