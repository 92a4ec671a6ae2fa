"""Pallas tile-walk intersector: per-ray-tile cluster traversal in VMEM.

The reference's production path is a per-ray recursive SAH BVH walk
(src/accel.rs:243-288) — per-lane pointer chasing that this backend cannot
vectorize. The XLA clustered intersector (accel/clustered.py) replaces the
walk with per-visit one-hot MXU fetches, but every visit then costs
2*N*C*384 matmul FLOPs — one visit is as expensive as a full flat pass, so
it only wins by being less HBM-bound.

This kernel is the real TPU traversal: Pallas supports *scalar* dynamic
slicing of VMEM refs inside a kernel, so cluster fetches cost O(1) instead
of O(C). Shape of the algorithm:

  * host build (shared with accel/clustered.py): triangles in SAH-BVH
    preorder, grouped into clusters of K=128 with AABBs; all cluster tables
    (Baldwin-Weber rows, ids, bounds) live whole in VMEM (fits to ~250k
    triangles on a 16 MB core);
  * grid over ray tiles of R=256 rays. Each program computes one [R, C]
    slab pass reduced to a per-cluster tile entry distance ent[c] =
    min over the tile's rays of that ray's AABB entry (inf if all miss);
  * a scalar while_loop walks clusters front-to-back by ent: pop the
    minimum, fetch its rows with a dynamic VMEM slice ([4] x [1, 3K] —
    O(K), not O(C*K)), test all R rays against the K triangles on the VPU,
    update per-ray closest hits;
  * termination: stop when the nearest remaining cluster entry exceeds
    every ray's current best hit — per-tile front-to-back proof: for all
    rays r, entry_r(c) >= min_r entry_r(c) = ent[c] > max_r best_t[r]
    >= best_t[r], so no remaining cluster can improve any ray.

Per visit this does R*3K VPU lanes of work (~100k flops) versus the XLA
clustered path's 2*N*C*384 (~300 GFLOP at 51k tris) — the asymptotic win
that makes 100k+ triangle scenes practical. Measured v5e, 262k coherent
rays: 51k tris 449 ms (XLA clustered) -> ~8 ms (this kernel).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import EPSILON
from .dense import RayHit

# Triangles per cluster. Swept on-chip at 122k tris / 262k rays (v5e,
# tools/perf/k_sweep.py, parity-identical checksums): K=384 is the optimum —
# 66.9/160.2 ms coherent/divergent vs 84.5/237.1 at the old K=128
# (1.26x/1.48x; K=64: 122/374, K=256: 74/204, K=512: 75/193). Fewer, wider
# clusters shrink the per-tile visit count faster than the [R, 3K] test
# widens, until K=512 where the extra test volume wins back. 3K must stay a
# multiple of 128 lanes (K % 128 == 0).
K = 384
# Rays per program. Visits per tile scale with the tile's cluster UNION, so
# smaller tiles trade more (cheap, O(C) vector) pop_min/entry steps for far
# fewer wasted [R, 3K] triangle tests on divergent wavefronts. Measured v5e,
# 122k tris, 262k rays: 64 is ~2x over 256 on coherent AND incoherent sets
# (and ~2x on the HBM DMA variant too); 32 is within noise of 64 trace-only
# but no better end-to-end.
RAY_TILE = 64
# VMEM budget for the resident tables: rows [4, C, 3K] f32 dominates at
# 18 KB/cluster (K=384); leave room for ray tiles + scratch on a 16 MB core
# (the entry pass is chunked, so C=640 = 11.8 MB of rows fits).
MAX_VMEM_CLUSTERS = 640           # ~245k triangles
# hierarchical (two-level) walk: SUP consecutive clusters per super-cluster.
# One lane vector of child entries per opened super; 7 id bits pack the
# local child index into the entry mantissa.
SUP = 128
_CHILD_BITS = 7
_BIG = 1e30
# Triangle tests on the MXU: fold the two [R, 4] x [4, 3K] affine products
# into dots instead of 8 serial VPU fma sweeps over [R, 3K]. f32 HIGHEST
# precision (6-pass bf16 decomposition) keeps t/u/v at fma-chain accuracy
# but NOT bit-identical to the VPU path, so this stays opt-in until the
# on-chip measurement says it wins (the kernel is VPU-bound on these tests
# — STATUS.md "Measured ceilings").
MXU_TRITEST = os.environ.get("RUSTLIGHT_TPU_MXU_TRITEST", "0") == "1"
# Sub-tiled schedule (opt-in, measured NEGATIVE — see _closest_kernel_sub):
# read once at import so the jit cache (keyed on the static `sub` argument
# resolved at trace time) can never go stale on a mid-process env change.
SUBTILES_DEFAULT = int(os.environ.get("RUSTLIGHT_TPU_SUBTILES", "1"))
# Sparse-visit schedule (see _closest_kernel_sparse): test only the rays
# that overlap the popped cluster (gathered by exact one-hot matmuls into a
# [SPARSE_CAP, 3K] narrow test) instead of the whole [R, 3K] tile; falls
# back to the dense test when more than SPARSE_CAP rays overlap. Resolved
# at import for jit-cache hygiene, like SUBTILES_DEFAULT.
SPARSE_DEFAULT = os.environ.get("RUSTLIGHT_TPU_SPARSE_VISIT", "0") == "1"
# opt-in inert-ray compaction (measured negative, see _sort_key): resolved
# at import for jit-cache hygiene, like SUBTILES_DEFAULT/SPARSE_DEFAULT —
# a trace-time env read would silently reuse the stale cached trace.
INCIDENCE_SORT_DEFAULT = os.environ.get(
    "RUSTLIGHT_TPU_INCIDENCE_SORT", "1") == "1"
# cap: the [N, C] slab pre-pass is linear in C; at 16k clusters it still
# wins big (4.9M-tri AO 0.96 -> 0.54 s, 1.76x, identical mean), so the
# default admits the multi-M-tri wide-mode scenes too
_INC_SORT_MAX_C = int(os.environ.get(
    "RUSTLIGHT_TPU_INCIDENCE_SORT_MAX_C", "32768"))
COMPACT_INERT_DEFAULT = os.environ.get(
    "RUSTLIGHT_TPU_COMPACT_INERT", "0") == "1"
SPARSE_CAP = int(os.environ.get("RUSTLIGHT_TPU_SPARSE_CAP", "16"))


@struct.dataclass
class WalkTables:
    n_tris: int = struct.field(pytree_node=False)
    n_clusters: int = struct.field(pytree_node=False)   # padded C (mult 128)
    n_real: int = struct.field(pytree_node=False, default=0)  # treelet count
    # resident=True: rows [4, C, 3K] f32 + ids [C, K] i32, whole in VMEM.
    # resident=False (HBM variant): rows [C, 8, 3K] f32 — per-cluster DMA
    # block (8-sublane aligned) with the o4/d4 component rows in [:, 0:4, :]
    # and the triangle ids BITCAST to f32 in [:, 4, :K]; ids is None.
    resident: bool = struct.field(pytree_node=False, default=True)
    # hierarchical (two-level) tables: SUP consecutive clusters per super
    n_sup: int = struct.field(pytree_node=False, default=0)   # real supers
    n_sup_pad: int = struct.field(pytree_node=False, default=0)  # mult 128
    rows: Any = None
    ids: Any = None
    lo: Any = None         # [3, C] f32 cluster AABB (pads: distant points)
    hi: Any = None         # [3, C] f32
    slo: Any = None        # [3, Sp] f32 super AABB (union of real children)
    shi: Any = None        # [3, Sp]
    lo_h: Any = None       # [3, Sp, SUP] f32 — children grouped by super
    hi_h: Any = None       # [3, Sp, SUP]
    world_lo: Any = None   # [3] scene bounds (ray-sorting morton grid)
    world_hi: Any = None   # [3]


def _treelet_cut(nodes: np.ndarray, max_tris: int):
    """Cut the skip-link preorder BVH into maximal subtrees of <= max_tris
    primitives. Returns [(prim_start, prim_count)] segments in preorder —
    together they tile the preorder primitive array contiguously.

    Fixed preorder chunks of exactly K can straddle unrelated subtrees,
    inflating cluster bounds and therefore the number of clusters every ray
    tile visits; subtree-aligned cut points keep each cluster spatially
    tight. The caller re-packs consecutive segments up to K (>50% fill by
    maximality: two mergeable neighbors would have been one treelet)."""
    ints = nodes[:, 6:9].copy().view(np.int32)
    skip, start, cnt = ints[:, 0], ints[:, 1], ints[:, 2]
    m = nodes.shape[0]
    sub_cnt = np.zeros(m, np.int64)
    sub_start = np.zeros(m, np.int64)
    for i in range(m - 1, -1, -1):
        if cnt[i] > 0:                                   # leaf
            sub_cnt[i] = cnt[i]
            sub_start[i] = start[i]
        else:                                            # left=i+1, right=
            l = i + 1                                    # skip(left)
            r = skip[l]
            sub_cnt[i] = sub_cnt[l] + sub_cnt[r]
            sub_start[i] = sub_start[l]
    out = []
    stack = [0]
    while stack:
        i = stack.pop()
        if cnt[i] > 0 or sub_cnt[i] <= max_tris:
            out.append((int(sub_start[i]), int(sub_cnt[i])))
        else:
            l = i + 1
            stack.append(skip[l])                        # right after left
            stack.append(l)
    return out


def build_walk_tables(geom, bvh=None, builder=None,
                      repack_alpha=None) -> WalkTables:
    """Host build: SAH-BVH treelet cut points (segments of the preorder
    primitive array aligned to subtree boundaries), greedily re-packed up
    to K per cluster, with tight per-range triangle AABBs. `bvh` shares
    the caller's max_leaf=8 build (see build_clusters).

    builder: BVH build algorithm when `bvh` is None — "binned" (default)
    or "sweep" (full SAH sweep); env RUSTLIGHT_TPU_BVH_BUILDER overrides.
    repack_alpha: if set, the treelet re-pack becomes tightness-aware —
    neighbors merge only when SA(merged) <= alpha * (SA(a) + SA(b)), so
    spatially disjoint segments stay separate clusters at the price of a
    lower fill rate; env RUSTLIGHT_TPU_REPACK_ALPHA. A/B'd in
    tools/perf/tree_lab.py."""
    import os
    from .bvh import build_bvh
    if hasattr(geom, "host") and geom.host is not None:
        geom = geom.host.data.geom
    if builder is None:
        builder = os.environ.get("RUSTLIGHT_TPU_BVH_BUILDER", "binned")
    if repack_alpha is None:
        env_a = os.environ.get("RUSTLIGHT_TPU_REPACK_ALPHA", "")
        repack_alpha = float(env_a) if env_a else None
    if bvh is None:
        bvh = build_bvh(geom, max_leaf=8, builder=builder)
    order = np.asarray(bvh.prim_index)                   # SAH preorder
    t = order.shape[0]
    nodes = np.stack([
        np.asarray(bvh.bbox_lo), np.asarray(bvh.bbox_hi)], axis=1
    ).reshape(-1, 6).astype(np.float32)
    ints = np.stack([np.asarray(bvh.skip), np.asarray(bvh.prim_start),
                     np.asarray(bvh.prim_count)], axis=1).astype(np.int32)
    nodes = np.concatenate([nodes, ints.view(np.float32)], axis=1)
    segs = _treelet_cut(nodes, K)
    all_rows = np.asarray(geom.inter_rows[: geom.n_tris])[order]  # [T, 3, 4]
    v0 = np.asarray(geom.v0[: geom.n_tris])[order]
    e1 = np.asarray(geom.e1[: geom.n_tris])[order]
    e2 = np.asarray(geom.e2[: geom.n_tris])[order]
    p1, p2 = v0 + e1, v0 + e2
    tri_lo = np.minimum(np.minimum(v0, p1), p2)          # [T, 3]
    tri_hi = np.maximum(np.maximum(v0, p1), p2)
    # greedy consecutive re-pack: segments tile the prim array in order, so
    # merging neighbors keeps ranges contiguous; >50% fill guaranteed (two
    # adjacent clusters never sum <= K, else they'd have merged). With
    # repack_alpha set, a merge additionally requires the merged AABB's
    # surface area <= alpha * (SA(a) + SA(b)) — blocks spatially disjoint
    # merges (e.g. across high-level subtree boundaries in the preorder).
    if repack_alpha is not None:
        seg_starts = np.fromiter((s for s, _ in segs), np.int64, len(segs))
        seg_lo = np.minimum.reduceat(tri_lo, seg_starts, axis=0)
        seg_hi = np.maximum.reduceat(tri_hi, seg_starts, axis=0)

        def _sa(lo_v, hi_v):
            d = np.maximum(hi_v - lo_v, 0.0)
            return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])
    cuts = []
    cs, cn = segs[0]
    if repack_alpha is not None:
        clo, chi = seg_lo[0].copy(), seg_hi[0].copy()
    for i, (s, n) in enumerate(segs[1:], start=1):
        ok = cn + n <= K
        if ok and repack_alpha is not None:
            mlo = np.minimum(clo, seg_lo[i])
            mhi = np.maximum(chi, seg_hi[i])
            ok = _sa(mlo, mhi) <= repack_alpha * (_sa(clo, chi)
                                                  + _sa(seg_lo[i], seg_hi[i]))
        if ok:
            cn += n
            if repack_alpha is not None:
                clo, chi = mlo, mhi
        else:
            cuts.append((cs, cn))
            cs, cn = s, n
            if repack_alpha is not None:
                clo, chi = seg_lo[i].copy(), seg_hi[i].copy()
    cuts.append((cs, cn))

    c = len(cuts)
    if c > _MAX_CLUSTERS:
        return None          # beyond the wide-mode ceiling (~16M triangles)
    cp = ((c + 127) // 128) * 128                        # lane-pad C
    # vectorized packing: cuts tile the preorder prim array contiguously, so
    # the destination of source tri j is cluster_of[j]*K + (j - start_of[j])
    # and per-cluster AABBs are contiguous-segment reductions (reduceat) —
    # the per-cluster Python loop this replaces was ~9 s at 55808 clusters
    starts = np.fromiter((s for s, _ in cuts), np.int64, c)
    counts = np.fromiter((n for _, n in cuts), np.int64, c)
    cluster_of = np.repeat(np.arange(c, dtype=np.int64), counts)
    dest = cluster_of * K + (np.arange(t, dtype=np.int64)
                             - np.repeat(starts, counts))
    rows = np.zeros((cp * K, 3, 4), np.float32)
    rows[dest] = all_rows
    ids_flat = np.full(cp * K, -1, np.int64)
    ids_flat[dest] = order
    lo = np.full((3, cp), _BIG, np.float32)              # pads: distant
    hi = np.full((3, cp), _BIG, np.float32)              # points
    lo[:, :c] = np.minimum.reduceat(tri_lo, starts, axis=0).T
    hi[:, :c] = np.maximum.reduceat(tri_hi, starts, axis=0).T
    order = ids_flat

    world_lo = tri_lo.min(0).astype(np.float32)
    world_hi = tri_hi.max(0).astype(np.float32)

    # two-level tables: SUP consecutive clusters (treelet order, so each
    # super is a near-subtree and spatially tight) per super, AABB = union
    # of REAL children only (pads would inflate shi to _BIG)
    ns = -(-c // SUP)                                    # real supers
    sp = ((-(-cp // SUP) + 127) // 128) * 128            # lane-pad S
    slo = np.full((3, sp), _BIG, np.float32)
    shi = np.full((3, sp), _BIG, np.float32)
    ncol = cp // SUP          # cp and SUP are both multiples of 128
    slo[:, :ncol] = lo.reshape(3, ncol, SUP).min(2)      # _BIG pads inert
    hi_m = np.where(np.arange(cp)[None, :] < c, hi, -_BIG)
    shi_v = hi_m.reshape(3, ncol, SUP).max(2)
    shi[:, :ncol] = np.where(shi_v <= -_BIG, _BIG, shi_v)  # all-pad supers
    lo_h = np.full((3, sp, SUP), _BIG, np.float32)
    hi_h = np.full((3, sp, SUP), _BIG, np.float32)
    lo_h.reshape(3, -1)[:, :cp] = lo
    hi_h.reshape(3, -1)[:, :cp] = hi

    # [4, C, 3K]: component j of the o4/d4 dot, N|U|V column blocks of K
    packed = (rows.reshape(cp, K, 3, 4)
              .transpose(3, 0, 2, 1)                      # [4, C, 3, K]
              .reshape(4, cp, 3 * K)).astype(np.float32)
    ids = order.reshape(cp, K).astype(np.int32)
    resident = cp <= MAX_VMEM_CLUSTERS
    if resident:
        rows_out, ids_out = packed, ids
    else:
        # HBM DMA layout: the dynamically sliced cluster dim must be the
        # untiled major dim; ids ride bitcast-as-f32 in component row 4 so
        # each visit is ONE [1, 8, 3K] DMA
        blk = np.zeros((cp, 8, 3 * K), np.float32)
        blk[:, 0:4, :] = packed.transpose(1, 0, 2)
        blk[:, 4, :K] = ids.view(np.float32)
        rows_out, ids_out = blk, None
    return WalkTables(
        n_tris=t, n_clusters=cp, n_real=c, resident=resident,
        n_sup=ns, n_sup_pad=sp,
        rows=rows_out, ids=ids_out,
        lo=np.ascontiguousarray(lo).astype(np.float32),
        hi=np.ascontiguousarray(hi).astype(np.float32),
        slo=slo, shi=shi, lo_h=lo_h, hi_h=hi_h,
        world_lo=world_lo, world_hi=world_hi,
    )


def _sort_key(wt: WalkTables, o, d, tfar=None):
    """Wavefront coherence key, returned as a (major, minor) int32 pair for
    a two-key lax.sort: major = direction octant | 5-bit/axis origin
    morton, minor = 5-bit/axis |direction| morton — rays landing in the
    same RAY_TILE then share a spatial cell, an octant, AND a direction
    cone, which bounds the tile's cluster union. Divergent bounce/shadow
    wavefronts trace ~2.4x faster sorted (v5e). The fine direction minor
    key matters most for point-origin wavefronts (camera/point-light rays:
    every origin identical, so the origin morton is one cell and only the
    direction spreads the tile). Key selection is measured host-side in
    tools/perf/sortkey_lab.py against the exact ray-cluster incidence
    matrix (110k-tri grid, 262k rays): widening the direction morton from
    the old 3 to 5 bits/axis halves the coherent tile union (16.8 -> 8.4)
    and leaves the divergent union bit-identical (50.87, which matches the
    instrumented kernel's measured 51.4 visits/tile); direction-major and
    6D-interleaved orders measured strictly worse. Round 5: the incidence
    key (_incidence_key, default for <= _INC_SORT_MAX_C clusters) reads
    the ray-cluster matrix directly — final form sorts by the CENTROID of
    each ray's overlapped cluster centers (union 25.25; the earlier
    three-lowest-ID form hit 28.0, a 448-bit bitset lexsort 28.1, and
    the old "grouping floor" 35.97 was an artifact of its first-ID
    surrogate); the remaining gap to greedy tile PACKING (17.8, worth a
    measured 1.40x, tools/perf/grouping_lab.py) requires assignment
    rather than ordering and is not reachable by any key. This morton
    key remains the fallback for huge scenes and for point-origin
    wavefronts (entry-pass-bound: the centroid key's lower union buys no
    wall there and the slab pre-pass isn't free).

    When `tfar` is given, inert rays (tfar <= 0: dead wavefront lanes,
    masked shadow rays) take the TOP key bit, compacting them into
    all-inert tail tiles — the wavefront-compaction analog for a
    static-shape machine (VERDICT r2's last untried scheduling lever).
    Measured on-chip (v5e, 122k tris): LOSES 0.74x on the e2e path render
    and is neutral (0.98x) even at 50% artificially interleaved inert
    lanes, bit-identical both ways. Inert rays never expanded their tile's
    cluster union to begin with (tfar=0 fails every slab test), so mixed
    tiles paid nothing for them — while re-packing live lanes stretches
    each tile across a wider key range and grows its union. Kept opt-in
    (RUSTLIGHT_TPU_COMPACT_INERT=1); with the pair/sub-tile/sparse-visit
    negatives this closes the compaction lever too: the sorted tile walk's
    inert-lane dilution is already free."""
    octant = ((d[:, 0] > 0).astype(jnp.int32) * 4
              + (d[:, 1] > 0).astype(jnp.int32) * 2
              + (d[:, 2] > 0).astype(jnp.int32))
    if tfar is not None:
        octant = octant | (tfar <= 0.0).astype(jnp.int32) << 3
    ext = jnp.maximum(wt.world_hi - wt.world_lo, 1e-9)
    q = jnp.clip(((o - wt.world_lo[None, :]) / ext[None, :] * 32.0)
                 .astype(jnp.int32), 0, 31)
    m = jnp.zeros_like(octant)
    for b in range(5):
        for ax in range(3):
            m = m | (((q[:, ax] >> b) & 1) << (3 * b + ax))
    qd = jnp.clip((jnp.abs(d) * 32.0).astype(jnp.int32), 0, 31)
    dm = jnp.zeros_like(octant)
    for b in range(5):
        for ax in range(3):
            dm = dm | (((qd[:, ax] >> b) & 1) << (3 * b + ax))
    return (octant << 15) | m, dm


def _incidence_key(wt: WalkTables, o, d, tnear, tfar):
    """Set-similarity coherence key (VERDICT r4 item 1, round-5 final
    form): a cheap exact slab pre-pass computes each ray's overlapped-
    cluster COUNT and the weighted CENTROID of its overlapped clusters'
    centers (one [N, C] sweep + one [N, C] x [C, 3] matmul); rays sort by
    (direction octant | 6-bit/axis centroid morton | count). Measured
    offline against the exact ray-cluster incidence matrix
    (tools/perf/grouping_lab.py + the centroid study): divergent 262k-ray
    tile union 50.9 (morton) -> 28.0 (three-lowest-ID key, the previous
    form) -> 25.25 (this key); coherent 8.43 (morton) -> 6.99 — the
    centroid key beats the morton key on BOTH wavefront classes, because
    the segment midpoint of the traversed cluster run is a geometric
    locality signal no origin/direction quantization can see. Earlier
    bounds for context: a full 448-bit incidence-bitset lexsort measures
    28.1, and greedy tile PACKING reaches 17.8 (union) / 1.40x (wall,
    measured on-chip by pre-permuting the greedy order) — assignment
    rather than ordering, unreachable by any key; an on-chip packing
    pass is the quantified future lever. The morton key remains the
    fallback above _INC_SORT_MAX_C clusters (the pre-pass is O(N*C))."""
    c = int(wt.n_real)
    lo = wt.lo[:, :c]
    hi = wt.hi[:, :c]
    ctr_t = 0.5 * (lo + hi)                      # [3, C]
    wlo = jnp.min(lo, axis=1)
    span = jnp.maximum(jnp.max(hi, axis=1) - wlo, 1e-9)
    n = o.shape[0]
    octant = ((d[:, 0] > 0).astype(jnp.int32) * 4
              + (d[:, 1] > 0).astype(jnp.int32) * 2
              + (d[:, 2] > 0).astype(jnp.int32))

    def block_key(args):
        """Key for one [B, ...] ray block (B = chunk or n)."""
        o_c, d_c, tn_c, tf_c = args
        inv = 1.0 / jnp.where(jnp.abs(d_c) > 1e-12, d_c,
                              jnp.where(d_c >= 0, 1e-12, -1e-12))
        b = o_c.shape[0]
        tmin = jnp.full((b, c), -jnp.inf, jnp.float32)
        tmax = jnp.full((b, c), jnp.inf, jnp.float32)
        for ax in range(3):
            t0 = (lo[ax][None, :] - o_c[:, ax:ax + 1]) * inv[:, ax:ax + 1]
            t1 = (hi[ax][None, :] - o_c[:, ax:ax + 1]) * inv[:, ax:ax + 1]
            tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
            tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
        ov = ((tmax >= jnp.maximum(tmin, jnp.maximum(tn_c, 0.0)[:, None]))
              & (tmin <= tf_c[:, None]) & (tf_c > 0.0)[:, None])
        ovf = ov.astype(jnp.float32)
        cnt = jnp.sum(ovf, axis=1)
        cen = (ovf @ ctr_t.T) / jnp.maximum(cnt, 1.0)[:, None]   # [b, 3]
        q = jnp.clip(((cen - wlo[None, :]) / span[None, :] * 64.0)
                     .astype(jnp.int32), 0, 63)
        cm = jnp.zeros((b,), jnp.int32)
        for bb in range(6):
            for ax in range(3):
                cm = cm | (((q[:, ax] >> bb) & 1) << (3 * bb + ax))
        return cm, jnp.minimum(cnt, 63.0).astype(jnp.int32)

    # chunk rays so the [chunk, C] scratch stays ~64 MB; chunks run under
    # lax.map so the COMPILED body is one chunk regardless of chunk count
    # (an unrolled python loop at 16k clusters compiled pathologically
    # slowly on the remote compile service)
    chunk = max(512, min(65536, (1 << 26) // max(4 * c, 1)))
    if n <= chunk:
        cm, cnt = block_key((o, d, tnear, tfar))
    else:
        pad = (-n) % chunk
        def padded(x, fill):
            return jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], 0)                 if pad else x
        o_p = padded(o, 0.0).reshape(-1, chunk, 3)
        d_p = padded(d, 1.0).reshape(-1, chunk, 3)
        tn_p = padded(tnear, jnp.inf).reshape(-1, chunk)
        tf_p = padded(tfar, 0.0).reshape(-1, chunk)
        cm, cnt = lax.map(block_key, (o_p, d_p, tn_p, tf_p))
        cm = cm.reshape(-1)[:n]
        cnt = cnt.reshape(-1)[:n]
    return (octant << 18) | cm, cnt


# cluster id packed into the entry's low mantissa bits: the fast pop path
# for scenes up to 2^14 clusters (~1-2M triangles depending on treelet
# fill), quantizing the front-to-back VISIT ORDER to 2^-9 relative — order
# is a heuristic, so the id bits may round an entry up or down. The
# TERMINATION test must stay conservative, so it compares the id-STRIPPED
# entry (a floor of the true bits) against the threshold — see _entry_floor.
#
# Beyond 2^14 clusters the kernel switches to WIDE mode (wide=True): entries
# stay unpacked f32 and _pop_min recovers the argmin with a second
# iota/min-reduce over [1, C] — one extra O(C) vector pass per pop in
# exchange for an unbounded cluster count (multi-M-tri scenes stay on the
# walk kernel instead of falling back to the minutes-slow XLA clustered
# path; ceiling becomes _MAX_CLUSTERS, a VMEM/entry-pass budget only).
_ID_BITS = 14
_MAX_CLUSTERS = 1 << 17        # wide-mode ceiling: ent_scr 512 KB VMEM
_FMAX = float(np.finfo(np.float32).max)   # inf-free cap for one-hot gathers

import os as _os
_NO_HIER = _os.environ.get("RUSTLIGHT_TPU_NO_HIER") == "1"


def _entry_floor(emin_bits, id_bits=_ID_BITS):
    """Packed entry with the id bits cleared: <= the true entry's sortable
    bits, so `floor < thresh` never terminates while an unvisited cluster
    could still beat a ray's best hit."""
    return emin_bits & ~((1 << id_bits) - 1)


def _tile_entries(lo_ref, hi_ref, o, d, tnear, tfar, n_real, cp,
                  wide=False, sub=1, rc_ref=None):
    """Per-cluster tile entry distance: min over rays of the slab entry.

    Returns [sub, C] f32 — row s reduced over the tile's s-th contiguous
    ray sub-group (sub=1: the whole tile, the classic behavior) — with the
    cluster id PACKED into the low _ID_BITS mantissa bits (wide=False) or
    the plain entry (wide=True). +inf where no ray of the group enters the
    AABB, so a single min-reduce per row yields the group's next entry
    distance (and, packed, its cluster).

    rc_ref (sparse-visit schedule): [C, R] VMEM scratch that receives every
    ray's own entry (inf = miss) before the min-reduce — the per-visit
    overlap mask, persisted here because the slab pass computes it anyway.
    Stored cluster-major (one transpose per tile) because Mosaic only
    allows dynamic slicing on the sublane-major dim."""
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d,
                          jnp.where(d >= 0, 1e-12, -1e-12))
    rs = o.shape[0] // sub
    # chunk over clusters so the [R, C] intermediates stay within VMEM
    # headroom next to the resident row tables at large C; the chunk loop is
    # Python-unrolled, so bound the chunk COUNT (not just width) for
    # wide-mode cluster counts ([R, 2048] f32 is only 512 KB transient)
    cc = min(cp, 512 if cp <= 1024 else max(256, -(-cp // 64)))
    parts = []
    rc_parts = []
    for c0 in range(0, cp, cc):
        w = min(cc, cp - c0)             # last chunk may be narrower
        tmin = jnp.full((o.shape[0], w), -jnp.inf)
        tmax = jnp.full((o.shape[0], w), jnp.inf)
        for j in range(3):
            t0 = ((lo_ref[j, c0:c0 + w][None, :] - o[:, j][:, None])
                  * inv[:, j][:, None])
            t1 = ((hi_ref[j, c0:c0 + w][None, :] - o[:, j][:, None])
                  * inv[:, j][:, None])
            tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
            tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
        entry = jnp.maximum(tmin, tnear[:, None])
        ok = (tmax >= entry) & (entry < tfar[:, None])
        ent_rays = jnp.where(ok, entry, jnp.inf)
        if rc_ref is not None:
            rc_parts.append(ent_rays)
        if sub == 1:
            parts.append(jnp.min(ent_rays, axis=0, keepdims=True))
        else:
            parts.append(jnp.concatenate(
                [jnp.min(ent_rays[s * rs:(s + 1) * rs], axis=0,
                         keepdims=True) for s in range(sub)], axis=0))
    if rc_ref is not None:
        full = (jnp.concatenate(rc_parts, axis=1) if len(rc_parts) > 1
                else rc_parts[0])                        # [R, C]
        rc_ref[:] = full.T                               # one relayout/tile
    ent = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    ciota = lax.broadcasted_iota(jnp.int32, (sub, cp), 1)
    fin = (ciota < n_real) & jnp.isfinite(ent)
    if wide:
        return jnp.where(fin, jnp.maximum(ent, 0.0), jnp.inf)
    bits = lax.bitcast_convert_type(jnp.maximum(ent, 0.0), jnp.int32)
    packed = lax.bitcast_convert_type(
        (bits & ~((1 << _ID_BITS) - 1)) | ciota, jnp.float32)
    return jnp.where(fin, packed, jnp.inf)


def _pop_min(ent_scr, wide=False, id_bits=_ID_BITS):
    """One min-reduce pops the nearest unvisited cluster.

    All ordering runs in int32 space: non-negative IEEE floats order
    identically as their integer bits, and Mosaic only bitcasts vectors, not
    scalars. Returns (entry bits as sortable i32, cluster id).

    wide=True (> 2^14 clusters): entries carry no id bits; the argmin is
    recovered with a second iota/min-reduce and only the selected position
    is cleared (packed mode clears by bit-equality, which is unique there)."""
    ent = ent_scr[:]
    bits = lax.bitcast_convert_type(ent, jnp.int32)      # vector bitcast
    bmin = jnp.min(bits)
    cp = ent.shape[1]
    if wide:
        ciota = lax.broadcasted_iota(jnp.int32, (1, cp), 1)
        csel = jnp.minimum(jnp.min(jnp.where(bits == bmin, ciota, cp)),
                           cp - 1)
        ent_scr[:] = jnp.where(ciota == csel, jnp.inf, ent)
        return bmin, csel
    ent_scr[:] = jnp.where(bits == bmin, jnp.inf, ent)
    csel = bmin & ((1 << id_bits) - 1)
    # bmin == inf-bits gives csel = 0: harmless re-test, loop is ending
    return bmin, jnp.minimum(csel, cp - 1)


def _sortable_max(x):
    """max over a non-negative f32 vector, returned as sortable i32 bits."""
    return jnp.max(lax.bitcast_convert_type(x, jnp.int32))


def _test_cluster(rows_ref, csel, o, d, tnear, tcap):
    """Test all rays of the tile against cluster csel's K triangles
    (VMEM-resident rows). Returns (t, u, v, valid) each [R, K]."""
    r0 = rows_ref[0, pl.ds(csel, 1), :][0]               # [3K]
    r1 = rows_ref[1, pl.ds(csel, 1), :][0]
    r2 = rows_ref[2, pl.ds(csel, 1), :][0]
    r3 = rows_ref[3, pl.ds(csel, 1), :][0]
    return _test_rows(r0, r1, r2, r3, o, d, tnear, tcap)


def _test_rows(r0, r1, r2, r3, o, d, tnear, tcap):
    # o4 = [o, 1], d4 = [d, 0] fold into the affine rows directly
    if MXU_TRITEST:
        rows = jnp.stack([r0, r1, r2, r3])                       # [4, 3K]
        one = jnp.ones((o.shape[0], 1), o.dtype)
        ao = lax.dot(jnp.concatenate([o, one], 1), rows,
                     precision=lax.Precision.HIGHEST)
        ad = lax.dot(jnp.concatenate([d, 0.0 * one], 1), rows,
                     precision=lax.Precision.HIGHEST)
    else:
        ao = (o[:, 0][:, None] * r0[None, :] + o[:, 1][:, None] * r1[None, :]
              + o[:, 2][:, None] * r2[None, :] + r3[None, :])
        ad = (d[:, 0][:, None] * r0[None, :] + d[:, 1][:, None] * r1[None, :]
              + d[:, 2][:, None] * r2[None, :])
    no, uo, vo = ao[:, :K], ao[:, K:2 * K], ao[:, 2 * K:]
    nd, ud, vd = ad[:, :K], ad[:, K:2 * K], ad[:, 2 * K:]
    # same near-parallel guard as the dense oracle (accel/dense.py): rays
    # with |nd| <= 1e-20 must MISS there too, or walk/dense parity breaks
    # in the catastrophic-cancellation window just above nd == 0
    live = jnp.abs(nd) > 1e-20
    t = -no / jnp.where(live, nd, 1.0)
    u = uo + t * ud
    v = vo + t * vd
    valid = (live & (t > tnear[:, None]) & (t < tcap[:, None])
             & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0))
    return t, u, v, valid


def _test_rows_cols(r0, r1, r2, r3, o, d, tnear2, tcap2):
    """_test_rows with [*, 1]-column tnear/tcap: the sparse-visit compact
    path keeps every per-slot quantity rank-2 because Mosaic rejects
    rank-1 vectors at sub-lane-width sizes ([cap]=16)."""
    ao = (o[:, 0:1] * r0[None, :] + o[:, 1:2] * r1[None, :]
          + o[:, 2:3] * r2[None, :] + r3[None, :])
    ad = (d[:, 0:1] * r0[None, :] + d[:, 1:2] * r1[None, :]
          + d[:, 2:3] * r2[None, :])
    no, uo, vo = ao[:, :K], ao[:, K:2 * K], ao[:, 2 * K:]
    nd, ud, vd = ad[:, :K], ad[:, K:2 * K], ad[:, 2 * K:]
    live = jnp.abs(nd) > 1e-20
    t = -no / jnp.where(live, nd, 1.0)
    u = uo + t * ud
    v = vo + t * vd
    valid = (live & (t > tnear2) & (t < tcap2)
             & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0))
    return t, u, v, valid


def _closest_kernel(n_real, wide, lo_ref, hi_ref, rows_ref, ids_ref,
                    o_ref, d_ref, tnear_ref, tfar_ref,
                    t_ref, tri_ref, u_ref, v_ref, ent_scr):
    cp = lo_ref.shape[1]
    o = o_ref[:]
    d = d_ref[:]
    tnear = tnear_ref[:, 0]
    tfar = tfar_ref[:, 0]
    ent_scr[:] = _tile_entries(lo_ref, hi_ref, o, d, tnear, tfar, n_real, cp,
                              wide)
    kiota = lax.broadcasted_iota(jnp.int32, (o.shape[0], K), 1)

    emin0, csel0 = _pop_min(ent_scr, wide)

    def cond(s):
        nv, emin, _, thresh, *_ = s
        # front-to-back: nothing left that could beat any ray's best.
        # thresh = max over rays of best_t, refreshed once per (2-visit)
        # iteration — a stale (larger) threshold only delays the stop.
        # _entry_floor: strip the packed id so the comparison is against a
        # floor of the true entry (conservative — never stops early).
        # nv bound: every iteration pops 2 entries, so cp iterations exhaust
        # the heap — a hard stop even if inputs smuggle NaNs past sanitizing.
        efl = emin if wide else _entry_floor(emin)
        return (efl < thresh) & (nv < cp)

    def visit(emin, csel, best_t, best_i, best_u, best_v):
        # best_t starts at tfar and only decreases: it IS the t-cap
        t, u, v, valid = _test_cluster(rows_ref, csel, o, d, tnear, best_t)
        tm = jnp.where(valid, t, jnp.inf)
        bt = jnp.min(tm, axis=1)
        better = bt < best_t
        j = jnp.minimum(jnp.min(jnp.where(tm == bt[:, None], kiota, K), 1),
                        K - 1)
        jhot = (kiota == j[:, None]) & better[:, None]
        ids = ids_ref[pl.ds(csel, 1), :]                 # [1, K]
        tri_new = jnp.sum(jnp.where(jhot, ids, 0), axis=1)
        best_u = jnp.where(better, jnp.sum(jnp.where(jhot, u, 0.0), 1),
                           best_u)
        best_v = jnp.where(better, jnp.sum(jnp.where(jhot, v, 0.0), 1),
                           best_v)
        best_t = jnp.where(better, bt, best_t)
        best_i = jnp.where(better, tri_new, best_i)
        emin, csel = _pop_min(ent_scr, wide)
        return emin, csel, best_t, best_i, best_u, best_v

    def body(s):
        nv, emin, csel, _, best_t, best_i, best_u, best_v = s
        out = visit(emin, csel, best_t, best_i, best_u, best_v)
        out = visit(*out)          # 2 visits per iteration: amortizes the
        emin, csel, best_t, best_i, best_u, best_v = out
        return (nv + 1, emin, csel, _sortable_max(best_t),   # [R]->scalar
                best_t, best_i, best_u, best_v)

    r = o.shape[0]
    best_t0 = jnp.minimum(tfar, jnp.inf)
    init = (jnp.int32(0), emin0, csel0, _sortable_max(best_t0), best_t0,
            jnp.full(r, -1, jnp.int32), jnp.zeros(r), jnp.zeros(r))
    _, _, _, _, best_t, best_i, best_u, best_v = lax.while_loop(cond, body,
                                                                init)
    hit = best_i >= 0
    t_ref[:, 0] = jnp.where(hit, best_t, jnp.inf)
    tri_ref[:, 0] = best_i
    u_ref[:, 0] = best_u
    v_ref[:, 0] = best_v


def _anyhit_kernel(n_real, wide, lo_ref, hi_ref, rows_ref, ids_ref,
                   o_ref, d_ref, tnear_ref, tfar_ref, occ_ref, ent_scr):
    cp = lo_ref.shape[1]
    o = o_ref[:]
    d = d_ref[:]
    tnear = tnear_ref[:, 0]
    tfar = tfar_ref[:, 0]
    ent_scr[:] = _tile_entries(lo_ref, hi_ref, o, d, tnear, tfar, n_real, cp,
                              wide)

    emin0, csel0 = _pop_min(ent_scr, wide)

    def cond(s):
        nv, emin, _, thresh, _ = s
        # a cluster matters only for not-yet-occluded rays within range
        # (occ carried as int32: Mosaic cannot yield i1 vectors in scf.while)
        efl = emin if wide else _entry_floor(emin)
        return (efl < thresh) & (nv < cp)

    def visit(emin, csel, occ):
        _, _, _, valid = _test_cluster(rows_ref, csel, o, d, tnear, tfar)
        occ = jnp.maximum(occ, jnp.any(valid, axis=1).astype(jnp.int32))
        emin, csel = _pop_min(ent_scr, wide)
        return emin, csel, occ

    def body(s):
        nv, emin, csel, _, occ = s
        emin, csel, occ = visit(*visit(emin, csel, occ))
        thresh = _sortable_max(jnp.where(occ > 0, 0.0, tfar))
        return nv + 1, emin, csel, thresh, occ

    occ0 = jnp.zeros(o.shape[0], jnp.int32)
    init = (jnp.int32(0), emin0, csel0, _sortable_max(tfar), occ0)
    _, _, _, _, occ = lax.while_loop(cond, body, init)
    occ_ref[:, 0] = occ


# --- sub-tiled walk (VMEM-resident tables; opt-in, measured NEGATIVE) -----
# The tile walk's recorded SIMD waste: a 64-ray divergent tile visits the
# UNION of its rays' overlapped clusters (~175 at 122k tris) while each ray
# overlaps ~4 — every visit tests all 64 rays against 128 triangles. Here
# the tile is split into `sub` contiguous sub-groups (the coherence sort
# makes neighbors similar), each with its own entry heap ([1, C] scratch
# row) and its own termination cap (max best_t over 8/16 rays instead of
# 64). A sub-group only visits the clusters ITS rays overlap, so IF the
# per-ray union scaled near-linearly in group size, the total pop COUNT
# would stay ~constant while the triangle-test volume dropped by ~sub.
# The entry pass is unchanged (O(R*C) slab work) and still amortized over
# the full tile. Results are exact/bit-identical for the same reason the
# tile walk is: a sub-group's conservative entry floor never skips a
# cluster that could still beat one of its rays' best hits.
#
# MEASURED ON-CHIP (v5e, 122k tris, 262k rays, tools/perf/trace_122k.py —
# checksums bit-identical): LOSES monotonically. sub=2: 98/239 ms
# (coherent/divergent), sub=4: 139/266, sub=8: 196/287, vs 78.5/231.1 for
# the tile walk. Back-solving the visit counts puts the 8-ray union at
# ~45 clusters — divergent rays genuinely don't share traversal, so the
# union shrinks far sublinearly and the extra pops + dynamic row fetches
# cost more than the narrower tests save (the same root cause that sank
# the per-ray pair schedule, STATUS.md "Measured ceilings"). Kept opt-in
# (RUSTLIGHT_TPU_SUBTILES) with an interpret-mode parity test.

def _closest_kernel_sub(n_real, sub, lo_ref, hi_ref, rows_ref, ids_ref,
                        o_ref, d_ref, tnear_ref, tfar_ref,
                        t_ref, tri_ref, u_ref, v_ref, *scrs):
    cp = lo_ref.shape[1]
    o_all = o_ref[:]
    d_all = d_ref[:]
    tnear_all = tnear_ref[:, 0]
    tfar_all = tfar_ref[:, 0]
    rs = o_all.shape[0] // sub
    ent = _tile_entries(lo_ref, hi_ref, o_all, d_all, tnear_all, tfar_all,
                        n_real, cp, False, sub)
    for s in range(sub):
        scrs[s][:] = ent[s:s + 1]
    kiota = lax.broadcasted_iota(jnp.int32, (rs, K), 1)

    for s in range(sub):
        o = o_all[s * rs:(s + 1) * rs]
        d = d_all[s * rs:(s + 1) * rs]
        tnear = tnear_all[s * rs:(s + 1) * rs]
        tfar = tfar_all[s * rs:(s + 1) * rs]
        ent_scr = scrs[s]
        emin0, csel0 = _pop_min(ent_scr, False)

        def cond(st):
            nv, emin, _, thresh, *_ = st
            return (_entry_floor(emin) < thresh) & (nv < cp)

        def visit(emin, csel, best_t, best_i, best_u, best_v):
            t, u, v, valid = _test_cluster(rows_ref, csel, o, d, tnear,
                                           best_t)
            tm = jnp.where(valid, t, jnp.inf)
            bt = jnp.min(tm, axis=1)
            better = bt < best_t
            j = jnp.minimum(
                jnp.min(jnp.where(tm == bt[:, None], kiota, K), 1), K - 1)
            jhot = (kiota == j[:, None]) & better[:, None]
            ids = ids_ref[pl.ds(csel, 1), :]             # [1, K]
            tri_new = jnp.sum(jnp.where(jhot, ids, 0), axis=1)
            best_u = jnp.where(better, jnp.sum(jnp.where(jhot, u, 0.0), 1),
                               best_u)
            best_v = jnp.where(better, jnp.sum(jnp.where(jhot, v, 0.0), 1),
                               best_v)
            best_t = jnp.where(better, bt, best_t)
            best_i = jnp.where(better, tri_new, best_i)
            emin, csel = _pop_min(ent_scr, False)
            return emin, csel, best_t, best_i, best_u, best_v

        def body(st):
            nv, emin, csel, _, best_t, best_i, best_u, best_v = st
            out = visit(emin, csel, best_t, best_i, best_u, best_v)
            out = visit(*out)
            emin, csel, best_t, best_i, best_u, best_v = out
            return (nv + 1, emin, csel, _sortable_max(best_t),
                    best_t, best_i, best_u, best_v)

        best_t0 = jnp.minimum(tfar, jnp.inf)
        init = (jnp.int32(0), emin0, csel0, _sortable_max(best_t0), best_t0,
                jnp.full(rs, -1, jnp.int32), jnp.zeros(rs), jnp.zeros(rs))
        _, _, _, _, best_t, best_i, best_u, best_v = lax.while_loop(
            cond, body, init)
        hit = best_i >= 0
        t_ref[s * rs:(s + 1) * rs, 0] = jnp.where(hit, best_t, jnp.inf)
        tri_ref[s * rs:(s + 1) * rs, 0] = best_i
        u_ref[s * rs:(s + 1) * rs, 0] = best_u
        v_ref[s * rs:(s + 1) * rs, 0] = best_v


def _anyhit_kernel_sub(n_real, sub, lo_ref, hi_ref, rows_ref, ids_ref,
                       o_ref, d_ref, tnear_ref, tfar_ref, occ_ref, *scrs):
    cp = lo_ref.shape[1]
    o_all = o_ref[:]
    d_all = d_ref[:]
    tnear_all = tnear_ref[:, 0]
    tfar_all = tfar_ref[:, 0]
    rs = o_all.shape[0] // sub
    ent = _tile_entries(lo_ref, hi_ref, o_all, d_all, tnear_all, tfar_all,
                        n_real, cp, False, sub)
    for s in range(sub):
        scrs[s][:] = ent[s:s + 1]

    for s in range(sub):
        o = o_all[s * rs:(s + 1) * rs]
        d = d_all[s * rs:(s + 1) * rs]
        tnear = tnear_all[s * rs:(s + 1) * rs]
        tfar = tfar_all[s * rs:(s + 1) * rs]
        ent_scr = scrs[s]
        emin0, csel0 = _pop_min(ent_scr, False)

        def cond(st):
            nv, emin, _, thresh, _ = st
            return (_entry_floor(emin) < thresh) & (nv < cp)

        def visit(emin, csel, occ):
            _, _, _, valid = _test_cluster(rows_ref, csel, o, d, tnear,
                                           tfar)
            occ = jnp.maximum(occ, jnp.any(valid, axis=1).astype(jnp.int32))
            emin, csel = _pop_min(ent_scr, False)
            return emin, csel, occ

        def body(st):
            nv, emin, csel, _, occ = st
            emin, csel, occ = visit(*visit(emin, csel, occ))
            thresh = _sortable_max(jnp.where(occ > 0, 0.0, tfar))
            return nv + 1, emin, csel, thresh, occ

        occ0 = jnp.zeros(rs, jnp.int32)
        init = (jnp.int32(0), emin0, csel0, _sortable_max(tfar), occ0)
        _, _, _, _, occ = lax.while_loop(cond, body, init)
        occ_ref[s * rs:(s + 1) * rs, 0] = occ


# --- sparse-visit walk (VMEM-resident tables, packed pops) ----------------
# The tile walk's recorded SIMD waste: every visit tests all R=64 rays
# against the popped cluster's K triangles, yet on divergent wavefronts only
# ~1.5 rays of the tile actually overlap that cluster (union ~175 visited,
# ~4 overlaps per ray — 122k-tri measurements, STATUS.md). The sub-tile and
# per-ray pair schedules attacked this by REPLICATING the scheduling state
# (private heaps/pops per group) and lost to the added pop + fetch overhead.
# Here the schedule stays exactly the production tile walk — ONE heap, ONE
# pop sequence, ONE row fetch per visit — and only the triangle-test WIDTH
# narrows: the entry pass already computes every ray's slab entry for every
# cluster before min-reducing it away, so it now also persists the per-ray
# entries to a [C, R] VMEM scratch (cluster-major: Mosaic only dynamically
# slices the sublane-major dim). A visit then
#   * reads its cluster's entry row [1, R] (finite = ray overlaps),
#   * if <= SPARSE_CAP rays overlap: compacts them with exact one-hot
#     matmuls (position = strict-lower-triangular prefix sum; one-hot
#     gathers/scatters are exact in f32 at HIGHEST precision — the same
#     contract ops/gather.py relies on) and runs the [SPARSE_CAP, 3K] test,
#   * else: runs the classic dense [R, 3K] test (coherent tiles, where the
#     dense test wastes little anyway).
# Correctness: the compact mask is the tfar-capped slab overlap — a
# superset of the rays the cluster could improve — and scatters only
# strictly-better hits, so results are bit-identical to the dense walk.
#
# MEASURED ON-CHIP (v5e, 122k tris, 262k rays, tools/perf/trace_122k.py —
# checksums bit-identical): LOSES. 179.5/724.0 ms coherent/divergent vs
# 82.2/236.1 for the dense tile walk (0.46x / 0.33x). The narrow test saves
# VPU throughput but the per-visit overhead — three tiny serialized MXU
# dots (prefix-sum, gather, scatter), a dynamic rc-row slice, and an
# scf.if — is LATENCY-bound inside the scalar walk loop, where nothing
# pipelines across the pop -> test -> update dependency chain. Together
# with the pair-walk and sub-tile negatives this closes the schedule-
# narrowing design space: all three ways of not testing non-overlapping
# rays (per-ray scheduling, private sub-heaps, per-visit compaction) cost
# more than the 40x SIMD waste they remove, because the dense [R, 3K] test
# is the one shape this hardware executes at full throughput. Kept opt-in
# (RUSTLIGHT_TPU_SPARSE_VISIT) with a dense-parity test.


def _sparse_visit_tools(r, cap):
    siota = lax.broadcasted_iota(jnp.int32, (r, r), 0)
    liota = lax.broadcasted_iota(jnp.int32, (r, r), 1)
    # strict upper triangular: pos[0, j] = sum_i m[0, i] * (i < j) — the
    # exclusive prefix count of flagged rays before lane j
    triu = (siota < liota).astype(jnp.float32)
    capio = lax.broadcasted_iota(jnp.int32, (cap, 1), 0).astype(jnp.float32)
    return triu, capio


def _compact_rays(mrow_fin, triu, capio, state):
    """One-hot compaction of the rays flagged in mrow_fin [1, R].

    Returns (Wt [cap, R] f32 one-hot, g [cap, 8] gathered ray state). Ray r
    maps to compact slot pos[r] = #flagged rays before r; unflagged rays
    (or rays beyond cap — caller guarantees none) map to no slot. Both the
    prefix-sum dot and the gather dot are exact: 0/1 factors, one term per
    output at HIGHEST precision (ops/gather.py's one-hot contract)."""
    cap, r = capio.shape[0], mrow_fin.shape[1]
    mf = mrow_fin.astype(jnp.float32)                    # [1, R]
    pos = lax.dot(mf, triu, precision=lax.Precision.HIGHEST)   # [1, R]
    # explicit broadcasts: Mosaic's layout inference is happier with
    # broadcast_to than with implicit two-way [1,R] x [cap,1] broadcasting
    pos_b = jnp.broadcast_to(pos, (cap, r))
    cap_b = jnp.broadcast_to(capio, (cap, r))
    m_b = jnp.broadcast_to(mrow_fin, (cap, r))
    Wt = jnp.where(m_b, (pos_b == cap_b).astype(jnp.float32), 0.0)
    g = lax.dot(Wt, state, precision=lax.Precision.HIGHEST)    # [cap, 8]
    return Wt, g


def _closest_kernel_sparse(n_real, cap, lo_ref, hi_ref, rows_ref, ids_ref,
                           o_ref, d_ref, tnear_ref, tfar_ref,
                           t_ref, tri_ref, u_ref, v_ref, ent_scr, rc_scr):
    cp = lo_ref.shape[1]
    r = o_ref.shape[0]
    o = o_ref[:]
    d = d_ref[:]
    tnear = tnear_ref[:, 0]
    tfar = tfar_ref[:, 0]
    ent_scr[:] = _tile_entries(lo_ref, hi_ref, o, d, tnear, tfar, n_real, cp,
                               rc_ref=rc_scr)
    kiota = lax.broadcasted_iota(jnp.int32, (r, K), 1)
    kiota8 = lax.broadcasted_iota(jnp.int32, (cap, K), 1)
    triu, capio = _sparse_visit_tools(r, cap)
    # the one-hot gather SUMS 0 * state[r'] over every non-selected ray, and
    # 0 * inf = NaN: one dead lane (NaN o/d) or one inf tnear (tile padding)
    # would poison every gathered row. Sanitize the gathered copy only —
    # such lanes never flag (their entries are inf), so parity is unaffected.
    o_s = jnp.where(jnp.isfinite(o), o, 0.0)
    d_s = jnp.where(jnp.isfinite(d), d, 0.0)
    tn_s = jnp.where(jnp.isfinite(tnear), tnear, _FMAX)
    state7 = jnp.concatenate([o_s, d_s, tn_s[:, None]], axis=1)  # [R, 7]

    emin0, csel0 = _pop_min(ent_scr, False)

    def cond(s):
        nv, emin, _, thresh, *_ = s
        return (_entry_floor(emin) < thresh) & (nv < cp)

    def visit(emin, csel, best_t, best_i, best_u, best_v):
        # all ref reads happen OUTSIDE the cond: branch closures over VMEM
        # refs are fragile across Pallas lowerings; the branches below are
        # pure functions of these operands
        mrow = rc_scr[pl.ds(csel, 1), :] < jnp.inf       # [1, R]
        cnt = jnp.sum(mrow.astype(jnp.int32))
        r0 = rows_ref[0, pl.ds(csel, 1), :][0]           # [3K]
        r1 = rows_ref[1, pl.ds(csel, 1), :][0]
        r2 = rows_ref[2, pl.ds(csel, 1), :][0]
        r3 = rows_ref[3, pl.ds(csel, 1), :][0]
        ids = ids_ref[pl.ds(csel, 1), :]                 # [1, K]

        def sparse(best_t, best_i, best_u, best_v):
            # inf best_t (no hit yet) -> FMAX: an uncapped test, NaN-free.
            # EVERYTHING below stays rank-2: Mosaic rejects rank-1 vectors
            # of sub-lane-width sizes ([cap]=16), so the compact path works
            # in [cap, 1] columns throughout (layout_rank check, measured).
            bt_s = jnp.minimum(best_t, _FMAX)
            state = jnp.concatenate([state7, bt_s[:, None]], axis=1)
            Wt, g = _compact_rays(mrow, triu, capio, state)
            o8, d8 = g[:, 0:3], g[:, 3:6]
            tn8, cap8 = g[:, 6:7], g[:, 7:8]             # [cap, 1]
            # empty slots gather zeros: d8 = 0 -> |nd| <= 1e-20 -> miss
            t, u, v, valid = _test_rows_cols(r0, r1, r2, r3, o8, d8, tn8,
                                             cap8)
            tm = jnp.where(valid, t, jnp.inf)
            bt8 = jnp.min(tm, axis=1, keepdims=True)     # [cap, 1]
            better8 = bt8 < cap8
            j8 = jnp.minimum(
                jnp.min(jnp.where(tm == bt8, kiota8, K), 1, keepdims=True),
                K - 1)
            jhot = (kiota8 == j8) & better8
            tri8 = jnp.sum(jnp.where(jhot, ids, 0), axis=1,
                           keepdims=True)                # [cap, 1] i32
            u8 = jnp.sum(jnp.where(jhot, u, 0.0), 1, keepdims=True)
            v8 = jnp.sum(jnp.where(jhot, v, 0.0), 1, keepdims=True)
            # scatter compact slot k back to its ray lane with ONE
            # transposed-contraction dot: S[r, c] = sum_k Wm[k, r] P[k, c].
            # Wm columns have at most one 1 (exact one-hot at HIGHEST).
            # bt8 is masked first: a no-hit slot has bt8 = inf and Wm = 0,
            # and 0 * inf = NaN would poison the sum. tri ids ride as f32 —
            # exact below 2^24, and the sparse path only runs on resident
            # tables (<= MAX_VMEM_CLUSTERS * K = 2^18 triangles).
            Wm = Wt * better8                            # [cap, R]
            P = jnp.concatenate(
                [better8.astype(jnp.float32),
                 jnp.where(better8, bt8, 0.0), u8, v8,
                 tri8.astype(jnp.float32)], axis=1)      # [cap, 5]
            S = lax.dot_general(Wm, P, (((0,), (0,)), ((), ())),
                                precision=lax.Precision.HIGHEST)   # [R, 5]
            flag = S[:, 0] > 0.0                         # [R]
            return (jnp.where(flag, S[:, 1], best_t),
                    jnp.where(flag, S[:, 4].astype(jnp.int32), best_i),
                    jnp.where(flag, S[:, 2], best_u),
                    jnp.where(flag, S[:, 3], best_v))

        def dense(best_t, best_i, best_u, best_v):
            t, u, v, valid = _test_rows(r0, r1, r2, r3, o, d, tnear, best_t)
            tm = jnp.where(valid, t, jnp.inf)
            bt = jnp.min(tm, axis=1)
            better = bt < best_t
            j = jnp.minimum(
                jnp.min(jnp.where(tm == bt[:, None], kiota, K), 1), K - 1)
            jhot = (kiota == j[:, None]) & better[:, None]
            tri_new = jnp.sum(jnp.where(jhot, ids, 0), axis=1)
            return (jnp.where(better, bt, best_t),
                    jnp.where(better, tri_new, best_i),
                    jnp.where(better, jnp.sum(jnp.where(jhot, u, 0.0), 1),
                              best_u),
                    jnp.where(better, jnp.sum(jnp.where(jhot, v, 0.0), 1),
                              best_v))

        best_t, best_i, best_u, best_v = lax.cond(
            cnt <= cap, sparse, dense, best_t, best_i, best_u, best_v)
        emin, csel = _pop_min(ent_scr, False)
        return emin, csel, best_t, best_i, best_u, best_v

    def body(s):
        nv, emin, csel, _, best_t, best_i, best_u, best_v = s
        out = visit(emin, csel, best_t, best_i, best_u, best_v)
        out = visit(*out)
        emin, csel, best_t, best_i, best_u, best_v = out
        return (nv + 1, emin, csel, _sortable_max(best_t),
                best_t, best_i, best_u, best_v)

    best_t0 = jnp.minimum(tfar, jnp.inf)
    init = (jnp.int32(0), emin0, csel0, _sortable_max(best_t0), best_t0,
            jnp.full(r, -1, jnp.int32), jnp.zeros(r), jnp.zeros(r))
    _, _, _, _, best_t, best_i, best_u, best_v = lax.while_loop(cond, body,
                                                                init)
    hit = best_i >= 0
    t_ref[:, 0] = jnp.where(hit, best_t, jnp.inf)
    tri_ref[:, 0] = best_i
    u_ref[:, 0] = best_u
    v_ref[:, 0] = best_v


def _anyhit_kernel_sparse(n_real, cap, lo_ref, hi_ref, rows_ref, ids_ref,
                          o_ref, d_ref, tnear_ref, tfar_ref, occ_ref,
                          ent_scr, rc_scr):
    cp = lo_ref.shape[1]
    r = o_ref.shape[0]
    o = o_ref[:]
    d = d_ref[:]
    tnear = tnear_ref[:, 0]
    tfar = tfar_ref[:, 0]
    ent_scr[:] = _tile_entries(lo_ref, hi_ref, o, d, tnear, tfar, n_real, cp,
                               rc_ref=rc_scr)
    triu, capio = _sparse_visit_tools(r, cap)
    # sanitized gather copy — see _closest_kernel_sparse (0 * inf = NaN)
    o_s = jnp.where(jnp.isfinite(o), o, 0.0)
    d_s = jnp.where(jnp.isfinite(d), d, 0.0)
    tn_s = jnp.where(jnp.isfinite(tnear), tnear, _FMAX)
    tf_s = jnp.minimum(tfar, _FMAX)
    state8 = jnp.concatenate([o_s, d_s, tn_s[:, None], tf_s[:, None]],
                             axis=1)

    emin0, csel0 = _pop_min(ent_scr, False)

    def cond(s):
        nv, emin, _, thresh, _ = s
        return (_entry_floor(emin) < thresh) & (nv < cp)

    def visit(emin, csel, occ):
        # ref reads hoisted out of the cond (see _closest_kernel_sparse)
        mrow = rc_scr[pl.ds(csel, 1), :] < jnp.inf       # [1, R]
        cnt = jnp.sum(mrow.astype(jnp.int32))
        r0 = rows_ref[0, pl.ds(csel, 1), :][0]           # [3K]
        r1 = rows_ref[1, pl.ds(csel, 1), :][0]
        r2 = rows_ref[2, pl.ds(csel, 1), :][0]
        r3 = rows_ref[3, pl.ds(csel, 1), :][0]

        def sparse(occ):
            # rank-2 throughout — see _closest_kernel_sparse
            Wt, g = _compact_rays(mrow, triu, capio, state8)
            _, _, _, valid = _test_rows_cols(r0, r1, r2, r3, g[:, 0:3],
                                             g[:, 3:6], g[:, 6:7], g[:, 7:8])
            hit8 = jnp.any(valid, axis=1, keepdims=True) \
                      .astype(jnp.float32)               # [cap, 1]
            # one-dot scatter (see _closest_kernel_sparse)
            S = lax.dot_general(Wt, hit8, (((0,), (0,)), ((), ())),
                                precision=lax.Precision.HIGHEST)   # [R, 1]
            return jnp.maximum(occ, (S[:, 0] > 0.0).astype(jnp.int32))

        def dense(occ):
            _, _, _, valid = _test_rows(r0, r1, r2, r3, o, d, tnear, tfar)
            return jnp.maximum(occ, jnp.any(valid, axis=1).astype(jnp.int32))

        occ = lax.cond(cnt <= cap, sparse, dense, occ)
        emin, csel = _pop_min(ent_scr, False)
        return emin, csel, occ

    def body(s):
        nv, emin, csel, _, occ = s
        emin, csel, occ = visit(*visit(emin, csel, occ))
        thresh = _sortable_max(jnp.where(occ > 0, 0.0, tfar))
        return nv + 1, emin, csel, thresh, occ

    occ0 = jnp.zeros(r, jnp.int32)
    init = (jnp.int32(0), emin0, csel0, _sortable_max(tfar), occ0)
    _, _, _, _, occ = lax.while_loop(cond, body, init)
    occ_ref[:, 0] = occ


def _closest_kernel_hbm(n_real, wide, lo_ref, hi_ref, rows_hbm,
                        o_ref, d_ref, tnear_ref, tfar_ref,
                        t_ref, tri_ref, u_ref, v_ref,
                        ent_scr, rbuf, sem):
    """HBM-resident variant: cluster blocks stay in HBM; each visit DMAs one
    cluster's [1, 8, 3K] block (rows + bitcast ids) into a double-buffered
    VMEM scratch, prefetching the next cluster while the current one is
    tested. Slots are STATIC (two visits per loop iteration, slot0 then
    slot1) so buffer reads never need a dynamic leading index. Invariant at
    loop entry: slot0 holds the current cluster's in-flight DMA; exactly
    slot0 is outstanding at loop exit."""
    cp = lo_ref.shape[1]
    o = o_ref[:]
    d = d_ref[:]
    tnear = tnear_ref[:, 0]
    tfar = tfar_ref[:, 0]
    ent_scr[:] = _tile_entries(lo_ref, hi_ref, o, d, tnear, tfar, n_real, cp,
                              wide)
    kiota = lax.broadcasted_iota(jnp.int32, (o.shape[0], K), 1)

    def dma_rows(csel, slot):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(csel, 1), :, :], rbuf.at[slot], sem.at[slot])

    def test_update(slot, best_t, best_i, best_u, best_v):
        r = rbuf[slot]                                   # [1, 8, 3K] static
        t, u, v, valid = _test_rows(r[0, 0], r[0, 1], r[0, 2], r[0, 3],
                                    o, d, tnear, best_t)
        tm = jnp.where(valid, t, jnp.inf)
        bt = jnp.min(tm, axis=1)
        better = bt < best_t
        j = jnp.minimum(jnp.min(jnp.where(tm == bt[:, None], kiota, K), 1),
                        K - 1)
        jhot = (kiota == j[:, None]) & better[:, None]
        ids = lax.bitcast_convert_type(r[0, 4:5, :K], jnp.int32)   # [1, K]
        tri_new = jnp.sum(jnp.where(jhot, ids, 0), axis=1)
        best_u = jnp.where(better, jnp.sum(jnp.where(jhot, u, 0.0), 1),
                           best_u)
        best_v = jnp.where(better, jnp.sum(jnp.where(jhot, v, 0.0), 1),
                           best_v)
        return (jnp.where(better, bt, best_t),
                jnp.where(better, tri_new, best_i), best_u, best_v)

    emin0, csel0 = _pop_min(ent_scr, wide)
    dma_rows(csel0, 0).start()
    emin1, csel1 = _pop_min(ent_scr, wide)

    def cond(s):
        nv, emin_c, *_ = s
        thresh = s[5]
        efl = emin_c if wide else _entry_floor(emin_c)
        return (efl < thresh) & (nv < cp)

    def body(s):
        nv, emin_c, csel_c, emin_n, csel_n, _, bt, bi, bu, bv = s
        dma_rows(csel_n, 1).start()       # prefetch next while testing cur
        dma_rows(csel_c, 0).wait()
        bt, bi, bu, bv = test_update(0, bt, bi, bu, bv)
        emin_2, csel_2 = _pop_min(ent_scr, wide)
        dma_rows(csel_2, 0).start()       # prefetch new cur into slot0
        dma_rows(csel_n, 1).wait()
        bt, bi, bu, bv = test_update(1, bt, bi, bu, bv)
        emin_3, csel_3 = _pop_min(ent_scr, wide)
        return (nv + 1, emin_2, csel_2, emin_3, csel_3,
                _sortable_max(bt), bt, bi, bu, bv)

    r = o.shape[0]
    best_t0 = jnp.minimum(tfar, jnp.inf)
    init = (jnp.int32(0), emin0, csel0, emin1, csel1, _sortable_max(best_t0),
            best_t0, jnp.full(r, -1, jnp.int32), jnp.zeros(r), jnp.zeros(r))
    out = lax.while_loop(cond, body, init)
    _, _, csel_c, _, _, _, best_t, best_i, best_u, best_v = out
    dma_rows(csel_c, 0).wait()            # drain the outstanding slot-0 DMA
    hit = best_i >= 0
    t_ref[:, 0] = jnp.where(hit, best_t, jnp.inf)
    tri_ref[:, 0] = best_i
    u_ref[:, 0] = best_u
    v_ref[:, 0] = best_v


def _anyhit_kernel_hbm(n_real, wide, lo_ref, hi_ref, rows_hbm,
                       o_ref, d_ref, tnear_ref, tfar_ref, occ_ref,
                       ent_scr, rbuf, sem):
    cp = lo_ref.shape[1]
    o = o_ref[:]
    d = d_ref[:]
    tnear = tnear_ref[:, 0]
    tfar = tfar_ref[:, 0]
    ent_scr[:] = _tile_entries(lo_ref, hi_ref, o, d, tnear, tfar, n_real, cp,
                              wide)

    def dma_rows(csel, slot):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(csel, 1), :, :], rbuf.at[slot], sem.at[slot])

    def test(slot, occ):
        r = rbuf[slot]
        _, _, _, valid = _test_rows(r[0, 0], r[0, 1], r[0, 2], r[0, 3],
                                    o, d, tnear, tfar)
        return jnp.maximum(occ, jnp.any(valid, axis=1).astype(jnp.int32))

    emin0, csel0 = _pop_min(ent_scr, wide)
    dma_rows(csel0, 0).start()
    emin1, csel1 = _pop_min(ent_scr, wide)

    def cond(s):
        nv, emin_c, _, _, _, thresh, _ = s
        efl = emin_c if wide else _entry_floor(emin_c)
        return (efl < thresh) & (nv < cp)

    def body(s):
        nv, emin_c, csel_c, emin_n, csel_n, _, occ = s
        dma_rows(csel_n, 1).start()
        dma_rows(csel_c, 0).wait()
        occ = test(0, occ)
        emin_2, csel_2 = _pop_min(ent_scr, wide)
        dma_rows(csel_2, 0).start()
        dma_rows(csel_n, 1).wait()
        occ = test(1, occ)
        emin_3, csel_3 = _pop_min(ent_scr, wide)
        thresh = _sortable_max(jnp.where(occ > 0, 0.0, tfar))
        return nv + 1, emin_2, csel_2, emin_3, csel_3, thresh, occ

    occ0 = jnp.zeros(o.shape[0], jnp.int32)
    init = (jnp.int32(0), emin0, csel0, emin1, csel1, _sortable_max(tfar),
            occ0)
    _, _, csel_c, _, _, _, occ = lax.while_loop(cond, body, init)
    dma_rows(csel_c, 0).wait()
    occ_ref[:, 0] = occ


# --- hierarchical (two-level) HBM walk ------------------------------------
# Production path for > 2^14-cluster scenes (always non-resident at that
# size), replacing wide mode: wide pays an O(R*C) slab entry pass plus an
# O(C) argmin recovery on EVERY pop, which dominates multi-M-tri renders
# (4.9M tris = 55792 clusters). Here the entry pass runs over S = C/SUP
# super AABBs (packed pops, id bits ride the mantissa again since S stays
# under 2^14 up to ~270M tris), and opening a super lazily computes its SUP
# child entries — capped per-ray by the CURRENT best_t, so far-side
# children drop out before they are ever popped. Front-to-back ordering is
# per-super (children of an opened super drain before the next super
# opens); termination stays conservative because a super's entry lower-
# bounds all its children's entries.


def _child_entries(lo_h_ref, hi_h_ref, ssel, base, o, inv, tnear, cap,
                   n_real):
    """Entries for super `ssel`'s SUP children: [1, SUP] with the local
    child id packed into the low _CHILD_BITS mantissa bits. `cap` is the
    per-ray improvement bound (best_t for closest; tfar gated on occlusion
    for anyhit) — tighter than the flat kernels' static tfar cap."""
    r = o.shape[0]
    tmin = jnp.full((r, SUP), -jnp.inf)
    tmax = jnp.full((r, SUP), jnp.inf)
    for j in range(3):
        l = lo_h_ref[j, pl.ds(ssel, 1), :][0]            # [SUP]
        h = hi_h_ref[j, pl.ds(ssel, 1), :][0]
        t0 = (l[None, :] - o[:, j][:, None]) * inv[:, j][:, None]
        t1 = (h[None, :] - o[:, j][:, None]) * inv[:, j][:, None]
        tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
        tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
    entry = jnp.maximum(tmin, tnear[:, None])
    ok = (tmax >= entry) & (entry < cap[:, None])
    ent = jnp.min(jnp.where(ok, entry, jnp.inf), axis=0, keepdims=True)
    liota = lax.broadcasted_iota(jnp.int32, (1, SUP), 1)
    fin = (base + liota < n_real) & jnp.isfinite(ent)
    bits = lax.bitcast_convert_type(jnp.maximum(ent, 0.0), jnp.int32)
    packed = lax.bitcast_convert_type(
        (bits & ~((1 << _CHILD_BITS) - 1)) | liota, jnp.float32)
    return jnp.where(fin, packed, jnp.inf)


def _closest_kernel_hbm_hier(n_real, n_sup, slo_ref, shi_ref,
                             lo_h_ref, hi_h_ref, rows_hbm,
                             o_ref, d_ref, tnear_ref, tfar_ref,
                             t_ref, tri_ref, u_ref, v_ref,
                             sup_scr, child_scr, rbuf, sem):
    sp = slo_ref.shape[1]
    o = o_ref[:]
    d = d_ref[:]
    tnear = tnear_ref[:, 0]
    tfar = tfar_ref[:, 0]
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d,
                          jnp.where(d >= 0, 1e-12, -1e-12))
    sup_scr[:] = _tile_entries(slo_ref, shi_ref, o, d, tnear, tfar, n_sup,
                               sp)
    kiota = lax.broadcasted_iota(jnp.int32, (o.shape[0], K), 1)

    def dma_rows(csel, slot):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(csel, 1), :, :], rbuf.at[slot], sem.at[slot])

    def test_update(slot, best_t, best_i, best_u, best_v):
        r = rbuf[slot]                                   # [1, 8, 3K] static
        t, u, v, valid = _test_rows(r[0, 0], r[0, 1], r[0, 2], r[0, 3],
                                    o, d, tnear, best_t)
        tm = jnp.where(valid, t, jnp.inf)
        bt = jnp.min(tm, axis=1)
        better = bt < best_t
        j = jnp.minimum(jnp.min(jnp.where(tm == bt[:, None], kiota, K), 1),
                        K - 1)
        jhot = (kiota == j[:, None]) & better[:, None]
        ids = lax.bitcast_convert_type(r[0, 4:5, :K], jnp.int32)   # [1, K]
        tri_new = jnp.sum(jnp.where(jhot, ids, 0), axis=1)
        best_u = jnp.where(better, jnp.sum(jnp.where(jhot, u, 0.0), 1),
                           best_u)
        best_v = jnp.where(better, jnp.sum(jnp.where(jhot, v, 0.0), 1),
                           best_v)
        return (jnp.where(better, bt, best_t),
                jnp.where(better, tri_new, best_i), best_u, best_v)

    def pop_child(base):
        # inf pop -> local 0 -> a clamped harmless re-test (loop is ending)
        emin, lsel = _pop_min(child_scr, id_bits=_CHILD_BITS)
        return emin, jnp.minimum(base + lsel, n_real - 1)

    semin0, ssel0 = _pop_min(sup_scr)

    def s_cond(s):
        ns, semin, _, thresh, *_ = s
        # super entry lower-bounds every child entry: stopping when its
        # floor clears the threshold never skips an improvable cluster
        return (_entry_floor(semin) < thresh) & (ns < sp)

    def s_body(s):
        ns, semin, ssel, thresh, best_t, best_i, best_u, best_v = s
        base = ssel * SUP
        child_scr[:] = _child_entries(lo_h_ref, hi_h_ref, ssel, base, o,
                                      inv, tnear, best_t, n_real)
        cemin0, csel0 = pop_child(base)
        dma_rows(csel0, 0).start()
        cemin1, csel1 = pop_child(base)

        def c_cond(t):
            ni, cemin_c, _, _, _, th, *_ = t
            return (_entry_floor(cemin_c, _CHILD_BITS) < th) & (ni < SUP)

        def c_body(t):
            ni, cemin_c, csel_c, cemin_n, csel_n, _, bt, bi, bu, bv = t
            dma_rows(csel_n, 1).start()   # prefetch next while testing cur
            dma_rows(csel_c, 0).wait()
            bt, bi, bu, bv = test_update(0, bt, bi, bu, bv)
            cemin_2, csel_2 = pop_child(base)
            dma_rows(csel_2, 0).start()
            dma_rows(csel_n, 1).wait()
            bt, bi, bu, bv = test_update(1, bt, bi, bu, bv)
            cemin_3, csel_3 = pop_child(base)
            return (ni + 1, cemin_2, csel_2, cemin_3, csel_3,
                    _sortable_max(bt), bt, bi, bu, bv)

        init = (jnp.int32(0), cemin0, csel0, cemin1, csel1, thresh,
                best_t, best_i, best_u, best_v)
        out = lax.while_loop(c_cond, c_body, init)
        _, _, csel_c, _, _, _, best_t, best_i, best_u, best_v = out
        dma_rows(csel_c, 0).wait()        # drain the outstanding slot-0 DMA
        semin_n, ssel_n = _pop_min(sup_scr)
        return (ns + 1, semin_n, ssel_n, _sortable_max(best_t),
                best_t, best_i, best_u, best_v)

    r = o.shape[0]
    best_t0 = jnp.minimum(tfar, jnp.inf)
    init = (jnp.int32(0), semin0, ssel0, _sortable_max(best_t0), best_t0,
            jnp.full(r, -1, jnp.int32), jnp.zeros(r), jnp.zeros(r))
    out = lax.while_loop(s_cond, s_body, init)
    _, _, _, _, best_t, best_i, best_u, best_v = out
    hit = best_i >= 0
    t_ref[:, 0] = jnp.where(hit, best_t, jnp.inf)
    tri_ref[:, 0] = best_i
    u_ref[:, 0] = best_u
    v_ref[:, 0] = best_v


def _anyhit_kernel_hbm_hier(n_real, n_sup, slo_ref, shi_ref,
                            lo_h_ref, hi_h_ref, rows_hbm,
                            o_ref, d_ref, tnear_ref, tfar_ref, occ_ref,
                            sup_scr, child_scr, rbuf, sem):
    sp = slo_ref.shape[1]
    o = o_ref[:]
    d = d_ref[:]
    tnear = tnear_ref[:, 0]
    tfar = tfar_ref[:, 0]
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d,
                          jnp.where(d >= 0, 1e-12, -1e-12))
    sup_scr[:] = _tile_entries(slo_ref, shi_ref, o, d, tnear, tfar, n_sup,
                               sp)

    def dma_rows(csel, slot):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(csel, 1), :, :], rbuf.at[slot], sem.at[slot])

    def test(slot, occ):
        r = rbuf[slot]
        _, _, _, valid = _test_rows(r[0, 0], r[0, 1], r[0, 2], r[0, 3],
                                    o, d, tnear, tfar)
        return jnp.maximum(occ, jnp.any(valid, axis=1).astype(jnp.int32))

    def pop_child(base):
        emin, lsel = _pop_min(child_scr, id_bits=_CHILD_BITS)
        return emin, jnp.minimum(base + lsel, n_real - 1)

    semin0, ssel0 = _pop_min(sup_scr)

    def s_cond(s):
        ns, semin, _, thresh, _ = s
        return (_entry_floor(semin) < thresh) & (ns < sp)

    def s_body(s):
        ns, semin, ssel, thresh, occ = s
        base = ssel * SUP
        cap = jnp.where(occ > 0, 0.0, tfar)
        child_scr[:] = _child_entries(lo_h_ref, hi_h_ref, ssel, base, o,
                                      inv, tnear, cap, n_real)
        cemin0, csel0 = pop_child(base)
        dma_rows(csel0, 0).start()
        cemin1, csel1 = pop_child(base)

        def c_cond(t):
            ni, cemin_c, _, _, _, th, _ = t
            return (_entry_floor(cemin_c, _CHILD_BITS) < th) & (ni < SUP)

        def c_body(t):
            ni, cemin_c, csel_c, cemin_n, csel_n, _, occ_i = t
            dma_rows(csel_n, 1).start()
            dma_rows(csel_c, 0).wait()
            occ_i = test(0, occ_i)
            cemin_2, csel_2 = pop_child(base)
            dma_rows(csel_2, 0).start()
            dma_rows(csel_n, 1).wait()
            occ_i = test(1, occ_i)
            cemin_3, csel_3 = pop_child(base)
            th = _sortable_max(jnp.where(occ_i > 0, 0.0, tfar))
            return (ni + 1, cemin_2, csel_2, cemin_3, csel_3, th, occ_i)

        init = (jnp.int32(0), cemin0, csel0, cemin1, csel1, thresh, occ)
        out = lax.while_loop(c_cond, c_body, init)
        _, _, csel_c, _, _, _, occ = out
        dma_rows(csel_c, 0).wait()
        semin_n, ssel_n = _pop_min(sup_scr)
        thresh_n = _sortable_max(jnp.where(occ > 0, 0.0, tfar))
        return ns + 1, semin_n, ssel_n, thresh_n, occ

    occ0 = jnp.zeros(o.shape[0], jnp.int32)
    init = (jnp.int32(0), semin0, ssel0, _sortable_max(tfar), occ0)
    _, _, _, _, occ = lax.while_loop(s_cond, s_body, init)
    occ_ref[:, 0] = occ


@partial(jax.jit, static_argnames=("any_hit", "interpret", "sort_rays",
                                   "wide", "hier", "sub", "sparse",
                                   "compact_inert", "inc_sort"))
def _walk_impl(wt: WalkTables, o, d, tnear, tfar, any_hit: bool,
               interpret: bool = False, sort_rays: bool = True,
               wide: bool = None, hier: bool = None, sub: int = None,
               sparse: bool = None, compact_inert: bool = None,
               inc_sort: bool = None):
    n = o.shape[0]
    cp = wt.n_clusters
    # packed entry+id pops cap at 2^14 clusters; larger scenes use the
    # two-level hierarchical walk (RUSTLIGHT_TPU_NO_HIER=1 falls back to
    # the unpacked wide pop). Tests force hier/wide on small scenes.
    if hier is None and wide is None:
        hier = (cp > (1 << _ID_BITS) and not wt.resident
                and wt.lo_h is not None and not _NO_HIER)
    hier = bool(hier) and not wt.resident and wt.lo_h is not None
    if wide is None:
        wide = cp > (1 << _ID_BITS) and not hier
    # packed pops OR the cluster id into _ID_BITS mantissa bits; a larger
    # table in packed mode would silently corrupt entries AND selections
    if not wide and not hier and cp > (1 << _ID_BITS):
        raise ValueError(
            f"walk: {cp} clusters exceed the packed-id budget "
            f"(2^{_ID_BITS}); use wide=True/hier=True (or leave them None)")
    # sanitize: dead wavefront lanes can carry NaN rays/ranges. A NaN best_t
    # would bitcast ABOVE +inf in the kernel's sortable-int ordering and spin
    # the walk loop forever (TPU watchdog kill). NaN/negative tfar -> 0
    # (inert ray), NaN tnear -> +inf.
    tfar = jnp.where(tfar > 0, tfar, 0.0)
    tnear = jnp.where(tnear >= 0, tnear, jnp.inf)

    # coherence sort (payload sort, no gathers); un-sorted by lane id below
    sort_rays = sort_rays and n >= 2 * RAY_TILE and wt.world_lo is not None
    if compact_inert is None:
        compact_inert = COMPACT_INERT_DEFAULT
    if inc_sort is None:
        inc_sort = INCIDENCE_SORT_DEFAULT
    inc_sort = bool(inc_sort) and cp <= _INC_SORT_MAX_C
    if sort_rays:
        o_safe = jnp.where(jnp.isfinite(o), o, 0.0)
        d_safe = jnp.where(jnp.isfinite(d), d, 0.0)
        if inc_sort:
            # per-wavefront selection: point-origin wavefronts (pinhole
            # camera / point-light rays — every live origin identical)
            # measure BETTER under the morton key (coherent union 8.4 vs
            # the incidence key's 9.2, and they skip the [N, C] slab
            # pre-pass); spread-origin wavefronts (bounce/shadow/AO) take
            # the incidence key. lax.cond evaluates only the taken branch.
            live = (tfar > 0.0)[:, None]
            # fill dead lanes with the FIRST LIVE origin (lane 0 itself may
            # be inert with a sanitized garbage origin)
            ref_o = o_safe[jnp.argmax(tfar > 0.0)]
            o_live = jnp.where(live, o_safe, ref_o[None, :])
            spread = jnp.max(jnp.max(o_live, 0) - jnp.min(o_live, 0))
            ext = jnp.max(wt.world_hi - wt.world_lo)
            kmaj, kmin = lax.cond(
                spread > 1e-5 * ext,
                lambda: _incidence_key(wt, o_safe, d_safe, tnear, tfar),
                lambda: _sort_key(wt, o_safe, d_safe,
                                  tfar if compact_inert else None))
        else:
            kmaj, kmin = _sort_key(
                wt, o_safe, d_safe, tfar if compact_inert else None)
        lane = lax.iota(jnp.int32, n)
        (_, _, o0, o1, o2, d0, d1, d2, tnear, tfar, lane) = lax.sort(
            (kmaj, kmin, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1],
             d[:, 2], tnear, tfar, lane), dimension=0, num_keys=2)
        o = jnp.stack([o0, o1, o2], -1)
        d = jnp.stack([d0, d1, d2], -1)

    pad = (-n) % RAY_TILE
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)], 0)
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)], 0)
        tnear = jnp.concatenate([tnear, jnp.full(pad, jnp.inf)], 0)
        tfar = jnp.concatenate([tfar, jnp.zeros(pad)], 0)
    n_pad = o.shape[0]
    g = n_pad // RAY_TILE
    grid = (g,)
    # per-ray scalars ride as [n, 1] columns: 1D blocks fight XLA's
    # 1024-element tiling for f32[n] operands, and (1, R) row blocks violate
    # the 8-sublane block rule
    tnear2 = tnear.reshape(n_pad, 1)
    tfar2 = tfar.reshape(n_pad, 1)

    const = lambda spec_shape: pl.BlockSpec(
        spec_shape, lambda i: tuple(0 for _ in spec_shape),
        memory_space=pltpu.VMEM)
    ray2 = pl.BlockSpec((RAY_TILE, 3), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    row = pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    assert wt.n_real > 0, "WalkTables built without n_real"
    if hier:
        sp = wt.n_sup_pad
        in_specs = [
            const((3, sp)), const((3, sp)),              # slo, shi
            const((3, sp, SUP)), const((3, sp, SUP)),    # lo_h, hi_h
            pl.BlockSpec(memory_space=pl.ANY),           # rows (HBM)
            ray2, ray2, row, row,
        ]
        args = (wt.slo, wt.shi, wt.lo_h, wt.hi_h, wt.rows,
                o, d, tnear2, tfar2)
        scratch = [
            pltpu.VMEM((1, sp), jnp.float32),            # sup_scr
            pltpu.VMEM((1, SUP), jnp.float32),           # child_scr
            pltpu.VMEM((2, 1, 8, 3 * K), jnp.float32),   # rbuf
            pltpu.SemaphoreType.DMA((2,)),
        ]
        cparams = pltpu.CompilerParams()
        k_closest = partial(_closest_kernel_hbm_hier, wt.n_real, wt.n_sup)
        k_anyhit = partial(_anyhit_kernel_hbm_hier, wt.n_real, wt.n_sup)
    elif wt.resident:
        table_specs = [const((4, cp, 3 * K)), const((cp, K))]
        extra_scratch = []
        k_closest, k_anyhit = _closest_kernel, _anyhit_kernel
        tables = (wt.rows, wt.ids)
    else:
        # cluster blocks stay in HBM; kernels double-buffer per-visit DMAs
        table_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        extra_scratch = [
            pltpu.VMEM((2, 1, 8, 3 * K), jnp.float32),   # rbuf
            pltpu.SemaphoreType.DMA((2,)),
        ]
        k_closest, k_anyhit = _closest_kernel_hbm, _anyhit_kernel_hbm
        tables = (wt.rows,)
    if not hier:
        # sub-tiled schedule (resident, packed-pop scenes only): split the
        # ray tile into `sub` groups with private entry heaps/caps — cuts
        # the per-visit triangle-test width by ~sub at ~constant pop count
        # on divergent wavefronts (see _closest_kernel_sub).
        if sub is None:
            sub = SUBTILES_DEFAULT
        sub = sub if (wt.resident and not wide and sub > 1
                      and RAY_TILE % (8 * sub) == 0) else 1
        in_specs = [
            const((3, cp)), const((3, cp)),              # lo, hi
            *table_specs,                                # rows (+ids)
            ray2, ray2, row, row,
        ]
        args = (wt.lo, wt.hi, *tables, o, d, tnear2, tfar2)
        if sparse is None:
            sparse = SPARSE_DEFAULT
        sparse = bool(sparse) and wt.resident and not wide and sub == 1
        if sparse and MXU_TRITEST:
            # the sparse compact path tests via _test_rows_cols (VPU fma
            # only) while the dense fallback inside the same kernel honors
            # MXU_TRITEST — mixing accumulation orders breaks the
            # bit-identical-to-dense contract, so refuse the combo loudly
            raise ValueError(
                "RUSTLIGHT_TPU_SPARSE_VISIT and RUSTLIGHT_TPU_MXU_TRITEST "
                "are mutually exclusive (the sparse path has no MXU "
                "triangle test; mixing them breaks bit parity)")
        if sub > 1:
            scratch = [pltpu.VMEM((1, cp), jnp.float32)
                       for _ in range(sub)]
            k_closest = partial(_closest_kernel_sub, wt.n_real, sub)
            k_anyhit = partial(_anyhit_kernel_sub, wt.n_real, sub)
        elif sparse:
            scratch = [pltpu.VMEM((1, cp), jnp.float32),
                       pltpu.VMEM((cp, RAY_TILE), jnp.float32)]
            k_closest = partial(_closest_kernel_sparse, wt.n_real,
                                SPARSE_CAP)
            k_anyhit = partial(_anyhit_kernel_sparse, wt.n_real, SPARSE_CAP)
        else:
            scratch = [pltpu.VMEM((1, cp), jnp.float32)] + extra_scratch
            k_closest = partial(k_closest, wt.n_real, wide)
            k_anyhit = partial(k_anyhit, wt.n_real, wide)

        # the 16 MB default scoped-vmem cap is conservative; the resident
        # tables alone reach ~12.6 MB at MAX_VMEM_CLUSTERS, so lift the cap
        # to what the tables + entry-pass intermediates actually need (v5e
        # VMEM is larger). The HBM variant's working set fits the default.
        cparams = pltpu.CompilerParams(
            vmem_limit_bytes=20 * 1024 * 1024 + 4 * cp * 3 * K * 4
        ) if wt.resident else pltpu.CompilerParams()

    if any_hit:
        occ = pl.pallas_call(
            k_anyhit,
            grid=grid, in_specs=in_specs, out_specs=row,
            out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            scratch_shapes=scratch, interpret=interpret,
            compiler_params=cparams,
        )(*args)
        occ = occ[:n, 0]
        if sort_rays:
            _, occ = lax.sort((lane, occ), dimension=0, num_keys=1)
        return occ > 0

    t, tri, u, v = pl.pallas_call(
        k_closest,
        grid=grid, in_specs=in_specs,
        out_specs=(row, row, row, row),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ),
        scratch_shapes=scratch, interpret=interpret,
        compiler_params=cparams,
    )(*args)
    t, tri = t[:n, 0], tri[:n, 0]
    u, v = u[:n, 0], v[:n, 0]
    if sort_rays:
        _, t, tri, u, v = lax.sort((lane, t, tri, u, v), dimension=0,
                                   num_keys=1)
    hit = tri >= 0
    return RayHit(t=jnp.where(hit, t, jnp.inf), tri=tri, u=u, v=v, hit=hit)


def walk_supported(wt) -> bool:
    import os
    if os.environ.get("RUSTLIGHT_TPU_NO_PALLAS_WALK") == "1":
        return False
    return (wt is not None and wt.n_clusters <= _MAX_CLUSTERS
            and jax.default_backend() == "tpu")


def intersect_walk(wt: WalkTables, o, d, tnear=None, tfar=None,
                   interpret: bool = False, wide: bool = None,
                   hier: bool = None, sub: int = None, sparse: bool = None,
                   inc_sort: bool = None):
    n = o.shape[0]
    if tnear is None:
        tnear = jnp.full(n, EPSILON, jnp.float32)
    if tfar is None:
        tfar = jnp.full(n, jnp.inf, jnp.float32)
    return _walk_impl(wt, o, d, tnear, tfar, False, interpret, wide=wide,
                      hier=hier, sub=sub, sparse=sparse, inc_sort=inc_sort)


def occluded_walk(wt: WalkTables, o, d, tnear=None, tfar=None,
                  interpret: bool = False, wide: bool = None,
                  hier: bool = None, sub: int = None, sparse: bool = None,
                  inc_sort: bool = None):
    n = o.shape[0]
    if tnear is None:
        tnear = jnp.full(n, EPSILON, jnp.float32)
    if tfar is None:
        tfar = jnp.full(n, jnp.inf, jnp.float32)
    return _walk_impl(wt, o, d, tnear, tfar, True, interpret, wide=wide,
                      hier=hier, sub=sub, sparse=sparse, inc_sort=inc_sort)
