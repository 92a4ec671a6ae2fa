"""Non-sort tile-formation lab (VERDICT r4 item 1).

The sortkey lab bounded every 1D sort key's divergent tile union at ~50.9
visits/tile and computed a grouping floor of 35.97 with a cheap surrogate
(lexsort by lowest-ID overlapped cluster, then set size) — 1.41x headroom
that no key can reach because keys can't see the ray-cluster incidence
matrix. This lab sweeps ACTUAL grouping algorithms offline against the same
exact matrix (same scene, same wavefronts, same RAY_TILE):

  * committed surrogate      — lexsort (first-ID cluster, |set|), the floor
  * entry+size               — lexsort (first cluster ENTERED along the ray
                               by slab tnear, |set|): implementable at
                               runtime with one cheap [N, C] slab pre-pass
  * entry+second+size        — adds the second-entered cluster as tiebreak
  * bitset-lexsort           — sort rays by their packed incidence bitset:
                               identical sets become adjacent, similar sets
                               share prefixes (cluster IDs follow build
                               order, so prefix similarity ~ spatial
                               locality). Runtime-infeasible (needs the
                               matrix); pure bound refinement.
  * kmeans(+balance)         — minibatch k-means on incidence vectors with
                               k = N/RAY_TILE, then tiles packed group-by-
                               group. Runtime-infeasible; bound refinement.
  * greedy-union             — greedy tile packing: repeatedly seed a tile
                               with the smallest-set unassigned ray and add
                               the rays whose sets fit the tile union best.
                               The strongest (and slowest) offline bound.

Decision rule: if a runtime-FEASIBLE scheme (entry-cluster family) closes
most of the gap to the strongest offline bound, implement it as a
permutation before the walk and A/B on-chip; if even greedy-union stays
near the committed floor, the floor stands and the headroom claim is
revised with this lab as evidence.

Outcome (committed in regress/grouping_lab.json): the (id1,id2,id3,size)
key matched the full-bitset sort (28.0 vs 28.1) and shipped as
pallas_walk._incidence_key (divergent trace 1.47x). The greedy-union
order was ALSO validated on-chip by pre-permuting rays into the real
kernel: 105.6 -> 75.7 ms (1.40x over the shipped sort, matching the
17.8-vs-28 union ratio) — the visit-count cost model holds at the
assignment bound, so an on-chip packing pass (not a sort) is the
quantified next lever; the host greedy itself takes ~8 min, far too
slow to ship.

Run:  python tools/perf/grouping_lab.py          (CPU-only)
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import numpy as np

from sortkey_lab import (RAY_TILE, ray_cluster_hits, tile_union,
                         keys_catalog)


def entry_cluster(lo, hi, o, d, chunk=8192):
    """Per-ray (first, second) cluster ENTERED along the ray: argmin of
    clamped slab tnear over overlapped clusters. This is the runtime-
    feasible signal — one [N, C] slab pass, no incidence matrix kept."""
    n, c = o.shape[0], lo.shape[0]
    first = np.full(n, c, np.int64)
    second = np.full(n, c, np.int64)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        inv = 1.0 / np.where(np.abs(d[s:e]) > 1e-12, d[s:e],
                             np.where(d[s:e] >= 0, 1e-12, -1e-12))
        t0 = (lo[None] - o[s:e, None, :]) * inv[:, None, :]
        t1 = (hi[None] - o[s:e, None, :]) * inv[:, None, :]
        tmin = np.minimum(t0, t1).max(-1)
        tmax = np.maximum(t0, t1).min(-1)
        entry = np.where(tmax >= np.maximum(tmin, 0.0),
                         np.maximum(tmin, 0.0), np.inf)
        order = np.argsort(entry, axis=1)
        first[s:e] = np.where(np.isfinite(
            np.take_along_axis(entry, order[:, :1], 1)[:, 0]),
            order[:, 0], c)
        second[s:e] = np.where(np.isfinite(
            np.take_along_axis(entry, order[:, 1:2], 1)[:, 0]),
            order[:, 1], c)
    return first, second


def bitset_lexsort(hits):
    packed = np.packbits(hits, axis=1)
    cols = [packed[:, i].astype(np.int64)
            for i in range(packed.shape[1] - 1, -1, -1)]
    return np.lexsort(cols)


def kmeans_order(hits, ray_tile, iters=8, sample=32768, seed=0):
    """Minibatch k-means on incidence vectors; tiles packed group-major."""
    rng = np.random.default_rng(seed)
    n = hits.shape[0]
    k = max(n // ray_tile // 16, 64)     # coarse groups; tiles pack inside
    x = hits.astype(np.float32)
    idx = rng.choice(n, size=min(sample, n), replace=False)
    cent = x[rng.choice(n, size=k, replace=False)]
    for _ in range(iters):
        xb = x[idx]
        # nearest centroid by dot-similarity normalized by union-ish size
        sim = xb @ cent.T
        assign = sim.argmax(1)
        for j in range(k):
            m = assign == j
            if m.any():
                cent[j] = xb[m].mean(0)
    assign_all = (x @ cent.T).argmax(1)
    sizes = hits.sum(1)
    return np.lexsort((sizes, assign_all))


def greedy_union_order(hits, ray_tile, max_scan=4096, seed=0):
    """Greedy tile packing: seed each tile with the lowest-first-ID
    unassigned ray, then fill with the rays (from a bounded candidate
    scan window, pre-sorted by the committed surrogate) whose sets add
    the fewest new clusters to the tile union. O(T * window * C) — the
    strongest offline bound this lab computes."""
    n, c = hits.shape
    first = np.where(hits.any(1), hits.argmax(1), c)
    sizes = hits.sum(1)
    base = np.lexsort((sizes, first))      # candidate stream, floor order
    packed = np.packbits(hits[base], axis=1)
    taken = np.zeros(n, bool)
    order = np.empty(n, np.int64)
    out_pos = 0
    ptr = 0
    while out_pos < n:
        while ptr < n and taken[ptr]:
            ptr += 1
        if ptr >= n:
            break
        tile_u = packed[ptr].copy()
        taken[ptr] = True
        order[out_pos] = base[ptr]
        out_pos += 1
        fill = 1
        while fill < ray_tile and out_pos < n:
            end = min(ptr + 1 + max_scan, n)
            cand = np.nonzero(~taken[ptr + 1:end])[0]
            if cand.size == 0:
                ptr = end
                if ptr >= n:
                    break
                continue
            cidx = cand + ptr + 1
            new_bits = np.unpackbits(packed[cidx] & ~tile_u[None],
                                     axis=1).sum(1)
            best = cidx[new_bits.argmin()]
            tile_u |= packed[best]
            taken[best] = True
            order[out_pos] = base[best]
            out_pos += 1
            fill += 1
    return order[:out_pos]


def main():
    from rustlight_tpu.models.presets import sphere_grid_mesh
    from rustlight_tpu.scene.geometry import build_geometry_tables
    import rustlight_tpu.accel.pallas_walk as pw

    rng = np.random.default_rng(3)
    n = 262144
    mesh, gs = sphere_grid_mesh(110_000, n_theta=18)
    geom = build_geometry_tables([mesh], [-1])
    wt = pw.build_walk_tables(geom)
    lo = np.asarray(wt.lo)[:, : wt.n_real].T.astype(np.float64)
    hi = np.asarray(wt.hi)[:, : wt.n_real].T.astype(np.float64)
    wlo, whi = np.asarray(wt.world_lo), np.asarray(wt.world_hi)

    ext = gs * 3.0
    # same wavefronts as sortkey_lab (same rng stream layout)
    o_c = np.tile(np.array([ext / 2, ext / 2, -0.35 * ext], np.float32),
                  (n, 1))
    tgt = rng.uniform(0, ext, (n, 3)).astype(np.float32)
    d_c = tgt - o_c
    d_c /= np.linalg.norm(d_c, axis=1, keepdims=True)
    o_d = rng.uniform(0, ext, (n, 3)).astype(np.float32)
    d_d = rng.normal(size=(n, 3)).astype(np.float32)
    d_d /= np.linalg.norm(d_d, axis=1, keepdims=True)

    report = {"ray_tile": RAY_TILE, "clusters": int(wt.n_real)}
    for tag, (o, d) in (("divergent", (o_d, d_d)),
                        ("coherent", (o_c, d_c))):
        hits = ray_cluster_hits(lo, hi, o.astype(np.float64),
                                d.astype(np.float64))
        sizes = hits.sum(1)
        c = hits.shape[1]
        row = {}

        key = keys_catalog(o, d, wlo, whi)["oct|om5|dm5"]
        mu, mx = tile_union(hits, np.argsort(key, kind="stable"))
        row["production_sort"] = {"union_mean": round(mu, 2),
                                  "union_max": mx}

        firstid = np.where(hits.any(1), hits.argmax(1), c)
        mu, mx = tile_union(hits, np.lexsort((sizes, firstid)))
        row["surrogate_firstid_size"] = {"union_mean": round(mu, 2),
                                         "union_max": mx}

        t0 = time.time()
        ent1, ent2 = entry_cluster(lo, hi, o.astype(np.float64),
                                   d.astype(np.float64))
        row["entry_precompute_s"] = round(time.time() - t0, 1)
        mu, mx = tile_union(hits, np.lexsort((sizes, ent1)))
        row["entry_size"] = {"union_mean": round(mu, 2), "union_max": mx}
        mu, mx = tile_union(hits, np.lexsort((sizes, ent2, ent1)))
        row["entry_second_size"] = {"union_mean": round(mu, 2),
                                    "union_max": mx}

        t0 = time.time()
        mu, mx = tile_union(hits, bitset_lexsort(hits))
        row["bitset_lexsort"] = {"union_mean": round(mu, 2),
                                 "union_max": mx,
                                 "wall_s": round(time.time() - t0, 1)}

        t0 = time.time()
        mu, mx = tile_union(hits, kmeans_order(hits, RAY_TILE))
        row["kmeans"] = {"union_mean": round(mu, 2), "union_max": mx,
                         "wall_s": round(time.time() - t0, 1)}

        t0 = time.time()
        mu, mx = tile_union(hits, greedy_union_order(hits, RAY_TILE))
        row["greedy_union"] = {"union_mean": round(mu, 2), "union_max": mx,
                               "wall_s": round(time.time() - t0, 1)}

        for k2, v in row.items():
            print(f"[{tag}] {k2}: {v}", flush=True)
        report[tag] = row

    out = Path(__file__).parent / "regress" / "grouping_lab.json"
    out.write_text(json.dumps(report, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
