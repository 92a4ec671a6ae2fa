"""Host-side wavefront-coherence lab for the Pallas tile walk.

The roofline (regress/roofline.json) pins the divergent large-scene gap on
the per-tile visited-cluster UNION: each ray overlaps ~4 cluster AABBs but
a RAY_TILE of 64 sorted rays unions to ~51 visits. The walk kernel itself
runs at ~speed-of-light per visit, so the remaining levers are (a) tree
quality — only if cluster AABBs overlap spatially (the SBVH case), and
(b) the coherence SORT KEY that assigns rays to tiles.

Both are properties of the ray-cluster incidence matrix, which this lab
computes exactly on the host (numpy slab tests, no TPU needed):

  * per-ray overlap: |clusters(r)| — the per-ray tree-quality floor;
  * cluster AABB pairwise overlap volume fraction — if ~0, spatial splits
    (SBVH) have no purchase on this scene and the tree lever is closed;
  * per-tile raw union |U_{r in tile} clusters(r)| under candidate sort
    keys — an upper bound of the kernel's front-to-back visit count that
    ranks keys without a chip (the production key's union is validated
    against the instrumented kernel's measured visits in tree_lab.json);
  * a grouping floor: the union if rays were CLUSTERED BY SET SIMILARITY
    (greedy first-hit-cluster grouping) — how much any sort key could win.

Run:  python tools/perf/sortkey_lab.py          (CPU-only, ~1 min)
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import numpy as np

RAY_TILE = 64


def ray_cluster_hits(lo, hi, o, d, chunk=8192):
    """Exact slab test -> bool [N, C] incidence (tnear=0, tfar=inf)."""
    n = o.shape[0]
    c = lo.shape[0]
    out = np.zeros((n, c), bool)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        inv = 1.0 / np.where(np.abs(d[s:e]) > 1e-12, d[s:e],
                             np.where(d[s:e] >= 0, 1e-12, -1e-12))
        t0 = (lo[None] - o[s:e, None, :]) * inv[:, None, :]
        t1 = (hi[None] - o[s:e, None, :]) * inv[:, None, :]
        tmin = np.minimum(t0, t1).max(-1)
        tmax = np.maximum(t0, t1).min(-1)
        out[s:e] = (tmax >= np.maximum(tmin, 0.0))
    return out


def cluster_overlap_stats(lo, hi):
    """Pairwise AABB overlap: total intersection volume over total volume,
    and the mean number of OTHER clusters a cluster's AABB intersects.
    SBVH-style spatial splits reduce exactly this quantity; if it is ~0 the
    tree-quality lever is closed for the scene."""
    c = lo.shape[0]
    vol = np.prod(np.maximum(hi - lo, 0.0), -1)
    inter_vol = 0.0
    touching = 0
    for i in range(c):
        ilo = np.maximum(lo[i], lo)
        ihi = np.minimum(hi[i], hi)
        iv = np.prod(np.maximum(ihi - ilo, 0.0), -1)
        iv[i] = 0.0
        inter_vol += iv.sum()
        touching += int((iv > 0).sum())
    return dict(
        overlap_vol_frac=float(inter_vol / max(2.0 * vol.sum(), 1e-30)),
        mean_touching=float(touching / c))


def tile_union(hits, order, ray_tile=RAY_TILE):
    h = hits[order]
    t = h.shape[0] // ray_tile
    u = h[: t * ray_tile].reshape(t, ray_tile, -1).any(1).sum(-1)
    return float(u.mean()), int(u.max())


def morton(q, bits):
    m = np.zeros(q.shape[0], np.int64)
    for b in range(bits):
        for ax in range(3):
            m |= ((q[:, ax].astype(np.int64) >> b) & 1) << (3 * b + ax)
    return m


def keys_catalog(o, d, wlo, whi):
    """Candidate coherence keys. 'oct|om5|dm5' mirrors the production
    pallas_walk._sort_key ordering; 'prod-r3(dm3)' is the r3 key it
    replaced."""
    ext = np.maximum(whi - wlo, 1e-9)
    octant = ((d[:, 0] > 0).astype(np.int64) * 4
              + (d[:, 1] > 0).astype(np.int64) * 2
              + (d[:, 2] > 0).astype(np.int64))

    def oq(bits):
        return np.clip(((o - wlo) / ext * (1 << bits)).astype(np.int64),
                       0, (1 << bits) - 1)

    dq3 = np.clip((np.abs(d) * 8.0).astype(np.int64), 0, 7)
    dq5 = np.clip((np.abs(d) * 32.0).astype(np.int64), 0, 31)
    # the r3 production key (3-bit/axis direction LSBs); superseded by
    # oct|om5|dm5 below, which is what pallas_walk._sort_key now emits
    prod_r3 = (octant << 24) | (morton(oq(5), 5) << 9) | morton(dq3, 3)

    out = {"unsorted": np.arange(o.shape[0], dtype=np.int64),
           "prod-r3(dm3)": prod_r3}
    # finer origin morton (7 bits/axis)
    out["oct|om7|dm3"] = ((octant << 32) | (morton(oq(7), 7) << 9)
                          | morton(dq3, 3))
    # origin-major: spatial cell before octant
    out["om5|oct|dm3"] = ((morton(oq(5), 5) << 12) | (octant << 9)
                          | morton(dq3, 3))
    # direction-major: fine |d| cone before origin
    out["oct|dm5|om5"] = ((octant << 30) | (morton(dq5, 5) << 15)
                          | morton(oq(5), 5))
    # PRODUCTION (since r4): origin-major structure with FINE direction
    # LSBs — when a wavefront's origins collapse to a point (camera/point-
    # light rays) the origin morton goes constant and the 5-bit/axis
    # direction morton takes over. Emitted by pallas_walk._sort_key as an
    # int32 (major, minor) pair for a two-key lax.sort.
    out["oct|om5|dm5"] = ((octant << 30) | (morton(oq(5), 5) << 15)
                          | morton(dq5, 5))
    # 6D interleave: origin and direction bits woven together so tiles
    # shrink in position AND angle simultaneously
    q5, d3 = oq(5), dq3
    six = np.zeros(o.shape[0], np.int64)
    pos = 0
    for b in range(5):
        for ax in range(3):
            six |= ((q5[:, ax] >> (4 - b)) & 1) << (62 - pos)
            pos += 1
        if b < 3:
            for ax in range(3):
                six |= ((d3[:, ax] >> (2 - b)) & 1) << (62 - pos)
                pos += 1
    out["6d-interleave"] = (octant << 40) | (six >> 22)
    return out


def grouping_floor(hits):
    """Union if tiles were packed by (first-hit cluster id, set size) — a
    cheap surrogate for greedy set-similarity clustering that no real key
    can see (it needs the incidence matrix itself). Bounds the win any
    sort key could deliver."""
    c = hits.shape[1]
    first = np.where(hits.any(1), hits.argmax(1), c)
    sizes = hits.sum(1)
    order = np.lexsort((sizes, first))
    return tile_union(hits, order)


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
    o_c = np.tile(np.array([ext / 2, ext / 2, -0.35 * ext], np.float32),
                  (n, 1))
    tgt = rng.uniform(0, ext, (n, 3)).astype(np.float32)
    d_c = tgt - o_c
    d_c /= np.linalg.norm(d_c, axis=1, keepdims=True)
    o_d = rng.uniform(0, ext, (n, 3)).astype(np.float32)
    d_d = rng.normal(size=(n, 3)).astype(np.float32)
    d_d /= np.linalg.norm(d_d, axis=1, keepdims=True)

    report = {"clusters": int(wt.n_real),
              "cluster_overlap": cluster_overlap_stats(lo, hi)}
    print("cluster overlap:", report["cluster_overlap"])

    for tag, (o, d) in (("coherent", (o_c, d_c)),
                        ("divergent", (o_d, d_d))):
        hits = ray_cluster_hits(lo, hi, o.astype(np.float64),
                                d.astype(np.float64))
        row = {"per_ray_mean": float(hits.sum(1).mean()),
               "per_ray_p99": float(np.percentile(hits.sum(1), 99))}
        for name, key in keys_catalog(o, d, wlo, whi).items():
            order = np.argsort(key, kind="stable")
            mean_u, max_u = tile_union(hits, order)
            row[name] = {"union_mean": round(mean_u, 2),
                         "union_max": max_u}
            print(f"[{tag}] {name:14s} union {mean_u:7.2f} (max {max_u})")
        fl_mean, fl_max = grouping_floor(hits)
        row["grouping_floor"] = {"union_mean": round(fl_mean, 2),
                                 "union_max": fl_max}
        print(f"[{tag}] grouping floor  union {fl_mean:7.2f} (max {fl_max})"
              f"  per-ray {row['per_ray_mean']:.2f}")
        # RAY_TILE sweep under the production key: every visit tests ALL R
        # tile rays against the cluster ([R, 3K]), so per-ray triangle-test
        # work is proportional to the tile UNION alone — smaller R always
        # lowers it, but the per-tile O(C) pop/entry overhead is amortized
        # over R rays, which is why R=32 measured neutral on-chip despite
        # its lower union (see the RAY_TILE constant's comment). Decision
        # rule: shrink R only if the union drops faster than C/R overhead
        # grows.
        key = keys_catalog(o, d, wlo, whi)["oct|om5|dm5"]
        order = np.argsort(key, kind="stable")
        sweep = {}
        for r in (32, 64, 128, 256):
            mu, mx = tile_union(hits, order, ray_tile=r)
            # work_per_ray: the per-ray share of the per-tile overhead
            # (union/R) — the quantity the RAY_TILE decision rule weighs
            # against the union itself (committed-artifact schema)
            sweep[r] = {"union_mean": round(mu, 2),
                        "work_per_ray": round(mu / r, 3)}
            print(f"[{tag}] R={r:3d} union {mu:7.2f} "
                  f"(test-work/ray ratio vs R=64: "
                  f"{mu / sweep.get(64, sweep[r])['union_mean']:.2f})"
                  if 64 in sweep else f"[{tag}] R={r:3d} union {mu:7.2f}")
        row["ray_tile_sweep"] = sweep
        report[tag] = row

    out = Path(__file__).parent / "regress" / "sortkey_lab.json"
    out.write_text(json.dumps(report, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
