"""Tree-quality A/B lab for the Pallas tile-walk intersector (VERDICT r3
item 1: attack the large-scene visit-count floor through TREE quality, not
schedule — the schedule space is closed by five measured negatives).

For each table-build variant this measures, on the k_sweep/roofline scene
(110k-target sphere grid, n_theta=18) with 262k coherent + divergent rays:

  * clusters (C), fill rate, total cluster surface area
  * per-tile visit count (instrumented production kernel — the exact
    number of [R, 3K] triangle tests the schedule executes)
  * production trace time (min of 3, hard sync)
  * hit checksum parity vs the shipped binned/greedy reference

Variants:
  binned / greedy        — shipped configuration (reference point)
  sweep  / greedy        — full SAH sweep (reference's exact algorithm)
  binned / sa<alpha>     — tightness-aware treelet re-pack
  sweep  / sa<alpha>

Run on a real chip:  python tools/perf/tree_lab.py
"""
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rustlight_tpu.scene.geometry import build_geometry_tables
import rustlight_tpu.accel.pallas_walk as pw
from rustlight_tpu.accel.bvh import build_bvh
from rustlight_tpu.cli import _enable_compile_cache
from roofline import _closest_kernel_counted

_enable_compile_cache()

K = pw.K
RAY_TILE = pw.RAY_TILE


def _cluster_sa(wt):
    lo = np.asarray(wt.lo)[:, : wt.n_real].T
    hi = np.asarray(wt.hi)[:, : wt.n_real].T
    d = np.maximum(hi - lo, 0.0)
    return float((2.0 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
                         + d[:, 2] * d[:, 0])).sum())


def _visits(wt, o_j, d_j):
    """Per-tile visit counts via the instrumented production kernel
    (replicates _walk_impl's sort + tiling; see roofline.py)."""
    n = o_j.shape[0]
    cp = wt.n_clusters
    tnear = jnp.zeros(n)
    tfar = jnp.full(n, jnp.inf)
    kmaj, kmin = pw._sort_key(wt, o_j, d_j)
    lane = lax.iota(jnp.int32, n)
    (_, _, o0, o1, o2, dd0, dd1, dd2, tn_s, tf_s, lane) = lax.sort(
        (kmaj, kmin, o_j[:, 0], o_j[:, 1], o_j[:, 2], d_j[:, 0], d_j[:, 1],
         d_j[:, 2], tnear, tfar, lane), dimension=0, num_keys=2)
    o_s = jnp.stack([o0, o1, o2], -1)
    d_s = jnp.stack([dd0, dd1, dd2], -1)
    g = n // RAY_TILE
    const = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                     memory_space=pltpu.VMEM)
    ray2 = pl.BlockSpec((RAY_TILE, 3), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    row = pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=20 * 1024 * 1024 + 4 * cp * 3 * K * 4)
    outs = pl.pallas_call(
        partial(_closest_kernel_counted, wt.n_real, False),
        grid=(g,),
        in_specs=[const((3, cp)), const((3, cp)), const((4, cp, 3 * K)),
                  const((cp, K)), ray2, ray2, row, row],
        out_specs=(row, row, row, row, row),
        out_shape=(jax.ShapeDtypeStruct((n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1), jnp.int32),
                   jax.ShapeDtypeStruct((n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((1, cp), jnp.float32)],
        compiler_params=cparams,
    )(wt.lo, wt.hi, wt.rows, wt.ids, o_s, d_s,
      tn_s.reshape(n, 1), tf_s.reshape(n, 1))
    nv = np.asarray(outs[4][:, 0]).reshape(g, RAY_TILE)[:, 0]
    return float(nv.mean()), int(nv.max())


def main():
    from rustlight_tpu.models.presets import sphere_grid_mesh
    rng = np.random.default_rng(3)
    n = 262144
    mesh, gs = sphere_grid_mesh(110_000, n_theta=18)
    geom = build_geometry_tables([mesh], [-1])
    ext = gs * 3.0
    o_c = np.tile(np.array([ext / 2, ext / 2, -0.35 * ext], np.float32),
                  (n, 1))
    tgt = rng.uniform(0, ext, (n, 3)).astype(np.float32)
    d_c = tgt - o_c
    d_c /= np.linalg.norm(d_c, axis=1, keepdims=True)
    o_d = rng.uniform(0, ext, (n, 3)).astype(np.float32)
    d_d = rng.normal(size=(n, 3)).astype(np.float32)
    d_d /= np.linalg.norm(d_d, axis=1, keepdims=True)
    rays = {"coherent": (jnp.asarray(o_c), jnp.asarray(d_c)),
            "divergent": (jnp.asarray(o_d), jnp.asarray(d_d))}

    variants = [("binned", None), ("sweep", None),
                ("binned", 1.0), ("binned", 0.8),
                ("sweep", 1.0)]
    ref_chk = {}
    results = []
    for builder, alpha in variants:
        tag = f"{builder}/{'greedy' if alpha is None else f'sa{alpha}'}"
        bvh = build_bvh(geom, max_leaf=8, builder=builder)
        wt = pw.build_walk_tables(geom, bvh=bvh, repack_alpha=alpha)
        fill = geom.n_tris / (wt.n_real * K)
        sa = _cluster_sa(wt)
        wt = jax.device_put(wt)
        row = {"variant": tag, "clusters": wt.n_real, "fill": round(fill, 3),
               "cluster_sa": sa}
        print(f"{tag}: C={wt.n_real} fill={fill:.3f} SA={sa:.3g}",
              flush=True)
        for name, (o_j, d_j) in rays.items():
            f = lambda: pw.intersect_walk(wt, o_j, d_j)
            r = f()
            chk = float(jnp.sum(jnp.where(jnp.isfinite(r.t), r.t, 0.0)))
            hits = int(jnp.sum(r.hit))
            if name not in ref_chk:
                ref_chk[name] = (hits, chk)
            parity = (hits == ref_chk[name][0]
                      and abs(chk - ref_chk[name][1]) < 0.5)
            ts = []
            for _ in range(3):
                t0 = time.time()
                r = f()
                float(jnp.sum(jnp.where(jnp.isfinite(r.t), r.t, 0.0)))
                ts.append(time.time() - t0)
            vm, vmax = _visits(wt, o_j, d_j)
            row[name] = {"ms": round(min(ts) * 1e3, 1),
                         "visits_mean": round(vm, 1), "visits_max": vmax,
                         "hits": hits, "parity": parity}
            print(f"  {name}: {min(ts)*1e3:7.1f} ms  visits/tile {vm:6.1f} "
                  f"(max {vmax})  hits={hits} parity={parity}", flush=True)
        results.append(row)

    out = Path(__file__).parent / "regress" / "tree_lab.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
