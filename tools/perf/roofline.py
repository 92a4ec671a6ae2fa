"""Empirical roofline for the Pallas tile-walk intersector (VERDICT r2
item 1's alternative deliverable: prove the kernel runs at its hardware
floor, or find headroom).

Three on-chip measurements on the 122k-tri grid / 262k divergent rays
(the production large-scene config, same as tools/perf/k_sweep.py):

1. PRODUCTION: the shipped closest-hit walk, plus an instrumented copy
   that also outputs the per-tile visit count (2 visits per while-loop
   iteration), giving the exact number of [R, 3K] triangle tests the
   schedule executes.
2. COMPUTE FLOOR: a stripped kernel that executes the SAME number of
   visits (same _test_cluster + best-update data path) but with a free
   schedule — csel cycles round-robin, no entry pass, no heap pops, no
   front-to-back threshold. Its time is what the visit work costs when
   traversal logic is free.
3. VPU CEILING: a pure chained-fma kernel on the same [R, 3K] f32 shape,
   no loads, giving the chip's practical f32 VPU rate for this tile shape.

Interpretation:
  production/floor      -> scheduling overhead (pops + entry pass + caps).
  floor flops / ceiling -> how much of the VPU the visit data path uses
                           (loads from the rows table + reduces cost the
                           rest — they are part of ANY schedule).
If production/floor is ~1 and the floor runs at a large fraction of the
ceiling, the kernel is compute-bound at its structural-waste floor and
only visit-COUNT reduction can win (the K sweep optimizes exactly that).

Run on a real chip:  python tools/perf/roofline.py
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

from rustlight_tpu.scene.geometry import \
    build_geometry_tables
import rustlight_tpu.accel.pallas_walk as pw
from rustlight_tpu.cli import _enable_compile_cache

_enable_compile_cache()

K = pw.K
RAY_TILE = pw.RAY_TILE


# ---- instrumented production kernel: adds a visit-count output ----------
def _closest_kernel_counted(n_real, wide, lo_ref, hi_ref, rows_ref, ids_ref,
                            o_ref, d_ref, tnear_ref, tfar_ref,
                            t_ref, tri_ref, u_ref, v_ref, nv_ref, ent_scr):
    cp = lo_ref.shape[1]
    o = o_ref[:]
    d = d_ref[:]
    tnear = tnear_ref[:, 0]
    tfar = tfar_ref[:, 0]
    ent_scr[:] = pw._tile_entries(lo_ref, hi_ref, o, d, tnear, tfar,
                                  n_real, cp, wide)
    kiota = lax.broadcasted_iota(jnp.int32, (o.shape[0], K), 1)
    emin0, csel0 = pw._pop_min(ent_scr, wide)

    def cond(s):
        nv, emin, _, thresh, *_ = s
        efl = emin if wide else pw._entry_floor(emin)
        return (efl < thresh) & (nv < cp)

    def visit(emin, csel, best_t, best_i, best_u, best_v):
        t, u, v, valid = pw._test_cluster(rows_ref, csel, o, d, tnear,
                                          best_t)
        tm = jnp.where(valid, t, jnp.inf)
        bt = jnp.min(tm, axis=1)
        better = bt < best_t
        j = jnp.minimum(jnp.min(jnp.where(tm == bt[:, None], kiota, K), 1),
                        K - 1)
        jhot = (kiota == j[:, None]) & better[:, None]
        ids = ids_ref[pl.ds(csel, 1), :]
        tri_new = jnp.sum(jnp.where(jhot, ids, 0), axis=1)
        best_u = jnp.where(better, jnp.sum(jnp.where(jhot, u, 0.0), 1),
                           best_u)
        best_v = jnp.where(better, jnp.sum(jnp.where(jhot, v, 0.0), 1),
                           best_v)
        best_t = jnp.where(better, bt, best_t)
        best_i = jnp.where(better, tri_new, best_i)
        emin, csel = pw._pop_min(ent_scr, wide)
        return emin, csel, best_t, best_i, best_u, best_v

    def body(s):
        nv, emin, csel, _, best_t, best_i, best_u, best_v = s
        out = visit(emin, csel, best_t, best_i, best_u, best_v)
        out = visit(*out)
        emin, csel, best_t, best_i, best_u, best_v = out
        return (nv + 1, emin, csel, pw._sortable_max(best_t),
                best_t, best_i, best_u, best_v)

    r = o.shape[0]
    best_t0 = jnp.minimum(tfar, jnp.inf)
    init = (jnp.int32(0), emin0, csel0, pw._sortable_max(best_t0), best_t0,
            jnp.full(r, -1, jnp.int32), jnp.zeros(r), jnp.zeros(r))
    nv, _, _, _, best_t, best_i, best_u, best_v = lax.while_loop(cond, body,
                                                                 init)
    hit = best_i >= 0
    t_ref[:, 0] = jnp.where(hit, best_t, jnp.inf)
    tri_ref[:, 0] = best_i
    u_ref[:, 0] = best_u
    v_ref[:, 0] = best_v
    nv_ref[:, 0] = jnp.full(r, 2 * nv, jnp.int32)   # 2 visits / iteration


# ---- compute floor: same visit data path, free schedule ------------------
def _floor_kernel(nv_total, lo_ref, hi_ref, rows_ref, ids_ref,
                  o_ref, d_ref, tnear_ref, tfar_ref,
                  t_ref, tri_ref, u_ref, v_ref):
    cp = lo_ref.shape[1]
    o = o_ref[:]
    d = d_ref[:]
    tnear = tnear_ref[:, 0]
    tfar = tfar_ref[:, 0]
    kiota = lax.broadcasted_iota(jnp.int32, (o.shape[0], K), 1)
    r = o.shape[0]

    def body(i, s):
        best_t, best_i, best_u, best_v = s
        csel = lax.rem(i, cp)
        t, u, v, valid = pw._test_cluster(rows_ref, csel, o, d, tnear,
                                          best_t)
        tm = jnp.where(valid, t, jnp.inf)
        bt = jnp.min(tm, axis=1)
        better = bt < best_t
        j = jnp.minimum(jnp.min(jnp.where(tm == bt[:, None], kiota, K), 1),
                        K - 1)
        jhot = (kiota == j[:, None]) & better[:, None]
        ids = ids_ref[pl.ds(csel, 1), :]
        tri_new = jnp.sum(jnp.where(jhot, ids, 0), axis=1)
        best_u = jnp.where(better, jnp.sum(jnp.where(jhot, u, 0.0), 1),
                           best_u)
        best_v = jnp.where(better, jnp.sum(jnp.where(jhot, v, 0.0), 1),
                           best_v)
        best_t = jnp.where(better, bt, best_t)
        best_i = jnp.where(better, tri_new, best_i)
        return best_t, best_i, best_u, best_v

    best_t0 = jnp.minimum(tfar, jnp.inf)
    init = (best_t0, jnp.full(r, -1, jnp.int32), jnp.zeros(r),
            jnp.zeros(r))
    best_t, best_i, best_u, best_v = lax.fori_loop(0, nv_total, body, init)
    hit = best_i >= 0
    t_ref[:, 0] = jnp.where(hit, best_t, jnp.inf)
    tri_ref[:, 0] = best_i
    u_ref[:, 0] = best_u
    v_ref[:, 0] = best_v


# ---- VPU ceiling: chained fma on the same shape, no loads ---------------
def _fma_kernel(iters, x_ref, y_ref):
    x = x_ref[:]

    def body(i, s):
        a, b = s
        # two independent chains fill the pipeline; 2 fma = 4 flops/elem/it
        a = a * 1.000001 + 0.5
        b = b * 0.999999 + 0.25
        return a, b

    a, b = lax.fori_loop(0, iters, body, (x, x + 1.0))
    y_ref[:] = a + b


def _mk_scene():
    # the SAME generator + parameters as tools/perf/k_sweep.py (shared
    # helper; n_theta=18 / 110k target, distinct from the bench preset's
    # n_theta=10) so the two tools measure the identical table set
    from rustlight_tpu.models.presets import sphere_grid_mesh
    mesh, gs = sphere_grid_mesh(110_000, n_theta=18)
    geom = build_geometry_tables([mesh], [-1])
    return geom, gs * 3.0


def _timed(f, n=3):
    f()                                     # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.time()
        r = f()
        float(jnp.sum(jnp.asarray(r)))      # hard sync (relay-safe)
        ts.append(time.time() - t0)
    return min(ts)


def main():
    geom, ext = _mk_scene()
    rng = np.random.default_rng(3)
    n = 262144
    o = rng.uniform(0, ext, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)

    wt = jax.device_put(pw.build_walk_tables(geom))
    cp = wt.n_clusters
    assert wt.ids is not None, "roofline needs the resident flat kernel"
    print(f"K={K} C={cp} tris={geom.n_tris if hasattr(geom, 'n_tris') else 'n/a'}",
          flush=True)

    # 1. production time + instrumented visit count
    t_prod = _timed(lambda: pw.intersect_walk(wt, o_j, d_j).t)

    tnear = jnp.zeros(n)
    tfar = jnp.full(n, jnp.inf)
    # replicate _walk_impl's sort + pad so the instrumented run sees the
    # same tiles (sorting changes the unions, i.e. the visit counts)
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
    nv_tiles = np.asarray(outs[4][:, 0]).reshape(g, RAY_TILE)[:, 0]
    visits_mean = float(nv_tiles.mean())
    visits_total = int(nv_tiles.sum())
    print(f"production: {t_prod*1e3:.1f} ms, visits/tile mean "
          f"{visits_mean:.1f} (max {int(nv_tiles.max())}, C={cp}), "
          f"total {visits_total}", flush=True)

    # 2. compute floor at the same mean visit count
    nv_iters = int(round(visits_mean))
    floor = pl.pallas_call(
        partial(_floor_kernel, nv_iters),
        grid=(g,),
        in_specs=[const((3, cp)), const((3, cp)), const((4, cp, 3 * K)),
                  const((cp, K)), ray2, ray2, row, row],
        out_specs=(row, row, row, row),
        out_shape=(jax.ShapeDtypeStruct((n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1), jnp.int32),
                   jax.ShapeDtypeStruct((n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1), jnp.float32)),
        compiler_params=cparams,
    )
    t_floor = _timed(lambda: floor(wt.lo, wt.hi, wt.rows, wt.ids, o_s, d_s,
                                   tn_s.reshape(n, 1),
                                   tf_s.reshape(n, 1))[0])
    print(f"floor ({nv_iters} visits/tile, free schedule): "
          f"{t_floor*1e3:.1f} ms -> production/floor = "
          f"{t_prod/t_floor:.2f}x", flush=True)

    # 3. VPU ceiling on the same [R, 3K] shape
    iters = 4000
    x = jnp.ones((RAY_TILE, 3 * K), jnp.float32)
    fma = pl.pallas_call(
        partial(_fma_kernel, iters),
        grid=(g,),
        in_specs=[pl.BlockSpec((RAY_TILE, 3 * K), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((RAY_TILE, 3 * K), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((RAY_TILE, 3 * K), jnp.float32),
    )
    t_fma = _timed(lambda: fma(x))
    peak = g * iters * RAY_TILE * 3 * K * 4 / t_fma / 1e9
    # flops per visit in the floor's data path (hand count of _test_rows +
    # best-update): ao 7, ad 5, div-as-mul 1+1, u/v 4, 6 compares, min/
    # where reduces ~ 8 -> ~32 flop-equivalents per [R, 3K] element is
    # generous bookkeeping; use the dominant fma terms only (ao+ad+uv = 16)
    # for a CONSERVATIVE utilization (loads/reduces excluded).
    floor_gflops = (g * nv_iters * RAY_TILE * 3 * K * 16) / t_floor / 1e9
    print(f"vpu ceiling (chained fma, same shape): {peak:.0f} GFLOP/s f32",
          flush=True)
    print(f"floor data path: {floor_gflops:.0f} GFLOP/s of fma-equivalents "
          f"-> {100*floor_gflops/peak:.0f}% of ceiling", flush=True)

    out = {
        "K": K, "clusters": int(cp), "rays": n,
        "production_ms": t_prod * 1e3,
        "visits_per_tile_mean": visits_mean,
        "floor_ms": t_floor * 1e3,
        "sched_overhead_x": t_prod / t_floor,
        "vpu_ceiling_gflops": peak,
        "floor_gflops_fma_equiv": floor_gflops,
        "floor_vs_ceiling_pct": 100 * floor_gflops / peak,
    }
    Path("regress").mkdir(exist_ok=True)
    Path("regress/roofline.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
