"""On-chip A/B of the greedy-union tile packing (the assignment bound):
host-compute the greedy order from the exact incidence matrix, pre-permute
the rays, run the production walk kernel with sort_rays=False, and compare
against the shipped incidence sort. Quantifies the wall-clock prize of the
28 -> 17.8 visits/tile assignment gap."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))
import numpy as np
import jax, jax.numpy as jnp
from sortkey_lab import ray_cluster_hits, tile_union
from grouping_lab import greedy_union_order

from rustlight_tpu.models.presets import sphere_grid_mesh
from rustlight_tpu.scene.geometry import build_geometry_tables
import rustlight_tpu.accel.pallas_walk as pw
from rustlight_tpu.cli import _enable_compile_cache
_enable_compile_cache()

rng = np.random.default_rng(3)
n = 262144
mesh, gs = sphere_grid_mesh(110_000, n_theta=18)
geom = build_geometry_tables([mesh], [-1])
wt = jax.device_put(pw.build_walk_tables(geom))
lo = np.asarray(wt.lo)[:, : wt.n_real].T.astype(np.float64)
hi = np.asarray(wt.hi)[:, : wt.n_real].T.astype(np.float64)
ext = gs * 3.0
_ = rng.uniform(0, ext, (n, 3))     # skip coherent tgt draw (stream layout)
o_d = rng.uniform(0, ext, (n, 3)).astype(np.float32)
d_d = rng.normal(size=(n, 3)).astype(np.float32)
d_d /= np.linalg.norm(d_d, axis=1, keepdims=True)

print("computing incidence + greedy order (host, ~6 min)...", flush=True)
hits = ray_cluster_hits(lo, hi, o_d.astype(np.float64), d_d.astype(np.float64))
t0 = time.time()
order = greedy_union_order(hits, 64)
mu, mx = tile_union(hits, order)
print(f"greedy order: union {mu:.2f} (max {mx}) in {time.time()-t0:.0f}s", flush=True)

def bench(o, d, sort_rays, tag):
    o, d = jnp.asarray(o), jnp.asarray(d)
    f = lambda: pw.intersect_walk(wt, o, d) if sort_rays else \
        pw._walk_impl(wt, o, d, jnp.full(n, 1e-4), jnp.full(n, jnp.inf),
                      False, sort_rays=False)
    r = f(); chk = float(jnp.sum(jnp.where(jnp.isfinite(r.t), r.t, 0.0)))
    ts = []
    for _ in range(3):
        t0 = time.time(); r = f()
        chk = float(jnp.sum(jnp.where(jnp.isfinite(r.t), r.t, 0.0)))
        ts.append(time.time() - t0)
    print(f"{tag}: {min(ts)*1e3:7.1f} ms hits={int(jnp.sum(r.hit))} chk={chk:.1f}", flush=True)

bench(o_d, d_d, True, "incidence sort (prod)")
bench(o_d[order], d_d[order], False, "greedy pre-permuted ")
