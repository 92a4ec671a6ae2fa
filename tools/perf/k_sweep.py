"""Cluster-size (K) sweep for the Pallas tile-walk intersector.

The kernel is VPU-bound on the [R, 3K] triangle tests (STATUS "Measured
ceilings"), and per 64-ray tile most tested triangles are waste (union ~175
clusters visited, each ray overlaps ~4). Smaller clusters cut the per-pop
test width 3K at the price of more pops and a lower treelet fill rate;
larger clusters amortize pops but widen the waste. This sweep rebuilds the
walk tables and re-traces the kernels at K in {64, 128, 256} on the 122k-tri
grid scene and times coherent + divergent 262k-ray wavefronts.

MAX_VMEM_CLUSTERS is rescaled by 128/K so the VMEM rows budget (6 KB/cluster
at K=128) — and therefore the resident-vs-HBM-DMA choice — stays constant
across the sweep; otherwise K=64 would silently flip the 122k scene to the
DMA variant and confound the A/B.

Alignment caveat (advisor): K=64 gives triangle-test rows of lane width
3K=192, not a multiple of the 128-lane tile — Mosaic pads the [R, 3K]
vectors and the :K/:2K column slices land at offsets 64/128, which may be
relayout-padded. The sweep therefore runs K=128 FIRST as the parity
reference (the shipped configuration) and flags any K whose hits/checksum
drift; a drifting or non-compiling K=64 leg is reported, not trusted.

Run on a real chip:  python tools/perf/k_sweep.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from rustlight_tpu.scene.geometry import \
    build_geometry_tables
import rustlight_tpu.accel.pallas_walk as pw
from rustlight_tpu.cli import _enable_compile_cache

_enable_compile_cache()

from rustlight_tpu.models.presets import sphere_grid_mesh

rng = np.random.default_rng(3)
n = 262144
mesh, gs = sphere_grid_mesh(110_000, n_theta=18)
geom = build_geometry_tables([mesh], [-1])
ext = gs * 3.0
o_c = np.tile(np.array([ext / 2, ext / 2, -0.35 * ext], np.float32), (n, 1))
tgt = rng.uniform(0, ext, (n, 3)).astype(np.float32)
d_c = tgt - o_c
d_c /= np.linalg.norm(d_c, axis=1, keepdims=True)
o_d = rng.uniform(0, ext, (n, 3)).astype(np.float32)
d_d = rng.normal(size=(n, 3)).astype(np.float32)
d_d /= np.linalg.norm(d_d, axis=1, keepdims=True)

K0, MV0 = pw.K, pw.MAX_VMEM_CLUSTERS
ref_hits = {}
try:
    # Shipped K first: parity is keyed to the SHIPPED configuration, so a
    # miscompiled K=64 leg reports ITS drift instead of poisoning the ref
    for Ksw in (K0, 128, 256, 512, 64):
        pw.K = Ksw
        pw.MAX_VMEM_CLUSTERS = MV0 * K0 // Ksw
        wt = jax.device_put(pw.build_walk_tables(geom))
        print(f"K={Ksw}: C={wt.n_clusters} resident={wt.ids is not None}",
              flush=True)
        for name, o, d in [("coherent", o_c, d_c), ("divergent", o_d, d_d)]:
            o_j, d_j = jnp.asarray(o), jnp.asarray(d)
            f = lambda: pw.intersect_walk(wt, o_j, d_j)
            try:
                r = f()
                chk = float(jnp.sum(jnp.where(jnp.isfinite(r.t), r.t, 0.0)))
                hits = int(jnp.sum(r.hit))
            except Exception as e:
                print(f"  {name}: K={Ksw} FAILED TO RUN: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
                continue
            if name not in ref_hits:
                ref_hits[name] = (hits, chk)
            elif (hits, round(chk, 1)) != (ref_hits[name][0],
                                           round(ref_hits[name][1], 1)):
                print(f"  PARITY DRIFT {name}: hits={hits} chk={chk:.1f} vs "
                      f"{ref_hits[name]} — DO NOT TRUST THIS TIMING",
                      flush=True)
            ts = []
            for _ in range(3):
                t0 = time.time()
                r = f()
                float(jnp.sum(jnp.where(jnp.isfinite(r.t), r.t, 0.0)))
                ts.append(time.time() - t0)
            print(f"  {name}: {min(ts)*1e3:7.1f} ms hits={hits} "
                  f"chk={chk:.1f}", flush=True)
finally:
    pw.K, pw.MAX_VMEM_CLUSTERS = K0, MV0
