"""K sweep on the BENCH sphere-grid scene (n_theta=10, ~131k tris, ~180-tri
spheres) — k_sweep.py's conclusions were derived on the n_theta=18 scene
(~612-tri spheres), and the optimal K is object-granularity-dependent: the
treelet re-pack aligns clusters to sphere subtrees, so K relative to the
per-object triangle count decides how many objects share a cluster (K=384
packs two 180-tri spheres per cluster; a ray overlapping one sphere then
wastes half of every [R, 3K] test).

Measures trace time + per-tile visit count per K on coherent + divergent
262k-ray wavefronts. Run on a real chip: python tools/perf/k_sweep_bench.py
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from rustlight_tpu.scene.geometry import build_geometry_tables
import rustlight_tpu.accel.pallas_walk as pw
from rustlight_tpu.cli import _enable_compile_cache

_enable_compile_cache()

from rustlight_tpu.models.presets import sphere_grid_mesh

rng = np.random.default_rng(3)
n = 262144
mesh, gs = sphere_grid_mesh(122_000, n_theta=10)
geom = build_geometry_tables([mesh], [-1])
ext = gs * 3.0
o_c = np.tile(np.array([ext / 2, ext / 2, -0.35 * ext], np.float32), (n, 1))
tgt = rng.uniform(0, ext, (n, 3)).astype(np.float32)
d_c = (tgt - o_c) / np.linalg.norm(tgt - o_c, axis=1, keepdims=True)
o_d = rng.uniform(0, ext, (n, 3)).astype(np.float32)
d_d = rng.normal(size=(n, 3)).astype(np.float32)
d_d /= np.linalg.norm(d_d, axis=1, keepdims=True)

K0, MV0 = pw.K, pw.MAX_VMEM_CLUSTERS
ref_hits = {}
rows = []
try:
    for Ksw in (K0, 128, 256, 512, 640, 768):
        pw.K = Ksw
        pw.MAX_VMEM_CLUSTERS = MV0 * K0 // Ksw
        wt = jax.device_put(pw.build_walk_tables(geom))
        fill = geom.n_tris / (wt.n_real * Ksw)
        print(f"K={Ksw}: C={wt.n_real} fill={fill:.3f} "
              f"resident={wt.ids is not None}", flush=True)
        row = {"K": Ksw, "C": int(wt.n_real), "fill": round(fill, 3)}
        for name, o, d in [("coherent", o_c, d_c), ("divergent", o_d, d_d)]:
            o_j, d_j = jnp.asarray(o), jnp.asarray(d)
            f = lambda: pw.intersect_walk(wt, o_j, d_j)
            try:
                r = f()
                chk = float(jnp.sum(jnp.where(jnp.isfinite(r.t), r.t, 0.0)))
                hits = int(jnp.sum(r.hit))
            except Exception as e:
                print(f"  {name}: K={Ksw} FAILED: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
                continue
            if name not in ref_hits:
                ref_hits[name] = (hits, chk)
            parity = (hits == ref_hits[name][0]
                      and abs(chk - ref_hits[name][1]) < 0.5)
            if not parity:
                print(f"  PARITY DRIFT {name}: hits={hits} chk={chk:.1f} vs "
                      f"{ref_hits[name]}", flush=True)
            ts = []
            for _ in range(3):
                t0 = time.time()
                r = f()
                float(jnp.sum(jnp.where(jnp.isfinite(r.t), r.t, 0.0)))
                ts.append(time.time() - t0)
            row[name] = {"ms": round(min(ts) * 1e3, 1), "hits": hits,
                         "parity": parity}
            print(f"  {name}: {min(ts)*1e3:7.1f} ms hits={hits} "
                  f"parity={parity}", flush=True)
        rows.append(row)
finally:
    pw.K, pw.MAX_VMEM_CLUSTERS = K0, MV0

out_dir = Path(__file__).parent / "regress"
out_dir.mkdir(exist_ok=True)
(out_dir / "k_sweep_bench.json").write_text(json.dumps(rows, indent=2))
print(json.dumps(rows))
