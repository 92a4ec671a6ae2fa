import time, numpy as np, jax, jax.numpy as jnp
from rustlight_tpu.scene.geometry import TriMesh, make_sphere, build_geometry_tables
from rustlight_tpu.accel.pallas_walk import intersect_walk, occluded_walk, build_walk_tables
from rustlight_tpu.cli import _enable_compile_cache
_enable_compile_cache()
base = make_sphere((0, 0, 0), 1.0, n_theta=18, n_phi=18)
nt_per = base.indices.shape[0]
rng = np.random.default_rng(3)
n = 262144
gs49 = int(np.ceil((4_200_000 / nt_per) ** (1 / 3)))
_ = rng.uniform(0, gs49*3.0, (n, 3)); _ = rng.uniform(0, gs49*3.0, (n, 3)); _ = rng.normal(size=(n, 3))
gs = int(np.ceil((110_000 / nt_per) ** (1 / 3)))
vs, idxs, off = [], [], 0
for i in range(gs):
    for j in range(gs):
        for k in range(gs):
            c = np.array([i, j, k], np.float32) * 3.0
            vs.append(base.vertices + c); idxs.append(base.indices + off)
            off += base.vertices.shape[0]
verts = np.concatenate(vs).astype(np.float32)
idx = np.concatenate(idxs).astype(np.int32)
geom = build_geometry_tables([TriMesh(vertices=verts, indices=idx, material=0)], [-1])
wt = jax.device_put(build_walk_tables(geom))
ext = gs * 3.0
o_c = np.tile(np.array([ext/2, ext/2, -0.35*ext], np.float32), (n, 1))
tgt = rng.uniform(0, ext, (n, 3)).astype(np.float32)
d_c = tgt - o_c; d_c /= np.linalg.norm(d_c, axis=1, keepdims=True)
o_d = rng.uniform(0, ext, (n, 3)).astype(np.float32)
d_d = rng.normal(size=(n, 3)).astype(np.float32)
d_d /= np.linalg.norm(d_d, axis=1, keepdims=True)
for name, o, d in [("coherent", o_c, d_c), ("divergent", o_d, d_d)]:
    o, d = jnp.asarray(o), jnp.asarray(d)
    f = lambda: intersect_walk(wt, o, d)
    r = f(); float(jnp.sum(jnp.where(jnp.isfinite(r.t), r.t, 0.0)))
    ts = []
    for _i in range(3):
        t0 = time.time(); r = f()
        chk = float(jnp.sum(jnp.where(jnp.isfinite(r.t), r.t, 0.0)))
        ts.append(time.time() - t0)
    print(f"122k {name}: {min(ts)*1e3:7.1f} ms hits={int(jnp.sum(r.hit))} chk={chk:.1f}", flush=True)
