import os, time
import numpy as np
import jax
from rustlight_tpu.cli import _enable_compile_cache
_enable_compile_cache()
import jax.numpy as jnp
from rustlight_tpu.scene.geometry import TriMesh, make_sphere
from rustlight_tpu.scene import Scene, make_camera, look_at
from rustlight_tpu import bsdfs
from rustlight_tpu.integrators import IntegratorPathTracing, render

base = make_sphere((0,0,0), 1.0, n_theta=10, n_phi=10)
nt = base.indices.shape[0]
gs = int(np.ceil((122_000/nt)**(1/3)))
vs, idxs = [], []
off = 0
for i in range(gs):
    for j in range(gs):
        for k in range(gs):
            vs.append(base.vertices + np.array([i,j,k],np.float32)*3.0)
            idxs.append(base.indices + off)
            off += base.vertices.shape[0]
sc = Scene()
m = sc.add_material(bsdfs.diffuse((0.6,0.55,0.5)))
sc.add_mesh(TriMesh(vertices=np.concatenate(vs), indices=np.concatenate(idxs), material=m))
lm = sc.add_material(bsdfs.diffuse((0,0,0)))
ext = gs*3.0
from rustlight_tpu.scene import make_quad
sc.add_mesh(make_quad((0, ext+4, 0), (ext, ext+4, 0), (ext, ext+4, ext), (0, ext+4, ext),
                      material=lm, emission=(40,40,40)))
sc.camera = make_camera(256, 256, fov=55.0,
                        to_world=look_at((ext/2, ext/2, -0.35*ext), (ext/2, ext/2, ext/2), (0,1,0)))
sd = sc.compile()
print("tris", sd.geom.n_tris, "pair_env", os.environ.get("RUSTLIGHT_TPU_PAIR_WALK"), flush=True)
t0=time.time(); f = render(sd, IntegratorPathTracing(max_depth=5, hard_cap=5), spp=8, seed=0)
img = np.asarray(f["primal"])
print(f"e2e cold {time.time()-t0:.2f}s mean={img.mean():.5f}", flush=True)
t0=time.time(); f = render(sd, IntegratorPathTracing(max_depth=5, hard_cap=5), spp=8, seed=1)
print(f"e2e warm {time.time()-t0:.2f}s", flush=True)
