import time
import numpy as np
import jax
import jax.numpy as jnp

from rustlight_tpu.scene.geometry import TriMesh, make_sphere
from rustlight_tpu.scene import Scene, make_camera, look_at
from rustlight_tpu import bsdfs
from rustlight_tpu.integrators import IntegratorAO, IntegratorPathTracing, render

# ~4.9M-tri sphere grid: crosses the old 2^14-cluster cap (wide HBM walk)
base = make_sphere((0, 0, 0), 1.0, n_theta=18, n_phi=18)
nt_per = base.indices.shape[0]
gs = int(np.ceil((4_200_000 / nt_per) ** (1 / 3)))
vs, idxs = [], []
off = 0
for i in range(gs):
    for j in range(gs):
        for k in range(gs):
            c = np.array([i, j, k], np.float32) * 3.0
            vs.append(base.vertices + c)
            idxs.append(base.indices + off)
            off += base.vertices.shape[0]
verts = np.concatenate(vs).astype(np.float32)
idx = np.concatenate(idxs).astype(np.int32)

sc = Scene()
m = sc.add_material(bsdfs.diffuse((0.65, 0.6, 0.55)))
sc.add_mesh(TriMesh(vertices=verts, indices=idx, material=m))
ext = gs * 3.0
sc.camera = make_camera(256, 256, fov=55.0,
                        to_world=look_at((ext/2, ext/2, -0.35*ext),
                                         (ext/2, ext/2, ext/2), (0, 1, 0)))
t0 = time.time()
sd = sc.compile()
print(f"compile(scene) {time.time()-t0:.1f}s tris={sd.geom.n_tris} "
      f"clusters={sd.geom.walk.n_real} resident={sd.geom.walk.resident}",
      flush=True)
assert sd.geom.walk.n_clusters > (1 << 14), "must exceed old cap"

t0 = time.time()
film = render(sd, IntegratorAO(max_distance=2.0), spp=4, seed=0)
img = film["primal"]
print(f"ao 256^2 4spp: {time.time()-t0:.1f}s (incl XLA compile) "
      f"mean={img.mean():.4f}", flush=True)
t0 = time.time()
film = render(sd, IntegratorAO(max_distance=2.0), spp=4, seed=1)
print(f"ao warm: {time.time()-t0:.1f}s", flush=True)

from rustlight_tpu.utils import image as rimage
rimage.save("/root/repo/gallery/bigscene_4p9M.png", np.asarray(img))
print("saved gallery/bigscene_4p9M.png", flush=True)
