"""Multi-chip rendering via jax.sharding.

The reference parallelizes with rayon threads over 16x16 image blocks and
mutex-merged films (SURVEY.md §2.10). The TPU equivalents implemented here:

  P1 (image-block data parallelism)  -> shard the pixel wavefront over the
     mesh 'd' axis with shard_map; film shards concatenate (no merge needed).
  P2/P6 (splatting + reduction)      -> each device splats into a private
     full-resolution film; one psum over ICI merges them (used by light
     tracing / VPL / MCMC integrators).

Scene tables are replicated (they are small); only lane state is sharded.
Multi-host scaling needs nothing further: the film psum is the only
cross-device communication in the whole renderer.
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..integrators.common import Integrator, _pixel_grid
from ..scene.scene import SceneData
from ..utils.film import Film
from ..utils.rng import make_stream, stream_fold


def make_device_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("d",))


def render_step_sharded(scene: SceneData, integrator: Integrator, mesh: Mesh,
                        pix_sharded, seed: int = 0, spp_per_pass: int = 1):
    """One sharded render step: pix_sharded [n_dev * lanes_per_dev, 2] ->
    radiance accumulated over spp_per_pass samples. jit-compatible; this is
    the `dryrun_multichip` "training step"."""
    n_dev = mesh.shape["d"]

    def device_fn(scene_, pix_):
        dev = jax.lax.axis_index("d")
        base = make_stream(seed)

        def one(s, acc):
            stream = stream_fold(stream_fold(base, dev), s)
            li = integrator.compute_pixel(scene_, pix_, stream)
            ok = jnp.all(jnp.isfinite(li), axis=-1) & jnp.all(li >= 0.0, axis=-1)
            return acc + jnp.where(ok[:, None], li, 0.0)

        n = pix_.shape[0]
        return jax.lax.fori_loop(
            0, spp_per_pass, one, jnp.zeros((n, 3), jnp.float32))

    fn = shard_map(device_fn, mesh=mesh,
                   in_specs=(P(), P("d", None)), out_specs=P("d", None),
                   check_rep=False)
    return fn(scene, pix_sharded)


def render_block_sharded(scene: SceneData, integrator, mesh: Mesh,
                         pix_sharded, spp: int, seed: int = 0):
    """Persistent-wavefront step sharded over the mesh: each device runs the
    full pixel-pinned respawn loop (compute_block) on its pixel shard — all
    spp in one launch, zero cross-device traffic until the film concat."""
    def device_fn(scene_, pix_):
        dev = jax.lax.axis_index("d")
        stream = stream_fold(stream_fold(make_stream(seed), dev), 0)
        acc = integrator.compute_block(scene_, pix_, stream, spp)
        ok = jnp.all(jnp.isfinite(acc), axis=-1) & jnp.all(acc >= 0.0, axis=-1)
        return jnp.where(ok[:, None], acc, 0.0)

    fn = shard_map(device_fn, mesh=mesh,
                   in_specs=(P(), P("d", None)), out_specs=P("d", None),
                   check_rep=False)
    return fn(scene, pix_sharded)


def render_sharded(scene: SceneData, integrator: Integrator, spp: int,
                   mesh: Optional[Mesh] = None, seed: int = 0,
                   spp_per_pass: int = 8, verbose: bool = False,
                   persistent: bool = None) -> Film:
    """Full sharded render: pixels split over the mesh, spp looped on host
    (or one persistent-wavefront launch when the integrator supports it)."""
    if mesh is None:
        mesh = make_device_mesh()
    n_dev = mesh.shape["d"]
    w, h = scene.camera.width, scene.camera.height
    pix = _pixel_grid(w, h)
    n = pix.shape[0]
    pad = (-n) % n_dev
    if pad:
        pix = np.concatenate([pix, np.tile(pix[-1:], (pad, 1))], 0)
    pix = jnp.asarray(pix)

    if persistent is None:
        persistent = (hasattr(integrator, "compute_block")
                      and jax.default_backend() == "tpu")
    t0 = time.time()
    if persistent and hasattr(integrator, "compute_block"):
        step = jax.jit(lambda sc, px: render_block_sharded(
            sc, integrator, mesh, px, spp, seed=seed))
        acc = step(scene, pix)
        done = spp
    else:
        chunk = max(1, min(spp_per_pass, spp))
        step = jax.jit(lambda sc, px: render_step_sharded(
            sc, integrator, mesh, px, seed=seed, spp_per_pass=chunk))

        acc = jnp.zeros((pix.shape[0], 3), jnp.float32)
        done = 0
        while done < spp:
            acc = acc + step(scene, pix)
            done += chunk
    acc.block_until_ready()
    if verbose:
        dt = time.time() - t0
        print(f"render_sharded[{n_dev}dev]: {done} spp in {dt:.2f}s")

    img = np.asarray(acc)[:n].reshape(h, w, 3) / done
    film = Film(w, h)
    film.buffers["primal"] = img
    return film
