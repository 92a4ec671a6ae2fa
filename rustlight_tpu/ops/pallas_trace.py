"""Fused ray-triangle intersection as a Pallas TPU kernel.

The XLA dense intersector (accel/dense.py) materializes [N, 3T] intermediates
in HBM between the MXU matmuls and the VPU resolve — ~2.4 GB of traffic per
trace at 262k rays. This kernel fuses matmul + resolve + winner-reduction per
ray tile so every intermediate lives in VMEM; HBM sees only the ray inputs
and the per-ray outputs.

Grid: one program per tile of RAY_TILE rays. The triangle rows (Baldwin-Weber
blocks, [4, 3T]) are broadcast to every program and stay resident in VMEM
(fits for T <= ~2048 triangles; larger scenes fall back to the XLA path or
the BVH).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_TILE = 2048
MAX_PALLAS_COLS = 3 * 2048  # VMEM budget for the row matrix + one tile


def _dot4(x4, rows):
    """[tile, 4] x [4, 3c] as 4 VPU fused multiply-adds: with K=4 the MXU is
    ~3% utilized, the VPU form is exact f32 and faster."""
    return (x4[:, 0:1] * rows[0][None, :] + x4[:, 1:2] * rows[1][None, :]
            + x4[:, 2:3] * rows[2][None, :] + x4[:, 3:4] * rows[3][None, :])


def _trace_kernel(rows_ref, o4_ref, d4_ref, tnear_ref, tfar_ref,
                  t_ref, idx_ref, u_ref, v_ref):
    c3 = rows_ref.shape[1]
    c = c3 // 3
    ao = _dot4(o4_ref[:], rows_ref[:])
    ad = _dot4(d4_ref[:], rows_ref[:])
    no, uo, vo = ao[:, :c], ao[:, c:2 * c], ao[:, 2 * c:]
    nd, ud, vd = ad[:, :c], ad[:, c:2 * c], ad[:, 2 * c:]

    live = jnp.abs(nd) > 1e-20
    t = -no / jnp.where(live, nd, 1.0)
    u = uo + t * ud
    v = vo + t * vd
    tnear = tnear_ref[:]
    tfar = tfar_ref[:]
    valid = (live & (t > tnear[:, None]) & (t < tfar[:, None])
             & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0))

    t_masked = jnp.where(valid, t, jnp.inf)
    best_t = jnp.min(t_masked, axis=1)
    iota = lax.broadcasted_iota(jnp.int32, t.shape, 1)
    idx = jnp.min(jnp.where(t_masked == best_t[:, None], iota, c), axis=1)
    idx = jnp.minimum(idx, c - 1)
    sel = iota == idx[:, None]

    t_ref[:] = best_t
    idx_ref[:] = jnp.where(jnp.isfinite(best_t), idx, -1)
    u_ref[:] = jnp.sum(jnp.where(sel, u, 0.0), axis=1)
    v_ref[:] = jnp.sum(jnp.where(sel, v, 0.0), axis=1)


def _anyhit_kernel(rows_ref, o4_ref, d4_ref, tnear_ref, tfar_ref, occ_ref):
    c3 = rows_ref.shape[1]
    c = c3 // 3
    ao = _dot4(o4_ref[:], rows_ref[:])
    ad = _dot4(d4_ref[:], rows_ref[:])
    no, uo, vo = ao[:, :c], ao[:, c:2 * c], ao[:, 2 * c:]
    nd, ud, vd = ad[:, :c], ad[:, c:2 * c], ad[:, 2 * c:]
    live = jnp.abs(nd) > 1e-20
    t = -no / jnp.where(live, nd, 1.0)
    u = uo + t * ud
    v = vo + t * vd
    valid = (live & (t > tnear_ref[:][:, None]) & (t < tfar_ref[:][:, None])
             & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0))
    occ_ref[:] = jnp.any(valid, axis=1).astype(jnp.int32)


def pallas_supported(n_cols: int) -> bool:
    """Opt-in: measured on v5e, XLA's own fusion of the dense intersector
    (2.7 ms / 262k rays) currently beats this kernel (4.8 ms) — Mosaic's
    codegen for the select/reduce resolve is the gap. Kept for iteration;
    enable with RUSTLIGHT_TPU_PALLAS=1."""
    import os
    return (os.environ.get("RUSTLIGHT_TPU_PALLAS") == "1"
            and n_cols <= MAX_PALLAS_COLS
            and jax.default_backend() == "tpu")


@functools.partial(jax.jit, static_argnames=("any_hit",))
def pallas_trace(rows_t, o4, d4, tnear, tfar, any_hit: bool = False):
    """rows_t [4, 3c] (N|U|V column blocks); o4/d4 [n, 4]; returns
    (t, idx, u, v) or occluded (int32)."""
    n = o4.shape[0]
    c3 = rows_t.shape[1]
    pad = (-n) % RAY_TILE
    if pad:
        z4 = jnp.zeros((pad, 4), o4.dtype)
        o4 = jnp.concatenate([o4, z4], 0)
        d4 = jnp.concatenate([d4, z4], 0)
        tnear = jnp.concatenate([tnear, jnp.full(pad, jnp.inf)], 0)
        tfar = jnp.concatenate([tfar, jnp.zeros(pad)], 0)
    n_pad = o4.shape[0]
    grid = (n_pad // RAY_TILE,)

    ray_spec = pl.BlockSpec((RAY_TILE, 4), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    scal_spec = pl.BlockSpec((RAY_TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((4, c3), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((RAY_TILE,), lambda i: (i,),
                            memory_space=pltpu.VMEM)

    if any_hit:
        occ = pl.pallas_call(
            _anyhit_kernel,
            grid=grid,
            in_specs=[rows_spec, ray_spec, ray_spec, scal_spec, scal_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.int32),
        )(rows_t, o4, d4, tnear, tfar)
        return occ[:n] > 0

    t, idx, u, v = pl.pallas_call(
        _trace_kernel,
        grid=grid,
        in_specs=[rows_spec, ray_spec, ray_spec, scal_spec, scal_spec],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.int32),
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
        ),
    )(rows_t, o4, d4, tnear, tfar)
    return t[:n], idx[:n], u[:n], v[:n]
