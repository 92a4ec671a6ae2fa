"""Flattened BVH: native C++ binned-SAH build + stackless device traversal.

Build (host): the C++ builder (accel/native/bvh_builder.cpp, compiled on
first use and loaded via ctypes) — the framework's native equivalent of the
reference's Rust SAH builder / Embree backend (src/accel.rs:79-344, 346-416).
A pure-numpy median-split fallback covers environments without a compiler.

Traversal (device): preorder skip-link walk in a vmapped lax.while_loop —
hit -> next node (i+1), miss -> skip link; leaves run the MXU dense
triangle test over their primitive range. Node fetches use one-hot matmul
gathers for small trees (ops/gather.py) and XLA gathers beyond.

For Cornell-box-class scenes the pure dense intersector (accel/dense.py) wins
outright; the BVH is the large-scene path. Round-2 plan: cluster leaves of
128 triangles intersected as single MXU blocks.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax

from .. import EPSILON
from .dense import RayHit, _chunk_test

_NATIVE_DIR = Path(__file__).parent / "native"
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _load_native():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    so = _NATIVE_DIR / "libbvh.so"
    src = _NATIVE_DIR / "bvh_builder.cpp"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", str(so), str(src)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(so))
        sig = [ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
               ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
        lib.rl_build_bvh.restype = ctypes.c_int
        lib.rl_build_bvh.argtypes = sig
        lib.rl_build_bvh_sweep.restype = ctypes.c_int
        lib.rl_build_bvh_sweep.argtypes = sig
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
    return _LIB


def _build_numpy(aabbs: np.ndarray, max_leaf: int):
    """Median-split fallback builder (same node layout)."""
    n = aabbs.shape[0]
    cent = 0.5 * (aabbs[:, :3] + aabbs[:, 3:])
    order = np.arange(n, dtype=np.int32)
    nodes = []

    def recurse(begin, end):
        idx = len(nodes)
        sel = order[begin:end]
        lo = aabbs[sel, :3].min(0)
        hi = aabbs[sel, 3:].max(0)
        nodes.append([lo, hi, -1, begin, 0])
        count = end - begin
        if count <= max_leaf:
            nodes[idx][4] = count
            return idx
        axis = int(np.argmax(cent[sel].max(0) - cent[sel].min(0)))
        mid = begin + count // 2
        part = np.argsort(cent[sel, axis], kind="stable")
        order[begin:end] = sel[part]
        recurse(begin, mid)
        right = recurse(mid, end)
        nodes[idx][3] = right
        return idx

    def fix(idx, skip):
        nodes[idx][2] = skip
        if nodes[idx][4] > 0:
            return
        right = nodes[idx][3]
        nodes[idx][3] = 0
        fix(idx + 1, right)
        fix(right, skip)

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000))
    try:
        recurse(0, n)
        fix(0, -1)
    finally:
        sys.setrecursionlimit(old)
    out = np.zeros((len(nodes), 9), np.float32)
    for i, (lo, hi, skip, start, cnt) in enumerate(nodes):
        out[i, :3] = lo
        out[i, 3:6] = hi
        out[i, 6:9] = np.asarray([skip, start, cnt], np.int32).view(np.float32)
    return out, order


@struct.dataclass
class BvhTables:
    n_nodes: int = struct.field(pytree_node=False)
    leaf_size: int = struct.field(pytree_node=False)
    bbox_lo: Any      # [m, 3]
    bbox_hi: Any      # [m, 3]
    skip: Any         # [m] int32
    prim_start: Any   # [m] int32
    prim_count: Any   # [m] int32
    # primitives reordered into leaf-contiguous layout, padded per leaf range
    inter_rows: Any   # [t, 3, 4] reordered Baldwin-Weber rows
    prim_index: Any   # [t] original triangle ids


def build_bvh(geom, max_leaf: int = 8, builder: str = "binned") -> BvhTables:
    """Build from GeometryTables (uses only the real, unpadded triangles).

    builder: "binned" (16-bin SAH, the default) or "sweep" (full SAH sweep,
    the reference's exact algorithm src/accel.rs:115-199 — higher build
    cost, occasionally tighter trees; A/B'd in tools/perf/cluster_lab.py).

    Pass numpy-leaved tables (e.g. scene.host.data.geom): reading device
    arrays back poisons launch latency on the axon relay."""
    if hasattr(geom, "host") and geom.host is not None:  # SceneData passed
        geom = geom.host.data.geom
    v0 = np.asarray(geom.v0[: geom.n_tris])
    e1 = np.asarray(geom.e1[: geom.n_tris])
    e2 = np.asarray(geom.e2[: geom.n_tris])
    p1 = v0 + e1
    p2 = v0 + e2
    lo = np.minimum(np.minimum(v0, p1), p2)
    hi = np.maximum(np.maximum(v0, p1), p2)
    aabbs = np.concatenate([lo, hi], -1).astype(np.float32)
    n = aabbs.shape[0]

    lib = _load_native()
    if lib is not None:
        nodes_buf = np.zeros((2 * n, 9), np.float32)
        order = np.zeros(n, np.int32)
        entry = (lib.rl_build_bvh_sweep if builder == "sweep"
                 else lib.rl_build_bvh)
        cnt = entry(
            aabbs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, max_leaf,
            nodes_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        nodes = nodes_buf[:cnt]
    else:
        nodes, order = _build_numpy(aabbs, max_leaf)

    ints = nodes[:, 6:9].view(np.int32)
    rows = np.asarray(geom.inter_rows[: geom.n_tris])[order]
    # pad so leaf dynamic_slices of width max_leaf never clamp (a clamped
    # slice would silently test the wrong primitives)
    rows = np.concatenate(
        [rows, np.zeros((max_leaf, 3, 4), np.float32)], axis=0)
    # Leaves stay NUMPY: device consumers (intersect_bvh) jit-close over the
    # tables, embedding them as compile-time constants exactly like the
    # scene tables; host consumers (cluster/walk builders) read them without
    # a device->host readback — any readback permanently degrades launch
    # latency on the axon relay (see scene/scene.py HostMirror).
    return BvhTables(
        n_nodes=nodes.shape[0], leaf_size=max_leaf,
        bbox_lo=nodes[:, :3].copy(), bbox_hi=nodes[:, 3:6].copy(),
        skip=ints[:, 0].copy(), prim_start=ints[:, 1].copy(),
        prim_count=ints[:, 2].copy(),
        inter_rows=rows, prim_index=order,
    )


def intersect_bvh(bvh: BvhTables, o, d, tnear=None, tfar=None) -> RayHit:
    """Closest-hit traversal for a ray wavefront (vmapped stackless walk).

    Backend note: this path targets CPU (tests, host-side tooling) and small
    wavefronts. The axon/v5e XLA backend lowers per-lane dynamic table access
    inside vmapped while_loops by broadcasting the operand per lane (an
    [N, T*12] buffer — tens of GB at scene scale), so large-wavefront TPU
    traversal is not viable on this hardware generation; the dense MXU
    intersector (accel/dense.py) is the production TPU path, with cost linear
    in the padded triangle count (~0.03 ms per 262k rays per 8 triangles)."""
    n = o.shape[0]
    if tnear is None:
        tnear = jnp.full(n, EPSILON)
    if tfar is None:
        tfar = jnp.full(n, jnp.inf)
    # table leaves are host numpy (see build_bvh) — lift to device values
    # here, the single device-consumption boundary
    bvh = jax.tree.map(jnp.asarray, bvh)
    k = bvh.leaf_size

    def one_ray(o1, d1, tn, tf):
        inv_d = 1.0 / jnp.where(jnp.abs(d1) > 1e-12, d1,
                                jnp.where(d1 >= 0, 1e-12, -1e-12))

        def cond(s):
            return s[0] >= 0

        def body(s):
            node, best_t, best_i, best_u, best_v = s
            lo = bvh.bbox_lo[node]
            hi = bvh.bbox_hi[node]
            t0 = (lo - o1) * inv_d
            t1 = (hi - o1) * inv_d
            tmin = jnp.max(jnp.minimum(t0, t1))
            tmax = jnp.min(jnp.maximum(t0, t1))
            hit_box = (tmax >= jnp.maximum(tmin, tn)) & (tmin <= jnp.minimum(best_t, tf))
            cnt = bvh.prim_count[node]
            is_leaf = cnt > 0

            def leaf_test(args):
                best_t, best_i, best_u, best_v = args
                start = bvh.prim_start[node]
                # flat 1-D element gather, NOT dynamic_slice/row-take: under
                # vmap those batch by broadcasting the whole row table per
                # lane ([N, T, 3, 4] — tens of GB at scene scale); a flat
                # gather stays [N, k*12]
                flat = bvh.inter_rows.reshape(-1)
                idx = start * 12 + lax.iota(jnp.int32, k * 12)
                rows = jnp.take(flat, idx).reshape(k, 3, 4)
                o4 = jnp.concatenate([o1, jnp.ones(1)])[None]
                d4 = jnp.concatenate([d1, jnp.zeros(1)])[None]
                t, u, v, valid = _chunk_test(rows, o4, d4, tn[None], tf[None])
                in_leaf = lax.broadcasted_iota(jnp.int32, (1, k), 1) < cnt
                valid = valid & in_leaf & (t < best_t)
                t_m = jnp.where(valid, t, jnp.inf)[0]
                j = jnp.argmin(t_m)
                better = t_m[j] < best_t
                return (jnp.where(better, t_m[j], best_t),
                        jnp.where(better, start + j, best_i),
                        jnp.where(better, u[0, j], best_u),
                        jnp.where(better, v[0, j], best_v))

            best_t, best_i, best_u, best_v = lax.cond(
                hit_box & is_leaf, leaf_test, lambda a: a,
                (best_t, best_i, best_u, best_v))
            nxt = jnp.where(hit_box & (~is_leaf), node + 1, bvh.skip[node])
            return (nxt, best_t, best_i, best_u, best_v)

        node0 = jnp.int32(0)
        _, bt, bi, bu, bv = lax.while_loop(
            cond, body, (node0, jnp.inf, jnp.int32(-1), 0.0, 0.0))
        return bt, bi, bu, bv

    bt, bi, bu, bv = jax.vmap(one_ray)(o, d, tnear, tfar)
    hit = jnp.isfinite(bt)
    tri = jnp.where(hit, jnp.take(bvh.prim_index,
                                  jnp.clip(bi, 0, bvh.prim_index.shape[0] - 1)),
                    -1)
    return RayHit(t=bt, tri=tri, u=bu, v=bv, hit=hit)
