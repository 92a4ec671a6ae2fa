"""MXU-friendly table gathers.

XLA's row gather lowers to a serial per-element loop on TPU when the row size
is small (measured ~29 ms for 64k gathers from a 128-row table vs ~30 us for
the equivalent matmul on v5e). Since the renderer's hot tables (materials,
triangles, emitter atoms) are small, `table_take` lowers gathers to a one-hot
matmul: onehot(idx) [n, t] @ table [t, c] — pure MXU work, fully parallel.

Precision: the one-hot operand is exact 0/1 and f32 matmul on the MXU uses the
6-pass bf16 decomposition under Precision.HIGHEST (~f32-accurate); integer and
bool tables round-trip exactly below 2^24.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# one-hot matmul beats the serial gather up to a few thousand rows; beyond
# that fall back to XLA's gather (large tables amortize its overhead)
MAX_ONEHOT_ROWS = 4096


def _onehot_take(table, idx):
    t = table.shape[0]
    trailing = table.shape[1:]
    flat = table.reshape(t, -1)
    oh = (idx[:, None] == jnp.arange(t, dtype=idx.dtype)[None, :])
    if flat.dtype in (jnp.int32, jnp.int8, jnp.uint32, jnp.bool_):
        vals = jnp.dot(oh.astype(jnp.float32), flat.astype(jnp.float32),
                       precision=lax.Precision.HIGHEST)
        out = jnp.round(vals).astype(table.dtype) if flat.dtype != jnp.bool_ \
            else vals > 0.5
    else:
        out = jnp.dot(oh.astype(flat.dtype), flat,
                      precision=lax.Precision.HIGHEST)
    return out.reshape(idx.shape + trailing)


def table_take(table, idx, axis: int = 0):
    """Gather rows of `table` at `idx` (int array, any shape).

    Drop-in for jnp.take(table, idx, axis=0) with clipped out-of-range
    behavior for negative/overflow indices (callers mask separately).
    """
    assert axis == 0
    idx = jnp.clip(idx, 0, table.shape[0] - 1).astype(jnp.int32)
    if table.shape[0] <= MAX_ONEHOT_ROWS:
        shape = idx.shape
        out = _onehot_take(table, idx.reshape(-1))
        return out.reshape(shape + table.shape[1:])
    return jnp.take(table, idx, axis=0)
