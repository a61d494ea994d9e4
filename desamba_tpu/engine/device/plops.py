"""Pallas/Mosaic vector primitives for the per-read kernels.

Mosaic on this toolchain has no vector gather, no scalar dynamic element
read, no unsigned reductions, and rejects negative roll shifts
(tools/pallas_caps.py). These helpers build the missing pieces from what
does lower:
  - dynamic sublane slices  (8.5 ns)
  - take_along_axis along lanes with MATCHED shapes (vreg shuffle)
  - pltpu.roll with dynamic non-negative shifts
  - masked elementwise ops + signed reductions

All shapes are (sublanes, 128) i32/u32 unless noted.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
U32 = jnp.uint32
LANES = 128


def lane_iota(shape):
    return jax.lax.broadcasted_iota(I32, shape, len(shape) - 1)


def sub_iota(shape):
    return jax.lax.broadcasted_iota(I32, shape, len(shape) - 2)


def shuffle_lanes(v, idx):
    """take_along_axis along lanes with the Mosaic shape rules applied:
    operand broadcast to idx.shape, and sublane-1 shapes padded to 2
    (the (1, 128) gather form fails to lower)."""
    shape = idx.shape
    if shape[-2] == 1:
        s2 = shape[:-2] + (2, shape[-1])
        v2 = jnp.broadcast_to(v, s2)
        i2 = jnp.broadcast_to(idx, s2)
        return jnp.take_along_axis(v2, i2, axis=-1)[..., :1, :]
    return jnp.take_along_axis(jnp.broadcast_to(v, shape), idx, axis=-1)


def bcast_lane(v, lane, rows: int | None = None):
    """Broadcast v[..., lane] (dynamic lane) across all lanes — one
    matched-shape shuffle per row. v: (R, 128); lane: scalar."""
    idx = jnp.full(v.shape, lane, I32)
    out = shuffle_lanes(v, idx)
    if rows is not None:
        out = out[:rows]
    return out


def extract(v, lane):
    """v[0, lane] as a scalar (masked reduce). v: (R, 128) int32."""
    m = jnp.where(lane_iota(v.shape) == lane, v, jnp.int32(-2147483648))
    return jnp.max(m[0:1])


def extract_rc(v, row, lane):
    """v[row, lane] as a scalar, row/lane dynamic."""
    m = jnp.where((lane_iota(v.shape) == lane) & (sub_iota(v.shape) == row),
                  v, jnp.int32(-2147483648))
    return jnp.max(m)


def set_lane(v, lane, new, mask=True):
    """v with v[..., lane] = new (broadcast scalar), where mask."""
    return jnp.where(mask & (lane_iota(v.shape) == lane), new, v)


def umax_reduce(v):
    """Unsigned max reduce of u32 bit patterns held in i32 (signed
    reductions only): flip the sign bit, max, flip back."""
    f = v ^ jnp.int32(-2147483648)
    return jnp.max(f) ^ jnp.int32(-2147483648)


def umin(a, b):
    """Unsigned elementwise min on i32 bit patterns (arith.minui does
    not legalize in Mosaic): flip sign bits, signed min, flip back."""
    s = jnp.int32(-2147483648)
    return (jnp.minimum(a ^ s, b ^ s)) ^ s


def ult(a, b):
    """Unsigned a < b on i32 bit patterns."""
    return (a ^ jnp.int32(-2147483648)) < (b ^ jnp.int32(-2147483648))


def ule(a, b):
    return (a ^ jnp.int32(-2147483648)) <= (b ^ jnp.int32(-2147483648))


def roll_flat(pair, off, rows_out: int = 1):
    """Treat pair (2, 128) as a flat 256-vector; return (rows_out, 128)
    starting at flat offset `off` (0 <= off < 128). Used to align a
    2-row window load to its first used word."""
    a = pltpu.roll(pair, (LANES - off) % LANES, 1)   # a[s,l] = x[s,(l+off)%128]
    b = jnp.concatenate([a[1:], a[:1]], axis=0)      # next row's rotation
    y = jnp.where(lane_iota(a.shape) < LANES - off, a, b)
    return y[:rows_out]


def gather_rows_table(get_row, n_rows: int, idx):
    """Vector gather tab[idx] for a table of n_rows x 128, idx (R, 128)
    int32 in [0, n_rows*128): per table row, broadcast + lane shuffle +
    select. get_row(r) must return the (1, 128) row r (static r).

    Cost: n_rows x (shuffle + select); keep tables <= 32 rows hot."""
    r = idx >> 7
    l = idx & 127
    acc = jnp.zeros(idx.shape, I32)
    for rr in range(n_rows):
        sh = shuffle_lanes(get_row(rr), l)
        acc = jnp.where(r == rr, sh, acc)
    return acc


def prefix_sum_colmajor(v):
    """Inclusive prefix sum of v (R, 128) int32 in COLUMN-MAJOR element
    order (flat index = lane * R + row). Returns same shape.

    Used for emission-ordered candidate counts where the probe lattice
    maps window position -> (row = phase step, lane = word)."""
    R = v.shape[0]
    acc = v
    for s in range(1, R):  # inclusive prefix along rows (R small, static)
        sh = jnp.concatenate([jnp.zeros((s, LANES), v.dtype), v[:-s]], axis=0)
        acc = acc + sh
    tot = acc[R - 1 : R]            # per-lane totals (1, 128)
    cur = tot
    s = 1
    while s < LANES:                # inclusive scan over lanes (log steps)
        sh = pltpu.roll(cur, s, 1)
        sh = jnp.where(lane_iota(sh.shape) >= s, sh, 0)
        cur = cur + sh
        s <<= 1
    ex = cur - tot                  # exclusive lane prefix
    return acc + jnp.broadcast_to(ex, v.shape)


def reverse_lanes(v):
    """Reverse along the lane axis (static shuffle)."""
    idx = jnp.broadcast_to((LANES - 1) - lane_iota(v.shape), v.shape)
    return shuffle_lanes(v, idx)


def reverse_colmajor(v):
    """Reverse v (R, 128) in column-major element order: element
    (r, l) <- (R-1-r, 127-l). Row reversal by static concat (the `rev`
    primitive does not lower in Mosaic)."""
    R = v.shape[0]
    rr = jnp.concatenate([v[r : r + 1] for r in range(R - 1, -1, -1)],
                         axis=0)
    return reverse_lanes(rr)


def popc32(v):
    """Popcount of u32."""
    v = v - ((v >> 1) & U32(0x55555555))
    v = (v & U32(0x33333333)) + ((v >> 2) & U32(0x33333333))
    v = (v + (v >> 4)) & U32(0x0F0F0F0F)
    return ((v * U32(0x01010101)) >> 24).astype(I32)
