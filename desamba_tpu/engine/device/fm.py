"""Batched FM rank + backward MEM search on device.

The reference's hottest scalar loop (occ: src/bwt.c:43-65, called twice per
char per seed, SURVEY §3.4) becomes a lane-parallel `lax.while_loop` over
the interval phase, and the per-row single walks (src/cly.c:1344-1383) —
the dominant sequential cost, one dependent row gather per matched char —
collapse to position-space packed LCEs over the unitig text (see
textwalk.py): the full SA (row_pos) turns "LF-walk w rows" into "compare
w chars starting at row_pos[row]-1", ~w/16 word gathers.

The reference's SP_SET row dedup (src/cly.c:1281-1298) is kept bit-exact
as a set of disjoint position intervals carried through the ladder loops.

Parity contract (tests/test_device_engine.py): for identical probe inputs
and SP_SET state, `mem_probe` returns exactly the MemRst set of the gold
engine's bwt_mem_search (match lengths, final rows, SA samples, dedup
aborts).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...constants import L_PRE_IDX
from .arrays import BLOCK
from .textwalk import (
    find_bit_low,
    ivset_init,
    ivset_walk,
    lce_backward,
)

U32 = jnp.uint32
I32 = jnp.int32


class WalkRefs(NamedTuple):
    """The subset of index arrays the position-space walk needs — any
    object with these attributes works (IndexRefs qualifies)."""
    row_pos: jnp.ndarray
    text_pk: jnp.ndarray
    sep_any: jnp.ndarray
    samp_bits: jnp.ndarray
    isa: jnp.ndarray


def _rank_from_blocks(fm_blocks, r, c):
    """occ(c, r): count of char c in rows [0, r). r, c: (N,) int32.

    Gathers the whole 9-word (36 B) block as ONE row gather: gathers on
    this chip cost ~10 ns per DESCRIPTOR nearly independent of row width
    up to ~256 B, so one 9-word row beats five 1-word elements ~5x on
    the ladder's hottest loop."""
    blk = r // BLOCK
    within = r - blk * BLOCK
    fb9 = fm_blocks.reshape(-1, 9)
    got = fb9[blk]                 # (N, 9)
    base = got[:, 0]
    for k in range(1, 5):          # elementwise select beats a 2nd gather
        base = jnp.where(c == k, got[:, k], base)
    words = got[:, 5:9]
    pattern = c.astype(U32) * U32(0x11111111)
    x = words ^ pattern[:, None]
    y = ~(x | (x >> 1) | (x >> 2) | (x >> 3)) & U32(0x11111111)
    nib_start = jnp.arange(4, dtype=jnp.int32)[None, :] * 8
    take = jnp.clip(within[:, None] - nib_start, 0, 8)
    mask = jnp.where(take >= 8, U32(0x11111111),
                     (U32(1) << (take.astype(U32) * 4)) - U32(1))
    y = y & mask
    y = y + (y >> 16)
    y = y + (y >> 8)
    y = y + (y >> 4)
    cnt = y & U32(0xF)
    return base + jnp.sum(cnt, axis=1, dtype=U32)


def spset_init(n):
    """Fresh per-lane SP_SET state: (intervals, counts) — see
    textwalk.ivset_init."""
    return ivset_init(n)


@functools.partial(jax.jit, static_argnames=("max_rst", "l_min_mth"))
def mem_probe(ixr, fm_blocks, rank6, hash13, codes, codes_pk, str_idx,
              pre_v, active, spset, spcount, max_rst: int, l_min_mth: int,
              col_off=None, row_idx=None):
    """One backward MEM probe per lane (bwt_MEM_search, src/cly.c:1388-1447).

    codes: (N, L) uint8 per-lane read codes (lane-aligned); codes_pk:
    textwalk 2-bit packing of codes; str_idx: (N,) index of the probe's
    last char; pre_v: (N,) 13-mer value; l_max_mth is str_idx per the
    reference. col_off/row_idx (N,), if given, map lanes onto a shared
    per-read F+R buffer via (row_idx, col_off + i).
    Returns per-lane results for up to max_rst rows plus updated SP_SET
    state:
      res_len:   (N, R) int32 total match length (<l_min invalid; -1000ish
                 on dedup abort, matching the reference)
      res_sp:    (N, R) uint32 final row of each walk
      res_sa:    (N, R) uint32 SA-sampled row (res_sa_ok False if none)
      res_sa_l:  (N, R) int32 negative offset from the sample
      res_valid: (N, R) bool
    """
    N = str_idx.shape[0]
    L = codes.shape[1]
    lanes = jnp.arange(N)
    if col_off is None:
        col_off = jnp.zeros((N,), jnp.int32)
    rows = lanes if row_idx is None else row_idx
    n_text = ixr.isa.shape[0]

    # ---- interval phase ----------------------------------------------------
    sp = hash13[pre_v].astype(U32)
    ep = hash13[pre_v + 1].astype(U32)
    match_len = jnp.full((N,), L_PRE_IDX, jnp.int32)
    str_i = str_idx - L_PRE_IDX
    l_max = str_idx
    n_sp = jnp.zeros((N,), U32)
    n_ep = jnp.zeros((N,), U32)
    fail = jnp.zeros((N,), bool)
    running = active

    def ibody(st):
        sp, ep, match_len, str_i, n_sp_o, n_ep_o, fail, running = st
        ci = jnp.clip(col_off + str_i, 0, L - 1)
        c = codes[rows, ci].astype(jnp.int32)
        offbuf = str_i < 0
        c = jnp.where(offbuf, 0, c)
        r_c = rank6[c].astype(U32)
        nsp = r_c + _rank_from_blocks(fm_blocks, sp.astype(jnp.int32), c)
        nep = r_c + _rank_from_blocks(fm_blocks, ep.astype(jnp.int32), c)
        ge_min = match_len >= l_min_mth - 1
        stop_a = ge_min & (nsp + U32(max_rst) >= nep)
        stop_b = ge_min & ~stop_a & (match_len >= l_max)
        stop_c = ~stop_a & ~stop_b & (nsp + U32(1) >= nep)
        stop = stop_a | stop_b | stop_c | offbuf
        this_fail = stop_b | offbuf | (stop & (nsp >= nep))
        upd = running & stop
        fail = jnp.where(upd, this_fail, fail)
        n_sp_o = jnp.where(upd, nsp, n_sp_o)
        n_ep_o = jnp.where(upd, nep, n_ep_o)
        cont = running & ~stop
        sp = jnp.where(cont, nsp, sp)
        ep = jnp.where(cont, nep, ep)
        match_len = jnp.where(cont, match_len + 1, match_len)
        str_i = jnp.where(running, str_i - 1, str_i)
        return sp, ep, match_len, str_i, n_sp_o, n_ep_o, fail, cont

    st = (sp, ep, match_len, str_i, n_sp, n_ep, fail, running)
    st = jax.lax.while_loop(lambda s: s[7].any(), ibody, st)
    _, _, match_len, str_i, n_sp, n_ep, fail, _ = st
    ok = active & ~fail
    n_rows = jnp.where(ok, (n_ep - n_sp).astype(jnp.int32), 0)
    n_rows = jnp.minimum(n_rows, max_rst)

    # ---- per-row walks in position space (bwt_single_search) --------------
    R = max_rst
    res_len = jnp.zeros((N, R), jnp.int32)
    res_sp = jnp.zeros((N, R), U32)
    res_sa = jnp.zeros((N, R), U32)
    res_sa_ok = jnp.zeros((N, R), bool)
    res_sa_l = jnp.zeros((N, R), jnp.int32)
    res_valid = jnp.zeros((N, R), bool)
    wmax = jnp.maximum(0, l_max - match_len)

    def row_body(k, carry):
        (res_len, res_sp, res_sa, res_sa_ok, res_sa_l, res_valid,
         iv, cnt) = carry
        row = (n_sp + k.astype(U32)).astype(I32)
        do = ok & (k < n_rows)
        p = ixr.row_pos[jnp.clip(row, 0, n_text - 1)]
        nat = lce_backward(ixr.text_pk, ixr.sep_any, codes_pk, rows,
                           col_off, str_i, p - 1, wmax, do)
        iv, cnt, dup0, abort, wlen = ivset_walk(iv, cnt, p, nat, do)
        do_walk = do & ~dup0
        # rows sa-checked: t = 0..T (cap excludes the final row, a
        # mismatch stop does not; dup abort stops at the matched row)
        T = jnp.where(abort | (wlen < wmax), wlen, wmax - 1)
        qs, found = find_bit_low(ixr.samp_bits, p - T, p,
                                 do_walk & (T >= 0))
        sa = jnp.where(found,
                       ixr.isa[jnp.clip(qs, 0, n_text - 1)], 0).astype(U32)
        sa_l = jnp.where(found, (p - qs) - T, -(T + 1))
        end_row = ixr.isa[jnp.clip(p - wlen, 0, n_text - 1)].astype(U32)
        total = jnp.where(abort, -1000, wlen) + match_len + 1
        valid = do_walk & (total >= l_min_mth)
        res_len = res_len.at[:, k].set(jnp.where(do_walk, total, 0))
        res_sp = res_sp.at[:, k].set(jnp.where(do_walk, end_row, 0))
        res_sa = res_sa.at[:, k].set(jnp.where(do_walk & found, sa, 0))
        res_sa_ok = res_sa_ok.at[:, k].set(do_walk & found)
        res_sa_l = res_sa_l.at[:, k].set(jnp.where(do_walk, sa_l, 0))
        res_valid = res_valid.at[:, k].set(valid)
        return (res_len, res_sp, res_sa, res_sa_ok, res_sa_l, res_valid,
                iv, cnt)

    carry = (res_len, res_sp, res_sa, res_sa_ok, res_sa_l, res_valid,
             spset, spcount)
    return jax.lax.fori_loop(0, R, row_body, carry)
