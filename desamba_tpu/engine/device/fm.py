"""Batched FM rank + backward MEM search on device.

The reference's hottest scalar loop (occ: src/bwt.c:43-65, called twice per
char per seed, SURVEY §3.4) becomes a lane-parallel `lax.while_loop`: each
step performs two checkpointed-rank gathers for every active (read, probe)
lane. The per-island SP_SET row dedup (src/cly.c:1281-1298) lives on device
as a (lanes, 500) buffer carried through the loops.

Parity contract (tests/test_device_engine.py): for identical probe inputs and
SP_SET state, `mem_probe` returns exactly the MemRst set of the gold
engine's bwt_mem_search (match lengths, final rows, SA samples, dedup
aborts).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...constants import L_PRE_IDX, SP_SET_CAP
from .arrays import BLOCK

U32 = jnp.uint32


def _rank_from_blocks(fm_blocks, r, c):
    """occ(c, r): count of char c in rows [0, r). r, c: (N,) int32.

    Gathers only the 5 needed words per block (base count for c + the 4
    char words) instead of the full 9-word row."""
    blk = r // BLOCK
    within = r - blk * BLOCK
    fb = fm_blocks.reshape(-1)
    off = blk * 9
    idx = jnp.stack([off + c, off + 5, off + 6, off + 7, off + 8], axis=1)
    got = fb[idx]  # (N, 5)
    base = got[:, 0]
    words = got[:, 1:5]
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


SP_HASH_CAP = 1024          # slots; holds <= SP_SET_CAP live entries
SP_EMPTY = 0xFFFFFFFF       # rows are < 2^31, sentinel is safe


def spset_init(n):
    """Fresh per-lane SP_SET state: (table, count)."""
    return (jnp.full((n, SP_HASH_CAP), SP_EMPTY, U32),
            jnp.zeros((n,), jnp.int32))


def _spset_insert(sets, counts, vals, do):
    """SP_SET insert with 500-cap wrap reset (src/cly.c:1286-1298).

    Exact set semantics as the reference's 500-entry linear array, but as
    an open-addressed hash table: the linear scan cost 500 lanes of HBM
    traffic per insert, dominating the ladder kernels. counts tracks
    inserted entries, so the wrap-reset fires at the same insert as the
    reference.

    sets: (N, SP_HASH_CAP) uint32; counts: (N,); vals: (N,) uint32;
    do: (N,) bool. Returns (sets, counts, ok) — ok False on duplicate.
    """
    N = counts.shape[0]
    lanes = jnp.arange(N)
    reset = do & (counts == SP_SET_CAP)
    sets = jnp.where(reset[:, None], U32(SP_EMPTY), sets)
    counts = jnp.where(reset, 0, counts)
    h0 = (vals * U32(2654435761)) & U32(SP_HASH_CAP - 1)

    def cond(st):
        return st[3].any()

    def body(st):
        h, dup, slot, run = st
        cur = sets[lanes, h.astype(jnp.int32)]
        is_empty = cur == U32(SP_EMPTY)
        is_dup = cur == vals
        dup = dup | (run & is_dup)
        slot = jnp.where(run & is_empty, h, slot)
        run2 = run & ~(is_empty | is_dup)
        h2 = jnp.where(run2, (h + U32(1)) & U32(SP_HASH_CAP - 1), h)
        return h2, dup, slot, run2

    st = (h0, jnp.zeros((N,), bool), jnp.zeros((N,), U32), do)
    _, dup, slot, _ = jax.lax.while_loop(cond, body, st)
    ins = do & ~dup
    si = slot.astype(jnp.int32)
    sets = sets.at[lanes, si].set(jnp.where(ins, vals, sets[lanes, si]))
    counts = jnp.where(ins, counts + 1, counts)
    return sets, counts, ~dup


@functools.partial(jax.jit, static_argnames=("max_rst", "l_min_mth"))
def mem_probe(fm_blocks, lfc, rank6, hash13, codes, str_idx, pre_v,
              active, spset, spcount, max_rst: int, l_min_mth: int,
              col_off=None, row_idx=None):
    """One backward MEM probe per lane (bwt_MEM_search, src/cly.c:1388-1447).

    codes: (N, L) uint8 per-lane read codes (lane-aligned); str_idx: (N,)
    index of the probe's last char; pre_v: (N,) 13-mer value; l_max_mth is
    str_idx per the reference. col_off/row_idx (N,), if given, map lanes
    onto a shared per-read F+R buffer via (row_idx, col_off + i).
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

    # ---- per-row single walks (bwt_single_search) ---------------------------
    R = max_rst
    res_len = jnp.zeros((N, R), jnp.int32)
    res_sp = jnp.zeros((N, R), U32)
    res_sa = jnp.zeros((N, R), U32)
    res_sa_ok = jnp.zeros((N, R), bool)
    res_sa_l = jnp.zeros((N, R), jnp.int32)
    res_valid = jnp.zeros((N, R), bool)

    def row_body(k, carry):
        (res_len, res_sp, res_sa, res_sa_ok, res_sa_l, res_valid,
         spset, spcount) = carry
        row = n_sp + k.astype(U32)
        do = ok & (k < n_rows)
        spset, spcount, ins_ok = _spset_insert(spset, spcount, row, do)
        do_walk = do & ins_ok
        # walk state
        wsp = row
        wlen = jnp.zeros((N,), jnp.int32)
        sa = jnp.zeros((N,), U32)
        sa_ok = jnp.zeros((N,), bool)
        sa_l = jnp.zeros((N,), jnp.int32)
        wstr = str_i
        wmax = jnp.maximum(0, l_max - match_len)
        dup_abort = jnp.zeros((N,), bool)
        wrun = do_walk

        def wbody(st):
            wsp, wlen, sa, sa_ok, sa_l, wstr, dup_abort, wrun, spset, spcount = st
            cap = wlen >= wmax
            sampled = (wsp & U32(7)) == 0
            live = wrun & ~cap
            sa = jnp.where(live & sampled, wsp, sa)
            sa_ok = jnp.where(live & sampled, True, sa_ok)
            sa_l = jnp.where(live, jnp.where(sampled, 0, sa_l - 1), sa_l)
            lfc_v = lfc[wsp.astype(jnp.int32)]
            nsp = lfc_v >> 3
            c = (lfc_v & U32(7)).astype(jnp.int32)
            ci = jnp.clip(col_off + wstr, 0, L - 1)
            rc = jnp.where(wstr >= 0, codes[rows, ci].astype(jnp.int32), -1)
            match = live & (c == rc)
            spset, spcount, ins_ok2 = _spset_insert(spset, spcount, nsp, match)
            aborted = match & ~ins_ok2
            dup_abort = dup_abort | aborted
            step = match & ins_ok2
            wsp = jnp.where(step, nsp, wsp)
            wlen = jnp.where(step, wlen + 1, wlen)
            wstr = jnp.where(step, wstr - 1, wstr)
            wrun = step
            return (wsp, wlen, sa, sa_ok, sa_l, wstr, dup_abort, wrun,
                    spset, spcount)

        st = (wsp, wlen, sa, sa_ok, sa_l, wstr, dup_abort, wrun, spset, spcount)
        st = jax.lax.while_loop(lambda s: s[7].any(), wbody, st)
        wsp, wlen, sa, sa_ok, sa_l, wstr, dup_abort, _, spset, spcount = st

        total = jnp.where(dup_abort, -1000, wlen) + match_len + 1
        valid = do_walk & (total >= l_min_mth)
        res_len = res_len.at[:, k].set(total)
        res_sp = res_sp.at[:, k].set(wsp)
        res_sa = res_sa.at[:, k].set(sa)
        res_sa_ok = res_sa_ok.at[:, k].set(sa_ok)
        res_sa_l = res_sa_l.at[:, k].set(sa_l)
        res_valid = res_valid.at[:, k].set(valid)
        return (res_len, res_sp, res_sa, res_sa_ok, res_sa_l, res_valid,
                spset, spcount)

    carry = (res_len, res_sp, res_sa, res_sa_ok, res_sa_l, res_valid,
             spset, spcount)
    return jax.lax.fori_loop(0, R, row_body, carry)
