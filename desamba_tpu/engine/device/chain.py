"""Anchor chaining (M2 insertion + resolve-tree sort) on device.

Mirrors gold/chain.py (src/cly.c:66-349) for the M2 path: anchors are
inserted in order into the first matching chain (diag within 30, gap
within 400), vectorized across read lanes with a fori over anchor slots
— the per-read sequential dependence is the loop, the per-slot scan over
chains is a masked argmax. The M3 path (>=50 anchors) and chain-slot
overflow raise per-lane flags; the host redoes those reads with the
gold chainer (resolve_tree), matching the reference's behavior exactly
since both paths are bit-parity ports.

Anchor linked lists (chain_anchor_pre) become an int32 `pre` column so
the rescore kernel can walk chains without host marshalling.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...constants import (
    M3_ANCHOR_THRESHOLD,
    MAX_DIS_MINUS,
    MAX_WAITING_LEN,
)

I32 = jnp.int32
U32 = jnp.uint32

C2 = 16   # chain slots during insertion (demo max 7; overflow -> host)


def _absu(a, b):
    """ABS_U on uint32 values carried as int32 bit patterns
    (src/cly.c ABS_U): unsigned compare + unsigned diff. An anchor
    whose extension crossed the reference start carries a wrapped-huge
    ref_offset; treating it as signed would collapse the distance."""
    au, bu = a.astype(U32), b.astype(U32)
    return jnp.where(au > bu, au - bu, bu - au).astype(I32)

# anchor input record
AF2 = 7
(A_IIR, A_ROFF, A_MLEN, A_SCORE, A_REF, A_DIR, A_USELESS) = range(AF2)

# chain record
CH = ("ref_id", "q_t_dis", "sum_score", "anchor_number", "direction",
      "with_top", "t_st", "t_ed", "q_st", "q_ed", "indel", "cur", "cid")
CH_NF = len(CH)
(H_REF, H_QTD, H_SUM, H_ANUM, H_DIR, H_TOP, H_TST, H_TED, H_QST, H_QED,
 H_INDEL, H_CUR, H_CID) = range(CH_NF)


@functools.partial(jax.jit, static_argnames=())
def chain_kernel(anc, n_anc):
    """anc: (B, A2, AF2) int32 in gold insertion order; n_anc: (B,).

    Returns (chains, n_out, pre, overflow):
      chains (B, C2, CH_NF) sorted + truncated like resolve_tree;
      n_out  (B,) chains kept;
      pre    (B, A2) anchor pre-link indices (-1 none);
      overflow (B,) bool — M3-threshold or chain-slot overflow, redo on
      host.
    """
    B, A2, _ = anc.shape
    lanes = jnp.arange(B, dtype=I32)
    slots = jnp.arange(C2, dtype=I32)[None, :]

    ch0 = jnp.zeros((B, C2, CH_NF), I32)
    pre0 = jnp.full((B, A2), -1, I32)
    nch0 = jnp.zeros((B,), I32)
    ovf0 = n_anc >= M3_ANCHOR_THRESHOLD

    def body(a, carry):
        ch, nch, pre, ovf = carry
        row = anc[:, a]
        valid = a < n_anc
        iir, roff, mlen = row[:, A_IIR], row[:, A_ROFF], row[:, A_MLEN]
        score = row[:, A_SCORE]
        dis = roff - iir
        read_r = iir + mlen
        ref_r = roff + mlen
        not_useless = row[:, A_USELESS] == 0

        m = ((slots < nch[:, None])
             & (ch[:, :, H_DIR] == row[:, A_DIR, None])
             & (ch[:, :, H_REF] == row[:, A_REF, None])
             & (jnp.abs(dis[:, None] - ch[:, :, H_QTD]) < MAX_DIS_MINUS)
             & (_absu(ch[:, :, H_TED], roff[:, None])
                < MAX_WAITING_LEN))
        has = m.any(axis=1)
        first = jnp.argmax(m, axis=1).astype(I32)  # first True
        do_new = valid & ~has & (nch < C2)
        ovf = ovf | (valid & ~has & (nch >= C2))
        tgt = jnp.clip(jnp.where(has, first, nch), 0, C2 - 1)
        old = ch[lanes, tgt]

        dis_minus = jnp.abs(dis - old[:, H_QTD])
        skip_upd = has & (old[:, H_QED] >= read_r)
        ins = valid & has & ~skip_upd
        topset = valid & has  # with_top updated even on skip (cly.c:83)

        new_rec = jnp.stack([
            row[:, A_REF], dis, score, jnp.ones_like(dis), row[:, A_DIR],
            not_useless.astype(I32), roff, ref_r, iir, read_r,
            jnp.zeros_like(dis), jnp.full((B,), a, I32), nch], axis=1)
        upd_rec = jnp.stack([
            old[:, H_REF], dis, old[:, H_SUM] + score,
            old[:, H_ANUM] + 1, old[:, H_DIR],
            old[:, H_TOP] | not_useless.astype(I32),
            old[:, H_TST],
            # uint32 MAX (wrapped t_ed is huge, not negative)
            jnp.maximum(ref_r.astype(U32),
                        old[:, H_TED].astype(U32)).astype(I32),
            old[:, H_QST], read_r, old[:, H_INDEL] + dis_minus,
            jnp.full((B,), a, I32), old[:, H_CID]], axis=1)
        skip_rec = old.at[:, H_TOP].set(old[:, H_TOP]
                                        | not_useless.astype(I32))
        rec = jnp.where(do_new[:, None], new_rec,
                        jnp.where(ins[:, None], upd_rec,
                                  jnp.where((topset & skip_upd)[:, None],
                                            skip_rec, old)))
        write = do_new | topset
        ch = ch.at[lanes, tgt].set(
            jnp.where(write[:, None], rec, old))
        pre = pre.at[:, a].set(jnp.where(ins, old[:, H_CUR], pre[:, a]))
        nch = jnp.where(do_new, nch + 1, nch)
        return ch, nch, pre, ovf

    ch, nch, pre, ovf = jax.lax.fori_loop(
        0, A2, body, (ch0, nch0, pre0, ovf0))

    # ---- resolve_tree sort + truncation -----------------------------------
    n = jnp.minimum(nch, C2)
    on = slots < n[:, None]
    score2 = (ch[:, :, H_SUM] + ((ch[:, :, H_QED] - ch[:, :, H_QST]) << 1)
              - (ch[:, :, H_INDEL] << 2))
    big = jnp.int32(1 << 30)
    k2 = jnp.where(on, -score2, big)
    ord1 = jnp.argsort(k2, axis=1, stable=True).astype(I32)
    top1 = jnp.take_along_axis(ch[:, :, H_TOP], ord1, axis=1)
    on1 = jnp.take_along_axis(on.astype(I32), ord1, axis=1)
    k1 = jnp.where(on1 > 0, 1 - top1, 2)
    ord2 = jnp.argsort(k1, axis=1, stable=True).astype(I32)
    order = jnp.take_along_axis(ord1, ord2, axis=1)
    chs = jnp.take_along_axis(ch, order[:, :, None], axis=1)

    base = jnp.minimum(5, n)
    topm = chs[:, :, H_TOP] > 0

    def trunc(s, rst):
        grow = (slots[0, s] == rst) & (s < n) & topm[:, s]
        return jnp.where(grow, rst + 1, rst)

    rst = jax.lax.fori_loop(5, C2, trunc, base)
    n_out = jnp.minimum(rst, n)
    return chs, n_out, pre, ovf


# packed ladder anchor row columns (ladder.pack_anchors)
(P_MLEN, P_SCORE, P_DIR, P_GOFF, P_REF, P_ROFF, P_IIR,
 P_USELESS) = 0, 1, 6, 7, 8, 9, 10, 12


@jax.jit
def chain_step(packed, gidx, n_anc):
    """Assemble per-read anchors from the flat ladder pack and chain
    them, all on device (the pack never leaves HBM).

    packed: (P, 13) ladder rows; gidx: (B, A2) int32 row ids in gold
    insertion order (-1 pad, built on host from the small base/cnt/skip
    downloads); n_anc: (B,).

    Returns (chains, n_out, pre, ovf, anc3) — anc3 (B, A2, 3) keeps
    [index_in_read, ref_offset, mtch_len] for the rescore prep."""
    P = packed.shape[0]
    ext = jnp.concatenate([packed, jnp.zeros((1, packed.shape[1]), I32)], 0)
    gi = jnp.where(gidx >= 0, gidx, P)
    rows = ext[gi]                                   # (B, A2, 13)
    anc = jnp.stack([rows[:, :, P_IIR], rows[:, :, P_ROFF],
                     rows[:, :, P_MLEN], rows[:, :, P_SCORE],
                     rows[:, :, P_REF], rows[:, :, P_DIR],
                     rows[:, :, P_USELESS]], axis=2)
    chains, n_out, pre, ovf = chain_kernel(anc, n_anc)
    anc3 = anc[:, :, :3]
    return chains, n_out, pre, ovf, anc3


RC_CAP = 8    # rescore chain slots (engine/device/rescore.C_CAP)


@jax.jit
def prep_rescore(sel, chs, ns, pres, ancs):
    """Select each read's current chain set (fast=0 / slow0=1 / slow1=2)
    and emit the rescore kernel's input arrays, staying on device.

    sel: (B,) int32; chs: (3, B, C2, CH_NF); ns: (3, B);
    pres: (3, B, A2); ancs: (3, B, A2, 3).

    Returns (chains_rc, n_chains, anchors4, schash, n_hash, over) with
    over = reads whose chain count exceeds the rescore cap (host
    fallback; their n_chains is zeroed so the lanes stay dead)."""
    B = sel.shape[0]
    b = jnp.arange(B, dtype=I32)
    ch = chs[sel, b]
    n = ns[sel, b]
    pre = pres[sel, b]
    anc = ancs[sel, b]
    over = n > RC_CAP
    n = jnp.where(over, 0, jnp.minimum(n, RC_CAP))
    slots = jnp.arange(RC_CAP, dtype=I32)[None, :]
    on = (slots < n[:, None]).astype(I32)[:, :, None]
    c8 = ch[:, :RC_CAP]
    chains_rc = jnp.stack(
        [c8[:, :, H_REF], c8[:, :, H_DIR], c8[:, :, H_SUM],
         c8[:, :, H_ANUM], c8[:, :, H_TST], c8[:, :, H_TED],
         c8[:, :, H_QST], c8[:, :, H_QED], c8[:, :, H_INDEL],
         c8[:, :, H_CUR]], axis=2) * on
    key_st = (c8[:, :, H_TST] - c8[:, :, H_QST]) & 0xFF
    key_ed = (c8[:, :, H_TED] - c8[:, :, H_QED]) & 0xFF
    ci = jnp.broadcast_to(slots, (B, RC_CAP))
    ent_st = jnp.stack([key_st, ci, jnp.ones_like(ci)], axis=2)
    ent_ed = jnp.stack([key_ed, ci, jnp.zeros_like(ci)], axis=2)
    schash = jnp.stack([ent_st, ent_ed], axis=2).reshape(B, 2 * RC_CAP, 3)
    n_hash = 2 * n
    anchors4 = jnp.concatenate([anc, pre[:, :, None]], axis=2)
    return chains_rc, n, anchors4, schash, n_hash, over
