"""Position-space walk primitives over the unitig text.

The reference extends FM seeds by LF-walking one row per matched char
(src/cly.c:1344-1383): each step is a dependent row gather. Because this
index keeps the FULL suffix array (row_pos) and its inverse (isa), a
walk of w matching chars collapses to a packed-2-bit LCE between the
read and the text — ~w/16 word gathers — plus one isa gather for the
final row. The reference's SP_SET row dedup (500-entry set with
wrap-reset, src/cly.c:1281-1298) becomes an exact *position-interval*
set: a walk visits a contiguous descending position range, so the set
of visited rows is a set of disjoint intervals in position space, and
dedup checks are lane-local vector compares with no gathers at all.

Bit-exactness contract: every function here reproduces the reference's
(and the gold engine's) walk semantics — stop order (cap before match),
sa-sample bookkeeping, dedup-abort position, and the 500-cap mid-walk
reset — verified by tests/test_device_engine.py::test_mem_probe_parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...constants import SP_SET_CAP

I32 = jnp.int32
U32 = jnp.uint32


def _popc(v):
    v = v - ((v >> 1) & U32(0x55555555))
    v = (v & U32(0x33333333)) + ((v >> 2) & U32(0x33333333))
    v = (v + (v >> 4)) & U32(0x0F0F0F0F)
    return ((v * U32(0x01010101)) >> 24).astype(I32)


def pack2(ch):
    """(N, L) uint8 chars -> (N, ceil(L/16)) uint32, char j of a word at
    bits 2j..2j+1 (little-endian char order; rescore._pack2 layout)."""
    N, L = ch.shape
    pad = (-L) % 16
    c = jnp.pad(ch, ((0, 0), (0, pad))).astype(U32)
    c = c.reshape(N, -1, 16)
    sh = (jnp.arange(16, dtype=U32) * 2)[None, None, :]
    return jnp.sum(c << sh, axis=2).astype(U32)


def _word16_1d(pk, base):
    """16-char packed value from a (1, W) packed text row; base (N,) may
    be negative (chars below 0 are zeros)."""
    b = jnp.maximum(base, 0)
    w0 = b >> 4
    sh = ((b & 15) << 1).astype(U32)
    kw = pk.shape[1]
    g0 = pk[0, jnp.clip(w0, 0, kw - 1)]
    g1 = pk[0, jnp.clip(w0 + 1, 0, kw - 1)]
    v = jnp.where(sh == 0, g0, (g0 >> sh) | (g1 << (U32(32) - sh)))
    neg = jnp.minimum(jnp.maximum(-base, 0), 15).astype(U32)
    return jnp.where(base < 0, v << (neg << 1), v)


def _word16_rows(pk, rows, base):
    """16-char packed value from per-lane packed rows (same as
    rescore._word16)."""
    b = jnp.maximum(base, 0)
    w0 = b >> 4
    sh = ((b & 15) << 1).astype(U32)
    kw = pk.shape[1]
    g0 = pk[rows, jnp.clip(w0, 0, kw - 1)]
    g1 = pk[rows, jnp.clip(w0 + 1, 0, kw - 1)]
    v = jnp.where(sh == 0, g0, (g0 >> sh) | (g1 << (U32(32) - sh)))
    neg = jnp.minimum(jnp.maximum(-base, 0), 15).astype(U32)
    return jnp.where(base < 0, v << (neg << 1), v)


def _bits16(bits, lo):
    """16 bitmap bits for positions [lo, lo+15], LSB = position lo.
    lo may be negative (missing low bits read as 0)."""
    b = jnp.maximum(lo, 0)
    w0 = b >> 5
    sh = (b & 31).astype(U32)
    W = bits.shape[0]
    g0 = bits[jnp.clip(w0, 0, W - 1)]
    g1 = bits[jnp.clip(w0 + 1, 0, W - 1)]
    v = jnp.where(sh == 0, g0, (g0 >> sh) | (g1 << (U32(32) - sh)))
    neg = jnp.minimum(jnp.maximum(-lo, 0), 16).astype(U32)
    v = jnp.where(lo < 0, v << neg, v)
    return v & U32(0xFFFF)


def _spread16(x):
    """Move bit j of a 16-bit value to bit 2j."""
    x = (x | (x << 8)) & U32(0x00FF00FF)
    x = (x | (x << 4)) & U32(0x0F0F0F0F)
    x = (x | (x << 2)) & U32(0x33333333)
    x = (x | (x << 1)) & U32(0x55555555)
    return x


def lce_backward(text_pk, sep_any, codes_pk, rows, col_off, q_hi, t_hi,
                 cap, active):
    """Backward match run: codes[rows, col_off + q_hi - k] vs
    text[t_hi - k] for k = 0.., stopping at the first mismatch, any
    text separator char, q_hi - k < 0, t_hi - k < 0, or cap.
    Returns (N,) int32 run lengths (0 where not active)."""
    N = q_hi.shape[0]
    n = jnp.zeros((N,), I32)
    run = active & (cap > 0)

    def body(st):
        n, run = st
        qi = col_off + q_hi - n
        ti = t_hi - n
        qw = _word16_rows(codes_pk, rows, qi - 15)
        tw = _word16_1d(text_pk, ti - 15)
        y = qw ^ tw
        y = (y | (y >> 1)) & U32(0x55555555)
        y = y | _spread16(_bits16(sep_any, ti - 15))
        s = y | (y >> 2)
        s = s | (s >> 4)
        s = s | (s >> 8)
        s = s | (s >> 16)
        m = 16 - _popc(s & U32(0x55555555))
        q_rem = jnp.maximum(q_hi - n + 1, 0)
        t_rem = jnp.maximum(ti + 1, 0)
        lim = jnp.maximum(jnp.minimum(jnp.minimum(q_rem, t_rem), cap - n), 0)
        adv = jnp.minimum(m, jnp.minimum(lim, 16))
        n2 = jnp.where(run, n + adv, n)
        run2 = run & (adv == 16) & (n2 < cap)
        return n2, run2

    n, _ = jax.lax.while_loop(lambda s: s[1].any(), body, (n, run))
    return n


def collect_backward(text_pk, sep_any, t_hi, width: int):
    """Chars text[t_hi], text[t_hi - 1], ... as (N, width) uint8 with
    separators replaced by 4 (consumers only need "not a base":
    '#'/'$' mismatch every read char identically) and positions < 0
    as 4 as well."""
    assert width <= 16
    tw = _word16_1d(text_pk, t_hi - 15)
    sep = _bits16(sep_any, t_hi - 15)
    k = jnp.arange(width, dtype=I32)[None, :]
    sh = ((15 - k) * 2).astype(U32)
    ch = ((tw[:, None] >> sh) & U32(3)).astype(jnp.uint8)
    bad = (((sep[:, None] >> (15 - k).astype(U32)) & U32(1)) == 1) | (
        (t_hi[:, None] - k) < 0)
    return jnp.where(bad, jnp.uint8(4), ch)


def find_bit_low(bits, lo, hi, active):
    """Smallest position q in [lo, hi] with bits[q] set.
    Returns (q, found); q undefined where not found. lo may be < 0."""
    N = lo.shape[0]
    W = bits.shape[0]
    w = jnp.maximum(lo, 0) >> 5
    w_hi = jnp.maximum(hi, 0) >> 5
    q = jnp.zeros((N,), I32)
    found = jnp.zeros((N,), bool)
    run = active & (hi >= lo) & (hi >= 0)

    def body(st):
        w, q, found, run = st
        word = bits[jnp.clip(w, 0, W - 1)]
        base = w << 5
        b_lo = jnp.clip(lo - base, 0, 32)
        b_hi = jnp.clip(hi - base, -1, 31)
        m_lo = jnp.where(b_lo >= 32, U32(0),
                         U32(0xFFFFFFFF) << b_lo.astype(U32))
        m_hi = jnp.where(b_hi < 0, U32(0),
                         jnp.where(b_hi >= 31, U32(0xFFFFFFFF),
                                   (U32(1) << (b_hi + 1).astype(U32))
                                   - U32(1)))
        masked = word & m_lo & m_hi
        hit = run & (masked != 0)
        low = _popc((masked & (~masked + U32(1))) - U32(1))
        q = jnp.where(hit, base + low, q)
        found = found | hit
        run2 = run & ~hit & (w < w_hi)
        w2 = jnp.where(run2, w + 1, w)
        return w2, q, found, run2

    _, q, found, _ = jax.lax.while_loop(lambda s: s[3].any(), body,
                                        (w, q, found, run))
    return q, found


def find_bit_high(bits, lo, hi, active):
    """Largest position q in [lo, hi] with bits[q] set.
    Returns (q, found)."""
    N = lo.shape[0]
    W = bits.shape[0]
    w = jnp.maximum(hi, 0) >> 5
    w_lo = jnp.maximum(lo, 0) >> 5
    q = jnp.zeros((N,), I32)
    found = jnp.zeros((N,), bool)
    run = active & (hi >= lo) & (hi >= 0)

    def body(st):
        w, q, found, run = st
        word = bits[jnp.clip(w, 0, W - 1)]
        base = w << 5
        b_lo = jnp.clip(lo - base, 0, 32)
        b_hi = jnp.clip(hi - base, -1, 31)
        m_lo = jnp.where(b_lo >= 32, U32(0),
                         U32(0xFFFFFFFF) << b_lo.astype(U32))
        m_hi = jnp.where(b_hi < 0, U32(0),
                         jnp.where(b_hi >= 31, U32(0xFFFFFFFF),
                                   (U32(1) << (b_hi + 1).astype(U32))
                                   - U32(1)))
        masked = word & m_lo & m_hi
        hit = run & (masked != 0)
        # high bit index via fill-down then popcount
        m = masked
        m = m | (m >> 1)
        m = m | (m >> 2)
        m = m | (m >> 4)
        m = m | (m >> 8)
        m = m | (m >> 16)
        high = _popc(m) - 1
        q = jnp.where(hit, base + high, q)
        found = found | hit
        run2 = run & ~hit & (w > w_lo)
        w2 = jnp.where(run2, w - 1, w)
        return w2, q, found, run2

    _, q, found, _ = jax.lax.while_loop(lambda s: s[3].any(), body,
                                        (w, q, found, run))
    return q, found


# ---- SP_SET as disjoint position intervals --------------------------------
# State per lane: iv (N, IV_CAP, 2) int32 [lo, hi] (empty slot = [0, -1]),
# cnt (N, 2) int32 = (intervals used, total positions). Intervals are
# disjoint (a walk never enters covered positions), so positions <=
# SP_SET_CAP bounds intervals <= SP_SET_CAP < IV_CAP: no overflow path.
IV_CAP = 512


def ivset_init(n, cap: int = IV_CAP):
    """cnt rows are [intervals used, total positions, overflowed].

    cap < IV_CAP is a HOT TIER: interval inserts past cap set the
    sticky overflow bit instead of storing (the ladder re-runs such
    lanes at full cap — see fast_ladder iv_cap). cap = IV_CAP can never
    overflow (intervals <= positions <= SP_SET_CAP < IV_CAP)."""
    iv = jnp.zeros((n, cap, 2), I32).at[:, :, 1].set(-1)
    return iv, jnp.zeros((n, 3), I32)


def _covered_point(iv, p):
    return ((iv[:, :, 0] <= p[:, None]) & (p[:, None] <= iv[:, :, 1])).any(
        axis=1)


def _covered_max_in(iv, a, b):
    """Per lane: the largest covered position in [a, b] (has=False if
    none)."""
    c = jnp.minimum(iv[:, :, 1], b[:, None])
    ok = (c >= iv[:, :, 0]) & (c >= a[:, None])
    best = jnp.max(jnp.where(ok, c, -1), axis=1)
    return best, best >= 0


def ivset_walk(iv, cnt, p, nat, do):
    """The reference's insert sequence for one row walk: insert p
    (initial row), then walk positions p-1 ... p-nat, with dup abort and
    the 500-cap reset (clear-then-insert) at exactly the reference's
    insert. Returns (iv, cnt, dup0, abort, wlen):
      dup0  — initial insert was a duplicate (no walk, no result)
      abort — walk hit a duplicate at step wlen+1 (match_len -1000)
      wlen  — successful walk steps (positions p-1..p-wlen inserted)
    """
    N = p.shape[0]
    cap = iv.shape[1]
    lanes = jnp.arange(N)
    niv, size, ovf = cnt[:, 0], cnt[:, 1], cnt[:, 2]

    reset0 = do & (size == SP_SET_CAP)
    iv = jnp.where(reset0[:, None, None],
                   jnp.stack([jnp.zeros((), I32), jnp.full((), -1, I32)]),
                   iv)
    niv = jnp.where(reset0, 0, niv)
    size = jnp.where(reset0, 0, size)

    dup0 = do & _covered_point(iv, p)
    walk = do & ~dup0
    s1 = size + 1
    j_r = SP_SET_CAP + 1 - s1        # walk insert index where reset fires
    qd, has = _covered_max_in(iv, p - nat, p - 1)
    j_dup = p - qd
    dup_real = walk & has & (j_dup < j_r) & (nat > 0)
    wlen = jnp.where(dup_real, j_dup - 1, nat)
    midreset = walk & ~dup_real & (nat >= j_r)

    # mid-walk reset: clear everything, keep only [p-nat, p-j_r]
    iv = jnp.where(midreset[:, None, None],
                   jnp.stack([jnp.zeros((), I32), jnp.full((), -1, I32)]),
                   iv)
    new_lo = jnp.where(midreset, p - nat, p - wlen)
    new_hi = jnp.where(midreset, p - j_r, p)
    slot = jnp.where(midreset, 0, jnp.minimum(niv, cap - 1))
    rec = jnp.stack([new_lo, new_hi], axis=1)
    iv = iv.at[lanes, slot].set(
        jnp.where(walk[:, None], rec, iv[lanes, slot]))
    # hot-tier overflow: an append past cap loses the interval (sticky
    # bit; the lane's further dedup answers are unreliable until re-run
    # at full cap)
    ovf = ovf | (walk & ~midreset & (niv >= cap)).astype(I32)
    niv = jnp.where(walk, jnp.where(midreset, 1, niv + 1), niv)
    size = jnp.where(walk,
                     jnp.where(midreset, nat - j_r + 1, s1 + wlen), size)
    return iv, jnp.stack([niv, size, ovf], axis=1), dup0, dup_real, wlen
