"""Batched Landau-Vishkin edit distance (<= 4 errors, <= 12 bp windows).

Device port of the gold lv_extd (engine/gold/mapseed.py, itself a faithful
port of src/cly.c:510-609). Every gold caller passes equal ref/query
lengths, so the entry swap is not needed; lengths vary 0..12 per lane.

The inner match-run walk (`while r[mn_j+j] == q[mn_j]: mn_j += 1`) is
vectorized per diagonal as a 14-bit agreement mask + count-trailing-zeros,
so the whole DP is a fixed 35-step unrolled loop of (N,) vector ops.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...constants import LV_ERROR

LV_BASE = LV_ERROR          # 4
SENT_REF = 254
SENT_QRY = 255
NQ = 14                     # query indices 0..13 (12 chars + sentinel slot)
OFF = LV_BASE + 1           # mn[j] lives at column OFF + j


def _ctz32(x):
    """Count trailing zeros of nonzero uint32 via popcount((x & -x) - 1)."""
    x = x.astype(jnp.uint32)
    low = x & (~x + jnp.uint32(1))
    m = low - jnp.uint32(1)
    m = m - ((m >> 1) & jnp.uint32(0x55555555))
    m = (m & jnp.uint32(0x33333333)) + ((m >> 2) & jnp.uint32(0x33333333))
    m = (m + (m >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((m * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def lv_batch(ref, qry, length):
    """ref, qry: (N, 13) uint8 (only [:length] used); length: (N,) in 0..12.

    Returns (N,) int32 edit distance, exactly the gold lv_extd result for
    lv_extd(ref, length, qry, length).
    """
    N = ref.shape[0]
    length = length.astype(jnp.int32)
    m_idx = jnp.arange(NQ, dtype=jnp.int32)[None, :]            # (1, NQ)

    # padded char rows with sentinels at [length]
    def padded(x, sent):
        x14 = jnp.pad(x.astype(jnp.int32), ((0, 0), (0, NQ - x.shape[1])),
                      constant_values=0)
        return jnp.where(m_idx == length[:, None], sent, x14)

    rp = padded(ref, SENT_REF)
    qp = padded(qry, SENT_QRY)

    # agreement bitmasks per diagonal d in -LV_BASE..LV_BASE:
    # bit m set iff q index m and r index m+d are both in-bounds and equal
    masks = {}
    for d in range(-LV_BASE, LV_BASE + 1):
        mr = m_idx + d
        valid = (m_idx <= length[:, None]) & (mr >= 0) & (mr <= length[:, None])
        if d >= 0:
            r_sh = jnp.concatenate(
                [rp[:, d:], jnp.zeros((N, d), jnp.int32)], axis=1)
        else:
            r_sh = jnp.concatenate(
                [jnp.full((N, -d), -1, jnp.int32), rp[:, :d]], axis=1)
        agree = valid & (r_sh == qp)
        masks[d] = jnp.sum(
            agree.astype(jnp.uint32) << m_idx.astype(jnp.uint32), axis=1)

    # gold: mn = [-1]*11 + [0, 0] (pad), ed = [|i|]*11 + [0, 0]
    mn = jnp.concatenate([
        jnp.full((N, 2 * OFF + 1), -1, jnp.int32),
        jnp.zeros((N, 2), jnp.int32)], axis=1)
    ed = jnp.concatenate([
        jnp.abs(jnp.arange(-OFF, OFF + 1, dtype=jnp.int32))[None, :].repeat(N, 0),
        jnp.zeros((N, 2), jnp.int32)], axis=1)
    best = length.astype(jnp.int32)
    done = jnp.zeros((N,), bool)

    for i in range(LV_ERROR + 1):
        prev_mn = jnp.full((N,), -1, jnp.int32)
        cur_mn = jnp.full((N,), i - 1, jnp.int32)
        next_mn = mn[:, OFF - i + 1]
        prev_ed = jnp.full((N,), i + 1, jnp.int32)
        cur_ed = jnp.full((N,), i, jnp.int32)
        next_ed = ed[:, OFF - i + 1]
        for j in range(-i, LV_ERROR + 1):
            take_ext = cur_mn + j < length - 1
            # branch A (cur_mn + j < ref_length - 1)
            a_mn = cur_mn + 1
            a_ed = cur_ed + 1
            a_max = cur_mn + 1 - cur_ed
            usen = a_max < next_mn + 1 - next_ed
            a_mn = jnp.where(usen, next_mn + 1, a_mn)
            a_ed = jnp.where(usen, next_ed + 1, a_ed)
            a_max = jnp.where(usen, next_mn - next_ed, a_max)
            usep = a_max < prev_mn - prev_ed
            a_mn = jnp.where(usep, prev_mn + 1, a_mn)
            a_ed = jnp.where(usep, prev_ed + 1, a_ed)
            # branch B
            b_mn = cur_mn
            b_ed = cur_ed + 1
            b_max = cur_mn - cur_ed
            usep = b_max < prev_mn - prev_ed
            b_mn = jnp.where(usep, prev_mn, b_mn)
            b_ed = jnp.where(usep, prev_ed + 1, b_ed)
            b_max = jnp.where(usep, prev_mn - prev_ed, b_max)
            usen = b_max < next_mn + 1 - next_ed
            b_mn = jnp.where(usen, next_mn + 1, b_mn)
            b_ed = jnp.where(usen, next_ed + 1, b_ed)

            new_mn = jnp.where(take_ext, a_mn, b_mn)
            new_ed = jnp.where(take_ext, a_ed, b_ed)
            new_mn = jnp.minimum(new_mn, length)
            new_mn = jnp.minimum(new_mn, length - j)
            # match run extension
            mask = masks[j] if abs(j) <= LV_BASE else jnp.zeros((N,), jnp.uint32)
            sh = jnp.clip(new_mn, 0, 31).astype(jnp.uint32)
            run = _ctz32(~(mask >> sh))
            run = jnp.where(new_mn >= 0, run, 0)
            new_mn = new_mn + run
            # sentinel checks
            hit = (new_mn == length) | (new_mn + j == length)
            new_best = jnp.where(hit, jnp.minimum(new_ed - 1, best), best)
            new_done = done | (hit & (j <= i + 1))
            best = jnp.where(done, best, new_best)
            done = new_done
            # state writes (frozen once done)
            mn = mn.at[:, OFF + j].set(jnp.where(done, mn[:, OFF + j], new_mn))
            ed = ed.at[:, OFF + j].set(jnp.where(done, ed[:, OFF + j], new_ed))
            prev_mn, cur_mn, next_mn = cur_mn, next_mn, mn[:, OFF + j + 2]
            prev_ed, cur_ed, next_ed = cur_ed, next_ed, ed[:, OFF + j + 2]
    return best
