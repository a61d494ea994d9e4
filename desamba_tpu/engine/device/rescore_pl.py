"""Per-read Pallas TPU kernel for the 9-mer sparse-DP rescore
(src/cly.c:2335-2849 analogue; bit-compatible with the lockstep XLA VM in
rescore.py, which remains the differential oracle and the M3-sub-batch
path).

Design (tools/pallas_micro3.py, tools/pallas_caps.py measurements):
  - one read per grid program; the read's control flow (chain loop,
    middle gap walk, right/left window extensions, combine restarts) runs
    as REAL nested while loops with scalar state — no lockstep, no lane
    masking waste;
  - per-read control data (chains, anchors, schash, scalars) rides in
    SMEM, where scalar reads are free;
  - the packed reference stays in HBM; each 600-bp window is ONE 1 KB
    DMA (2 rows of 128 u32 words) aligned with a dynamic lane roll;
  - the per-(read,dir) 9-mer tables are value-sorted OUTSIDE the kernel
    (batched XLA argsort); probes binary-search them with an emulated
    vector gather (row broadcast + matched-shape lane shuffle, the only
    gather Mosaic lowers);
  - candidate match runs use the VM's packed 2-bit LCE word compares,
    vectorized across candidate lanes;
  - sms nodes live as (4, 128) rows (fields x slots-as-lanes); the
    sequential sparse-DP over prior nodes is one masked 128-lane max per
    node.

uint32 semantics: coordinates are int32 BIT PATTERNS (see rescore.py
module header); every ordered compare the C does unsigned goes through
plops.ult/ule. Mosaic has no unsigned reductions, so reductions flip the
sign bit (plops.umax_reduce).
"""
from __future__ import annotations

import functools
import os

_TRACE = bool(os.environ.get("DESAMBA_PL_TRACE"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import MIN_SCORE_MEM, OVER_SEARCH_M2, S_A_KMER_L
from . import plops as po
from .rescore import (
    C_CAP,
    C_ANUM,
    C_CUR,
    C_DIR,
    C_INDEL,
    C_QED,
    C_QST,
    C_REF,
    C_SUM,
    C_TED,
    C_TST,
    CF_N,
    RescoreIn,
    S_CAP,
    W_CAP,
    _pack2,
)

I32 = jnp.int32
U32 = jnp.uint32
K9 = S_A_KMER_L
OVER = OVER_SEARCH_M2          # 50
CF_CAP = 96                    # VM stage-1 candidate cap (fallback parity)
F_CAP = 48                     # VM stage-2 survivor cap (fallback parity)
H_CAP = 4                      # hits per probe value (fallback parity)
LANES = 128
PW = 16                        # p-space rows: chars per word
MAX_STEPS = 1 << 14            # per-read step guard (VM MAX_ITERS analogue)

# fallback reason bits (identical to rescore.py)
FB_MIDW, FB_WRAP, FB_HITS, FB_FCAP, FB_SMS, FB_OVER = 1, 2, 4, 8, 16, 32

NEG_INF = -(1 << 30)   # python int: a jnp constant here would be captured
#                        by the kernel trace and rejected by pallas_call


def _u(x):
    return x  # documents "u32 bit-pattern in i32" at call sites


# ---------------------------------------------------------------------------
# XLA-side prep
# ---------------------------------------------------------------------------

def _build_sorted_rk(codes_fr, read_len):
    """Value-sorted per-(read, direction) 9-mer tables + coarse samples.

    Returns (vals, pos, coarse): vals/pos (B, 2, K) i32 — axis1 indexed
    by direction value (0=REVERSE strand at [rl:2rl], 1=FORWARD at
    [0:rl]); invalid tails sort to INT32_MAX; ties break by ascending
    position (stable sort — the gold ReadKmerIndex contract). coarse
    (B, 2, 128): vals sampled at stride ceil(K/128)."""
    B, L2 = codes_fr.shape
    K = L2 // 2
    c32 = codes_fr.astype(jnp.uint32)
    n_k_full = L2 - K9 + 1
    vals_full = jnp.zeros((B, n_k_full), jnp.uint32)
    for j in range(K9):
        vals_full = vals_full | (c32[:, j : j + n_k_full]
                                 << jnp.uint32(2 * (K9 - 1 - j)))
    rl = read_len
    n_k9 = jnp.maximum(rl - K9 + 1, 0)
    ar = jnp.arange(K, dtype=I32)[None, :]
    fwd_vals = vals_full[:, :K].astype(I32)
    rev_idx = jnp.clip(rl[:, None] + ar, 0, n_k_full - 1)
    rev_vals = jnp.take_along_axis(vals_full, rev_idx, axis=1).astype(I32)
    big = jnp.int32(np.iinfo(np.int32).max)
    valid = ar < n_k9[:, None]
    # ONE unstable single-key sort instead of a stable argsort: key =
    # (18-bit 9-mer value << pos_bits) | position encodes the stable tie
    # order in the key itself. 18 + pos_bits <= 30 keeps every valid key
    # strictly below the INT32_MAX invalid sentinel (at 31 bits a poly-T
    # 9-mer at the max position would collide with it and be dropped).
    pos_bits = max(13, int(K - 1).bit_length())
    if 18 + pos_bits <= 30:
        fwd_keys = jnp.where(valid, (fwd_vals << pos_bits) | ar, big)
        rev_keys = jnp.where(valid, (rev_vals << pos_bits) | ar, big)
        keys = jnp.sort(jnp.stack([rev_keys, fwd_keys], axis=1), axis=2)
        mask = jnp.int32((1 << pos_bits) - 1)
        pos = jnp.where(keys == big, 0, keys & mask)
        vals = jnp.where(keys == big, big, keys >> pos_bits)
    else:  # reads beyond ~16 kb: positions no longer fit the fused key
        fwd_vals = jnp.where(valid, fwd_vals, big)
        rev_vals = jnp.where(valid, rev_vals, big)
        f_ord = jnp.argsort(fwd_vals, axis=1, stable=True).astype(I32)
        r_ord = jnp.argsort(rev_vals, axis=1, stable=True).astype(I32)
        vals = jnp.stack([jnp.take_along_axis(rev_vals, r_ord, axis=1),
                          jnp.take_along_axis(fwd_vals, f_ord, axis=1)],
                         axis=1)
        pos = jnp.stack([r_ord, f_ord], axis=1)
    stride = (K + LANES - 1) // LANES
    coarse = vals[:, :, ::stride]
    coarse = jnp.pad(coarse, ((0, 0), (0, 0),
                              (0, LANES - coarse.shape[2])),
                     constant_values=np.iinfo(np.int32).max)
    return vals, pos, coarse


# ---------------------------------------------------------------------------
# kernel helpers (traced inside the per-read program)
# ---------------------------------------------------------------------------

def _emugather_dyn(read_row, n_rows, idx):
    """tab[idx] for a table of n_rows x 128 (n_rows static), idx (R, 128)
    i32 in [0, n_rows*128). read_row(r) -> (1, 128) row, r traced.
    fori_loop form (compact code; ~rows x 6 ops)."""
    r = idx >> 7
    l = idx & 127
    shape = idx.shape

    def body(rr, acc):
        sh = po.shuffle_lanes(read_row(rr), l)
        return jnp.where(r == rr, sh, acc)

    return jax.lax.fori_loop(0, n_rows, body, jnp.zeros(shape, I32))


def _emugather_static(arr, idx):
    """tab[idx] where `arr` is an in-register (R, 128) VALUE (static
    unrolled row loop — values cannot be dynamically row-sliced)."""
    R = arr.shape[0]
    r = idx >> 7
    l = idx & 127
    shape = idx.shape
    acc = jnp.zeros(shape, I32)
    for rr in range(R):
        sh = po.shuffle_lanes(arr[rr : rr + 1, :], l)
        acc = jnp.where(r == rr, sh, acc)
    return acc


def _word16_q(cpk, base, buf_len):
    """16-char packed read-buffer value starting at char `base` (per
    candidate lane, (1,128) i32). cpk: in-register (WQR, 128) i32 packed
    read words. Mirrors rescore._word16 incl. the below-buffer zero-fill
    (base <= -16 -> all zeros)."""
    b = jnp.maximum(base, 0)
    w0 = b >> 4
    sh = ((b & 15) << 1)
    kw = cpk.shape[0] * LANES
    g0 = _emugather_static(cpk, jnp.clip(w0, 0, kw - 1))
    g1 = _emugather_static(cpk, jnp.clip(w0 + 1, 0, kw - 1))
    g0u, g1u = g0.astype(U32), g1.astype(U32)
    shu = sh.astype(U32)
    v = jnp.where(sh == 0, g0u, (g0u >> shu) | (g1u << (U32(32) - shu)))
    neg = jnp.clip(-base, 0, 16)
    sh2 = (jnp.minimum(neg, 15) << 1).astype(U32)
    shifted = jnp.where(neg >= 16, U32(0), v << sh2)
    return jnp.where(base < 0, shifted, v)


def _word16_w(wj, base):
    """16-char packed window value starting at window char `base`
    ((1,128) i32 per candidate lane). wj: (1, 128) u32 aligned window
    words (j-space). Negative base zero-fills below char 0."""
    b = jnp.maximum(base, 0)
    w0 = b >> 4
    sh = ((b & 15) << 1)
    idx0 = jnp.clip(w0, 0, LANES - 1)
    g0 = po.shuffle_lanes(wj, idx0)
    g1 = po.shuffle_lanes(wj, jnp.clip(w0 + 1, 0, LANES - 1))
    g0u, g1u = g0.astype(U32), g1.astype(U32)
    shu = sh.astype(U32)
    v = jnp.where(sh == 0, g0u, (g0u >> shu) | (g1u << (U32(32) - shu)))
    neg = jnp.clip(-base, 0, 16)
    sh2 = (jnp.minimum(neg, 15) << 1).astype(U32)
    shifted = jnp.where(neg >= 16, U32(0), v << sh2)
    return jnp.where(base < 0, shifted, v)


def _run_len_lanes(cpk, buf_len, wj, win_len, qstart, wstart,
                   forward: bool, cap, active):
    """Match-run lengths over candidate lanes (1, 128): read char
    qstart +- k vs window char wstart +- k, k < cap. Transcribes
    rescore._run_len2 for a single read with the window as (1,128)
    aligned words."""
    n = jnp.zeros(qstart.shape, I32)
    run0 = (active & (cap > 0)).astype(I32)  # i32 carry: Mosaic cannot
    #                                          legalize i1 vector yields

    def cond(st):
        n, run = st
        return jnp.max(run) > 0

    def body(st):
        n, run_i = st
        run = run_i == 1
        qi = qstart + (n if forward else -n)
        wi = wstart + (n if forward else -n)
        qw = _word16_q(cpk, qi if forward else qi - 15, buf_len)
        ww = _word16_w(wj, wi if forward else wi - 15)
        y = qw ^ ww
        y = (y | (y >> 1)) & U32(0x55555555)
        if forward:
            t = (y & (~y + U32(1))) - U32(1)
            m = po.popc32(t & U32(0x55555555))
        else:
            s = y | (y >> 2)
            s = s | (s >> 4)
            s = s | (s >> 8)
            s = s | (s >> 16)
            m = 16 - po.popc32(s & U32(0x55555555))
        if forward:
            q_remain = jnp.where(qi >= 0, buf_len - qi, 0)
            w_remain = jnp.where(wi >= 0, win_len - wi, 0)
        else:
            q_remain = jnp.where(qi < buf_len, jnp.int32(1 << 30), 0)
            w_remain = jnp.where(wi < win_len, wi + 1, 0)
        lim = jnp.maximum(
            jnp.minimum(jnp.minimum(q_remain, w_remain), cap - n), 0)
        adv = jnp.minimum(m, jnp.minimum(lim, 16))
        n2 = jnp.where(run, n + adv, n)
        run2 = run & (adv == 16) & (n2 < cap)
        return n2, run2.astype(I32)

    n, _ = jax.lax.while_loop(cond, body, (n, run0))
    return jnp.minimum(n, jnp.maximum(cap, 0))


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _make_kernel(n_bases: int, NR: int, KR: int, WQR: int, RR: int,
                 n_hash_cap: int, A2: int):
    """Bind the static geometry and return the kernel function."""
    K = KR * LANES
    stride = (K + LANES - 1) // LANES  # coarse stride

    def kernel(scal, chs_in, anc, sch, codes_pk, rkv, rkp, rkc,
               refoff, reflen, refrows, cho, flg,
               sms, dmabuf, chw, hashv, sem):
        n_chains = scal[0, 0, 0]
        n_hash = scal[0, 0, 1]
        l_read = scal[0, 0, 2]
        buf_len = scal[0, 0, 3]
        last_char = scal[0, 0, 4]
        flg[0, 0, 3] = jnp.int32(0)
        flg[0, 0, 4] = jnp.int32(0)
        flg[0, 0, 5] = jnp.int32(0)

        lane_i = po.lane_iota((1, LANES))

        # working chains copy in SMEM (mutated by combine/absorb)
        def cp_chain(c, _):
            def cp_f(f, __):
                chw[c * 16 + f] = chs_in[0, 0, c * 16 + f]
                return 0
            jax.lax.fori_loop(0, CF_N, cp_f, 0)
            return 0
        jax.lax.fori_loop(0, C_CAP, cp_chain, 0)

        def chf(c, f):
            return chw[c * 16 + f]

        def set_chf(c, f, v):
            chw[c * 16 + f] = v

        def anc_f(a, f):
            return anc[0, 0, jnp.clip(a, 0, A2 - 1) * 4 + f]

        # ---- per-chain combine-hash entry vectors --------------------------
        def build_hashv():
            def body(e, _):
                key = sch[0, 0, e * 3 + 0]
                eci = jnp.clip(sch[0, 0, e * 3 + 1], 0, C_CAP - 1)
                soe = sch[0, 0, e * 3 + 2]
                vals = (key, sch[0, 0, e * 3 + 1], soe, chf(eci, C_QST),
                        chf(eci, C_TST), chf(eci, C_QED), chf(eci, C_TED),
                        chf(eci, C_REF), chf(eci, C_DIR), chf(eci, C_SUM))
                for r, v in enumerate(vals):
                    hashv[r : r + 1, :] = po.set_lane(
                        hashv[r : r + 1, :], e, v)
                return 0
            jax.lax.fori_loop(0, n_hash_cap, body, 0)

        # ---- window fetch ---------------------------------------------------
        def fetch_window(goff, msr, bug_zero):
            """DMA + align. Returns (wj (1,128) u32 j-space words,
            base_j: global char of window char 0 is goff clamp — callers
            only use j-space). bug_zero >= 0: zero chars at j >= bug_zero
            (pass a huge value to disable)."""
            off0 = jnp.maximum(goff, 0)
            gw0 = off0 >> 4
            cb = off0 & 15
            # refrows carries one trailing zero row, so NR - 2 IS the
            # last data row: in-range windows are never mis-aligned and
            # the 2-row DMA below never reads past the buffer.
            r0 = jnp.clip(gw0 >> 7, 0, NR - 2)
            o = gw0 & 127
            cp = pltpu.make_async_copy(refrows.at[pl.ds(r0, 2), :],
                                       dmabuf, sem)
            cp.start()
            cp.wait()
            aw = po.roll_flat(dmabuf[:].astype(I32), o).astype(U32)
            # p-space char fixes, word-aligned: replicate last char past
            # n_bases; zero at j >= bug_zero (j = p - cb)
            base_g = (r0 * LANES + o) * 16
            wpos = lane_i * 16                       # p of word start
            g0 = base_g + wpos
            nv = jnp.clip(n_bases - g0, 0, 16)
            keep = jnp.where(nv >= 16, U32(0xFFFFFFFF),
                             (U32(1) << (nv << 1).astype(U32)) - U32(1))
            rep = (last_char.astype(U32) * U32(0x55555555))
            aw = (aw & keep) | (rep & ~keep)
            bz = bug_zero + cb                       # p threshold
            nz = jnp.clip(bz - wpos, 0, 16)
            keep2 = jnp.where(nz >= 16, U32(0xFFFFFFFF),
                              (U32(1) << (nz << 1).astype(U32)) - U32(1))
            aw = aw & keep2
            # j-space funnel by cb
            nxt = pltpu.roll(aw, LANES - 1, 1)       # aw shifted left 1
            sh = (cb << 1).astype(U32)
            wj = jnp.where(cb == 0, aw,
                           (aw >> sh) | (nxt << (U32(32) - sh)))
            return wj

        # ---- sdp_match ------------------------------------------------------
        def sdp_match(forward: bool, wj, t_len, t0j, q_bg, q_ed, t_st,
                      dslot, base_slot, is_mid: bool, fb):
            """Append match nodes to sms (from slot base_slot). Returns
            (n_new, fb). forward/is_mid are python bools (specialized).
            q_bg/q_ed are u32 bit patterns in i32."""
            t_kmer_num = t_len - K9 + 1
            qbase = jnp.where(dslot == 1, 0, l_read)
            PR = 4  # compact probe rows: probes sit on a stride-4 lattice

            # window 9-mer values per window position j; full j-layout
            # (16, 128): slot (c, w) = j = w*16 + c
            wjb = jnp.broadcast_to(wj, (PW, LANES)).astype(U32)
            wj_next = jnp.broadcast_to(pltpu.roll(wj, LANES - 1, 1),
                                       (PW, LANES)).astype(U32)
            c_in_w = po.sub_iota((PW, LANES))
            wk = jnp.zeros((PW, LANES), I32)
            for k in range(K9):
                cc = c_in_w + k
                word = jnp.where(cc < 16, wjb, wj_next)
                ccm = jnp.where(cc < 16, cc, cc - 16)
                ch = ((word >> (ccm << 1).astype(U32)) & U32(3)).astype(I32)
                wk = (wk << 2) | ch
            # compact to the probe lattice (4, 128): row r = full row
            # phi + 4r (phi = probe j phase; 0 for forward since t0j=0,
            # (t0j + t_kmer_num - 1) & 3 for the left side)
            if forward:
                phi = jnp.int32(0)
            else:
                phi = (t0j + t_kmer_num - 1) & 3
            rows = []
            for r in range(PR):
                row = wk[0 + 4 * r : 1 + 4 * r, :]
                for p in range(1, 4):
                    row = jnp.where(phi == p, wk[p + 4 * r : p + 4 * r + 1],
                                    row)
                rows.append(row)
            wk4 = jnp.concatenate(rows, axis=0)          # (4, 128)
            jpos = (po.lane_iota((PR, LANES)) * 16 + phi
                    + po.sub_iota((PR, LANES)) * 4)
            if forward:
                ivals = jpos - t0j
            else:
                ivals = (t_kmer_num - 1) - (jpos - t0j)
            p_on = ((ivals >= 4) & (ivals < t_kmer_num) & (ivals % 4 == 0)
                    & (t_kmer_num > 4))
            pv = jnp.where(p_on, wk4, jnp.int32(np.iinfo(np.int32).max))

            # --- binary search in the sorted rk table -----------------------
            # one dynamic-slice load hoists each table into registers;
            # every search pass is then a static unrolled shuffle-gather
            rkn = jnp.where(l_read >= K9, l_read - K9 + 1, 0)
            rbase = dslot * KR
            rkv_v = rkv[0, pl.ds(rbase, KR), :]          # (KR, 128) i32
            rkp_v = rkp[0, pl.ds(rbase, KR), :]

            crow = jnp.broadcast_to(rkc[0, dslot], (PR, LANES)).astype(I32)
            # coarse: count samples < pv via binary search over the
            # SORTED 128-sample row (7 matched-shape shuffles)
            clo = jnp.zeros((PR, LANES), I32)
            chi = jnp.full((PR, LANES), LANES, I32)
            for _ in range(8):
                ccont = clo < chi
                cmid = (clo + chi) >> 1
                cval = po.shuffle_lanes(crow, jnp.clip(cmid, 0, LANES - 1))
                cgo = cval < pv
                clo = jnp.where(ccont & cgo, cmid + 1, clo)
                chi = jnp.where(ccont & ~cgo, cmid, chi)
            cnt_c = clo
            lo = jnp.maximum((cnt_c - 1) * stride + 1, 0)
            hi = jnp.minimum(cnt_c * stride, rkn)
            lo = jnp.minimum(lo, hi)
            steps = max(1, int(stride).bit_length() + 1)
            for _ in range(steps):
                cont = lo < hi
                mid = (lo + hi) >> 1
                mv = _emugather_static(rkv_v, jnp.clip(mid, 0, K - 1))
                go = mv < pv
                lo = jnp.where(cont & go, mid + 1, lo)
                hi = jnp.where(cont & ~go, mid, hi)
            # multiplicity + positions
            cnt = jnp.zeros((PR, LANES), I32)
            run_eq = jnp.ones((PR, LANES), bool)
            qpos_h = []
            for h in range(H_CAP + 1):
                vh = _emugather_static(rkv_v, jnp.clip(lo + h, 0, K - 1))
                run_eq = run_eq & (lo + h < rkn) & (vh == pv)
                cnt = cnt + run_eq.astype(I32)
                if h < H_CAP:
                    ph = _emugather_static(rkp_v, jnp.clip(lo + h, 0, K - 1))
                    qpos_h.append(ph)
            fb = fb | jnp.where(jnp.max(jnp.where(p_on & (cnt > H_CAP),
                                                  1, 0)) > 0, FB_HITS, 0)

            # --- validity per (slot, h), emission-ordered -------------------
            qf = po.ule(q_bg, q_ed)
            valid_h = []
            for h in range(H_CAP):
                v = (p_on & (h < cnt)
                     & po.ule(jnp.full((PR, LANES), q_bg, I32), qpos_h[h])
                     & qf)
                valid_h.append(v)
            nvalid = sum(v.astype(I32) for v in valid_h)
            total_cand = jnp.sum(nvalid)
            fb = fb | jnp.where(total_cand > CF_CAP, FB_FCAP, 0)
            vbits = sum((v.astype(I32) << h) for h, v in enumerate(valid_h))

            # emission order: forward = ascending j (column-major);
            # left = descending j
            if forward:
                nv_e, vb_e = nvalid, vbits
                tpos_slot = ivals          # t position of probe = i
                qp_e = qpos_h
            else:
                nv_e = po.reverse_colmajor(nvalid)
                vb_e = po.reverse_colmajor(vbits)
                tpos_slot = po.reverse_colmajor(t_kmer_num - 1 - ivals)
                qp_e = [po.reverse_colmajor(q) for q in qpos_h]
            iv_e = po.reverse_colmajor(ivals) if not forward else ivals
            csum = po.prefix_sum_colmajor(nv_e)       # inclusive
            ncand = jnp.minimum(total_cand, LANES)

            # --- candidate lanes: c -> (slot, h) ----------------------------
            t128 = po.lane_iota((1, LANES))
            # binary search smallest slot s with csum[s] > t (col-major)
            lo2 = jnp.zeros((1, LANES), I32)
            hi2 = jnp.full((1, LANES), PR * LANES, I32)
            for _ in range(10):
                cont = lo2 < hi2
                mid = (lo2 + hi2) >> 1
                # col-major index mid -> (row = mid % PR, lane = mid // PR)
                ridx = mid % PR
                lidx = mid // PR
                flat = ridx * LANES + lidx
                cs = _emugather_static(csum, flat)
                go = cs <= t128
                lo2 = jnp.where(cont & go, mid + 1, lo2)
                hi2 = jnp.where(cont & ~go, mid, hi2)
            slot_cm = lo2                                    # col-major slot
            s_r = slot_cm % PR
            s_l = slot_cm // PR
            s_flat = jnp.clip(s_r * LANES + s_l, 0, PR * LANES - 1)
            c_on = t128 < ncand

            def g16(arr):
                return _emugather_static(arr, s_flat)

            cs_in = g16(csum)
            nv_s = g16(nv_e)
            rank = t128 - (cs_in - nv_s)
            vb_s = g16(vb_e)
            # h = index of rank-th set bit of vb_s (rank in [0,4))
            hsel = jnp.zeros((1, LANES), I32)
            seen = jnp.zeros((1, LANES), I32)
            for h in range(H_CAP):
                bit = (vb_s >> h) & 1
                hit = (bit == 1) & (seen == rank)
                hsel = jnp.where(hit, h, hsel)
                seen = seen + bit
            qpos = jnp.zeros((1, LANES), I32)
            for h in range(H_CAP):
                qpos = jnp.where(hsel == h, g16(qp_e[h]), qpos)
            tpos = g16(tpos_slot)
            iv_c = g16(iv_e)

            # --- short side check (4-char) ----------------------------------
            cpk = codes_pk[0].astype(I32)                 # (WQR, 128)

            if forward:
                sq = qbase + qpos - 1
                sw = t0j + tpos - 1
                short = _run_len_lanes(cpk, buf_len, wj,
                                       t_len + (OVER if not is_mid else 0),
                                       sq, sw, False,
                                       jnp.full((1, LANES), 4, I32), c_on)
            else:
                sq = qbase + qpos + K9
                sw = t0j + tpos + K9
                short = _run_len_lanes(cpk, buf_len, wj,
                                       t0j + t_len, sq, sw, True,
                                       jnp.full((1, LANES), 4, I32), c_on)
            lead_ok = c_on & ((short < 4) | (iv_c == 4))
            fb = fb | jnp.where(jnp.sum(lead_ok.astype(I32)) > F_CAP,
                                FB_FCAP, 0)

            # --- long run ----------------------------------------------------
            if forward:
                ms_u = q_ed - qpos - 1
                cap_ = po.umin(ms_u, t_len - tpos - 1) + OVER
                lq = qbase + qpos + K9
                lw = t0j + tpos + K9
                # win_len for forward long runs: t0j + t_len + OVER in
                # j-space? VM win_len = msr + OVER (sides) / trl (mid),
                # with window at j in [0, win_len); t0j=0 for fwd sides
                wl = t_len + (0 if is_mid else OVER)
                longr = _run_len_lanes(cpk, buf_len, wj, wl,
                                       lq, lw, True, cap_, lead_ok)
                back, fwd_ = short, longr
            else:
                cap_ = jnp.minimum(qpos, tpos) + OVER
                lq = qbase + qpos - 1
                lw = t0j + tpos - 1
                wl = t0j + t_len
                longr = _run_len_lanes(cpk, buf_len, wj, wl,
                                       lq, lw, False, cap_, lead_ok)
                back, fwd_ = longr, short
            total = back + fwd_ + 1
            emit = lead_ok & (total >= 4)
            node_q = qpos - back
            node_t = tpos - back + t_st

            # --- append to sms ----------------------------------------------
            em = emit.astype(I32)
            cur = em
            s = 1
            while s < LANES:
                sh2 = pltpu.roll(cur, s, 1)
                sh2 = jnp.where(po.lane_iota((1, LANES)) >= s, sh2, 0)
                cur = cur + sh2
                s <<= 1
            n_new = jnp.max(cur)
            # dest is monotone NON-decreasing over all lanes (non-emitted
            # lanes repeat the previous emitted dest; leading non-emitted
            # lanes sit at base-1, below every slot) so a lower-bound
            # search per sms slot finds the emitting lane first
            dest = base_slot + cur - 1
            fb = fb | jnp.where(base_slot + n_new + 1 > S_CAP, FB_SMS, 0)
            slot_l = po.lane_iota((1, LANES))
            lo3 = jnp.zeros((1, LANES), I32)
            hi3 = jnp.full((1, LANES), LANES, I32)
            for _ in range(8):
                cont = lo3 < hi3
                mid = (lo3 + hi3) >> 1
                dv = po.shuffle_lanes(dest, jnp.clip(mid, 0, LANES - 1))
                go = dv < slot_l
                lo3 = jnp.where(cont & go, mid + 1, lo3)
                hi3 = jnp.where(cont & ~go, mid, hi3)
            src = jnp.clip(lo3, 0, LANES - 1)
            gsrc = lambda a: po.shuffle_lanes(a, src)
            hitm = (gsrc(dest) == slot_l) & (gsrc(emit.astype(I32)) == 1)
            for r, v in ((0, node_q), (1, node_t), (2, total),
                         (3, jnp.zeros((1, LANES), I32))):
                got = po.shuffle_lanes(v, src)
                sms[r : r + 1, :] = jnp.where(hitm, got, sms[r : r + 1, :])
            if _TRACE:
                jax.debug.print(
                    "  match fwd={f} ncand={nc} n_new={nn}\n"
                    "   qpos={q}\n   tpos={t}\n   ival={i}\n   short={s}\n"
                    "   long={lg}\n   emit={e}",
                    f=1 if forward else 0, nc=ncand, nn=n_new,
                    q=qpos[0, :12], t=tpos[0, :12], i=iv_c[0, :12],
                    s=short[0, :12], lg=longr[0, :12],
                    e=emit[0, :12].astype(I32))
            return n_new, fb

        # ---- sms helpers ----------------------------------------------------
        def sms_set(slot, q, t, ln, sc):
            for r, v in ((0, q), (1, t), (2, ln), (3, sc)):
                sms[r : r + 1, :] = po.set_lane(sms[r : r + 1, :], slot, v)

        def sms_get(slot):
            return (po.extract(sms[0:1], slot), po.extract(sms[1:2], slot),
                    po.extract(sms[2:3], slot), po.extract(sms[3:4], slot))

        # ---- node DP (one node against all prior slots) --------------------
        def node_dp(cur, is_left: bool, is_mid: bool):
            """Process sms node `cur`; returns node_max. Mirrors
            rescore._proc_micro's vectorized formulas."""
            cq, ct, cln, _ = sms_get(cur)
            pq = sms[0:1, :]
            pt = sms[1:2, :]
            plen = sms[2:3, :]
            psc = sms[3:4, :]
            slots = po.lane_iota((1, LANES))
            prior = slots < cur
            if not is_left:
                max_q = cq + 6
                max_t = ct + 6
                pre_q_ed = pq + plen + K9 - 1
                pre_t_ed = pt + plen + K9 - 1
                ok = po.ule(pre_q_ed, max_q) & po.ule(pre_t_ed, max_t)
                brk = po.ult(pt + 600, jnp.full((1, LANES), max_t, I32))
                indel = pq - pt - (max_q - max_t)
                ov = jnp.maximum(pre_q_ed - cq, pre_t_ed - ct)
                new = psc + cln - (jnp.abs(indel) >> 3)
                new = new - jnp.where(
                    po.ult(jnp.full((1, LANES), cq, I32), pre_q_ed)
                    | po.ult(jnp.full((1, LANES), ct, I32), pre_t_ed),
                    ov, 0)
            else:
                min_q = cq + cln - 6 + K9 - 1
                min_t = ct + cln - 6 + K9 - 1
                ok = po.ule(jnp.full((1, LANES), min_q, I32), pq) \
                    & po.ule(jnp.full((1, LANES), min_t, I32), pt)
                brk = po.ult(jnp.full((1, LANES), min_t + 600, I32), pt)
                indel = pq - pt - (min_q - min_t)
                ov = jnp.maximum(min_q + 6 - pq, min_t + 6 - pt)
                new = psc + cln - (jnp.abs(indel) >> 3)
                new = new - jnp.where(
                    po.ult(pq, jnp.full((1, LANES), min_q + 6, I32))
                    | po.ult(pt, jnp.full((1, LANES), min_t + 6, I32)),
                    ov, 0)
            if is_mid:
                brk = jnp.zeros((1, LANES), bool)
            indel_ok = jnp.abs(indel) <= 200
            brk_slot = jnp.max(jnp.where(brk & prior, slots, -1))
            consider = prior & ok & indel_ok & (slots > brk_slot)
            node_max = jnp.maximum(
                cln, jnp.max(jnp.where(consider, new, NEG_INF)))
            sms[3:4, :] = po.set_lane(sms[3:4, :], cur, node_max)
            return node_max

        # ---- middle walk ----------------------------------------------------
        def run_middle(a_start, dslot, t_glob, fb, steps):
            """Returns (mid_score(+10000 domain), fb, steps)."""
            def cond(st):
                a, score, fb, steps = st
                return (a >= 0) & (fb == 0) & (steps < MAX_STEPS)

            def body(st):
                a, score, fb, steps = st
                pre = anc_f(a, 3)
                cur_q = anc_f(a, 0)
                cur_t = anc_f(a, 1)
                cur_m = anc_f(a, 2)

                def terminal(_):
                    return (score + cur_m - K9 + 1, fb, steps + 1)

                def gap(_):
                    pre_q = anc_f(pre, 0)
                    pre_t = anc_f(pre, 1)
                    pre_m = anc_f(pre, 2)
                    pre_roff3 = pre_t - 3
                    trl = cur_t - (pre_roff3 + pre_m) + 3
                    fb1 = fb | jnp.where((trl > 12) & (trl > W_CAP),
                                         FB_MIDW, 0)
                    sms_set(0, pre_q, pre_t, pre_m - K9 + 1, score)

                    def with_win(_):
                        t_st = pre_roff3 + pre_m
                        wj = fetch_window(t_st + t_glob, trl,
                                          jnp.int32(1 << 20))
                        return sdp_match(True, wj, trl, jnp.int32(0),
                                         pre_q + pre_m - 8, cur_q - 1,
                                         t_st, dslot, jnp.int32(1), True,
                                         fb1)

                    def no_win(_):
                        return jnp.int32(0), fb1

                    n_new, fb2 = jax.lax.cond(
                        (trl > 12) & (fb1 == 0), with_win, no_win, None)
                    last = jnp.clip(1 + n_new, 0, S_CAP - 1)
                    sms_set(last, cur_q, cur_t, cur_m - K9 + 1, 0)
                    n_sms = jnp.minimum(2 + n_new, S_CAP)

                    def dp_body(si, sc):
                        nm = node_dp(si, False, True)
                        return jnp.maximum(sc, nm)

                    score2 = jax.lax.fori_loop(1, n_sms, dp_body, score)
                    if _TRACE:
                        jax.debug.print(
                            "gap: trl={t} pre=({pq},{pt},{pm}) "
                            "cur=({cq},{ct},{cm}) n_new={n} score={s}",
                            t=trl, pq=pre_q, pt=pre_t, pm=pre_m, cq=cur_q,
                            ct=cur_t, cm=cur_m, n=n_new, s=score2)
                        jax.debug.print(
                            "  sms q={q}\n  sms t={t}\n  sms l={l}\n"
                            "  sms s={s}", q=sms[0, :8], t=sms[1, :8],
                            l=sms[2, :8], s=sms[3, :8])
                    return score2, fb2, steps + n_sms

                score2, fb2, steps2 = jax.lax.cond(pre < 0, terminal, gap,
                                                   None)
                return pre, score2, fb2, steps2

            _, score, fb, steps = jax.lax.while_loop(
                cond, body, (a_start, jnp.int32(10000), fb, steps))
            return score, fb, steps

        # ---- side extension -------------------------------------------------
        def run_side(is_left: bool, ci, dslot, t_glob, t_length, score_in,
                     fb, steps):
            """sdp_right / sdp_left. score_in/+out in +10000 domain.
            Returns (total, fb, steps)."""
            q_anchor = chf(ci, C_QST if is_left else C_QED)
            t_anchor = chf(ci, C_TST if is_left else C_TED)
            sms_set(0, q_anchor, t_anchor,
                    jnp.int32(0) if is_left else jnp.int32(1 - K9),
                    score_in)
            # st = (n, cur, max_id, total, score_ori, c_t_off,
            #       last_search, done, fb, steps)
            st0 = (jnp.int32(1), jnp.int32(1), jnp.int32(0), score_in,
                   score_in, (t_anchor + 3) if is_left else (t_anchor - 3),
                   jnp.int32(0), jnp.int32(0), fb, steps)

            def cond(st):
                n, cur, max_id, total, so, cto, ls, done, fb, steps = st
                return (done == 0) & (fb == 0) & (steps < MAX_STEPS)

            def body(st):
                n, cur, max_id, total, so, cto, ls, done, fb, steps = st

                def do_fetch(_):
                    best_q = po.extract(sms[0:1], max_id)
                    q_st_c = chf(ci, C_QST)
                    q_ed_c = chf(ci, C_QED)
                    if is_left:
                        brk = po.ult(cto, jnp.int32(MIN_SCORE_MEM))
                        near = po.ult(q_st_c, jnp.int32(600))
                        msr_raw = jnp.where(near, q_st_c + 60, cto)
                    else:
                        nstep = t_length - cto
                        brk = po.ult(nstep, jnp.int32(MIN_SCORE_MEM))
                        near = (l_read - q_ed_c) < 600
                        msr_raw = jnp.where(near, l_read - q_ed_c + 60,
                                            t_length - cto)
                    brk = brk | (near & (ls != 0))
                    ls2 = ls | near.astype(I32)
                    msr = jnp.where(po.ult(jnp.int32(600), msr_raw),
                                    jnp.int32(600), msr_raw)
                    fwrap = (~brk) & (cto < 0)
                    fb1 = fb | jnp.where(fwrap, FB_WRAP, 0)

                    def fetch2(_):
                        if is_left:
                            bug = (t_glob == 0) & (cto < OVER + msr)
                            goff = jnp.where(bug, cto + t_glob - msr,
                                             cto + t_glob - msr - OVER)
                            bugz = jnp.where(bug, msr, jnp.int32(1 << 20))
                            t0j = jnp.int32(OVER)
                            t_st = cto - msr
                        else:
                            goff = cto + t_glob
                            bugz = jnp.int32(1 << 20)
                            t0j = jnp.int32(0)
                            t_st = cto
                        wj = fetch_window(goff, msr, bugz)
                        if is_left:
                            sqs = jnp.maximum(best_q - 1000, 0)
                            q_bg = sqs
                            a_u = sqs + 2000
                            b_u = q_st_c - 1
                            q_ed = jnp.where(po.ult(a_u, b_u), a_u, b_u)
                        else:
                            sqe = jnp.minimum(best_q + 1000, l_read)
                            a_u = sqe - 2000
                            b_u = q_st_c - 8
                            q_bg = jnp.where(po.ult(b_u, a_u), a_u, b_u)
                            q_ed = sqe
                        n_new, fb2 = sdp_match(not is_left, wj, msr, t0j,
                                               q_bg, q_ed, t_st, dslot, n,
                                               False, fb1)
                        cto2 = (cto - (msr - K9 - 3)) if is_left \
                            else (cto + msr - K9 - 3)
                        no_new = n_new == 0
                        first_t = po.extract(sms[1:2], jnp.clip(cur, 0,
                                                                S_CAP - 1))
                        best_t = po.extract(sms[1:2], max_id)
                        if is_left:
                            far = po.ult(first_t + 1000, best_t)
                        else:
                            far = po.ult(best_t + 1000, first_t)
                        done2 = (no_new | far).astype(I32)
                        return (n + n_new, cur, max_id, total, so, cto2,
                                ls2, done2, fb2, steps + 1)

                    def brk_now(_):
                        return (n, cur, max_id, total, so, cto, ls2,
                                jnp.int32(1), fb1, steps + 1)

                    return jax.lax.cond((brk | fwrap) == 0, fetch2,
                                        brk_now, None)

                def do_node(_):
                    node_max = node_dp(cur, is_left, False)
                    cq, ct, cln, _csc = sms_get(cur)
                    cur2 = cur + 1

                    # combine check
                    dis = ct - cq
                    c_q_pos = (cq + cln) if is_left else cq
                    e_i = po.lane_iota((1, LANES))
                    key_v = hashv[0:1]
                    eci_v = hashv[1:2]
                    soe_v = hashv[2:3]
                    qst_v, tst_v = hashv[3:4], hashv[4:5]
                    qed_v, ted_v = hashv[5:6], hashv[6:7]
                    ref_v, dir_v, sum_v = hashv[7:8], hashv[8:9], hashv[9:10]
                    if is_left:
                        dis_con = ted_v - qed_v
                        q_pos_con = qed_v - K9
                        soe_want = 1
                    else:
                        dis_con = tst_v - qst_v
                        q_pos_con = qst_v
                        soe_want = 0
                    okc = ((cln >= 8) & (e_i < n_hash)
                           & (key_v == (dis & 0xFF))
                           & (dis == dis_con) & (eci_v != ci)
                           & (soe_v != soe_want)
                           & (jnp.abs(c_q_pos - q_pos_con) < 8)
                           & (ref_v == chf(ci, C_REF))
                           & (dir_v == chf(ci, C_DIR))
                           & (sum_v != 0) & (eci_v > ci))
                    found = jnp.max(okc.astype(I32)) > 0
                    first_e = jnp.min(jnp.where(okc, e_i, LANES))

                    def combined(_):
                        fe = jnp.clip(first_e, 0, LANES - 1)
                        aci = jnp.clip(po.extract(hashv[1:2], fe), 0,
                                       C_CAP - 1)
                        # absorb aci into ci
                        set_chf(ci, C_SUM, chf(ci, C_SUM) + chf(aci, C_SUM))
                        set_chf(ci, C_ANUM,
                                chf(ci, C_ANUM) + chf(aci, C_ANUM))
                        set_chf(ci, C_INDEL,
                                chf(ci, C_INDEL) + chf(aci, C_INDEL))
                        set_chf(ci, C_QST,
                                jnp.minimum(chf(ci, C_QST), chf(aci, C_QST)))
                        set_chf(ci, C_TST,
                                jnp.minimum(chf(ci, C_TST), chf(aci, C_TST)))
                        set_chf(ci, C_QED,
                                jnp.maximum(chf(ci, C_QED), chf(aci, C_QED)))
                        set_chf(ci, C_TED,
                                jnp.maximum(chf(ci, C_TED), chf(aci, C_TED)))
                        absorbed_cur = chf(aci, C_CUR)
                        for f in (C_SUM, C_TST, C_TED, C_QST, C_QED):
                            set_chf(aci, f, jnp.int32(0))
                        build_hashv()
                        mid_sc, fb2, steps2 = run_middle(
                            absorbed_cur, dslot, t_glob, fb, steps + 1)
                        total2 = (jnp.maximum(so, node_max) - cln
                                  + mid_sc - 10000)
                        q_a2 = chf(ci, C_QST if is_left else C_QED)
                        t_a2 = chf(ci, C_TST if is_left else C_TED)
                        sms_set(0, q_a2, t_a2,
                                jnp.int32(0) if is_left else jnp.int32(-K9),
                                total2)
                        return (jnp.int32(1), jnp.int32(1), jnp.int32(0),
                                total2, total2, t_a2, ls, jnp.int32(0),
                                fb2, steps2)

                    def plain(_):
                        upd = total < node_max
                        total2 = jnp.where(upd, node_max, total)
                        max_id2 = jnp.where(upd, cur2 - 1, max_id)
                        best_t = po.extract(sms[1:2], max_id2)
                        if is_left:
                            brk2 = po.ult(ct + 1000, best_t)
                        else:
                            brk2 = po.ult(best_t + 1000, ct)
                        return (n, cur2, max_id2, total2, so, cto, ls,
                                brk2.astype(I32), fb, steps + 1)

                    return jax.lax.cond(found, combined, plain, None)

                return jax.lax.cond(cur == n, do_fetch, do_node, None)

            n, cur, max_id, total, so, cto, ls, done, fb, steps = \
                jax.lax.while_loop(cond, body, st0)
            fb = fb | jnp.where(steps >= MAX_STEPS, FB_OVER, 0)
            # completion writeback (VM _side_complete)
            bq, bt, bl, _bs = sms_get(jnp.clip(max_id, 0, S_CAP - 1))
            if is_left:
                set_chf(ci, C_QST, bq)
                set_chf(ci, C_TST, bt)
                set_chf(ci, C_SUM, total - 10000)
            else:
                set_chf(ci, C_QED, bq + bl + K9)
                set_chf(ci, C_TED, bt + bl + K9)
            return total, fb, steps

        # ---- chain loop -----------------------------------------------------
        def chain_cond(st):
            ci_prev, fb, steps = st
            return (fb == 0) & (steps < MAX_STEPS) & (ci_prev < n_chains)

        def chain_body(st):
            ci_prev, fb, steps = st
            # next chain > ci_prev with sum != 0
            pick = jnp.int32(C_CAP)
            for c in range(C_CAP - 1, -1, -1):
                hitc = (c > ci_prev) & (c < n_chains) & (chf(c, C_SUM) != 0)
                pick = jnp.where(hitc, c, pick)

            def work(_):
                ci = pick
                dslot = jnp.clip(chf(ci, C_DIR), 0, 1)
                refc = jnp.clip(chf(ci, C_REF), 0, RR * LANES - 1)
                t_glob = po.extract_rc(refoff[:], refc >> 7, refc & 127)
                t_length = po.extract_rc(reflen[:], refc >> 7, refc & 127)
                build_hashv()
                sc, fb1, steps1 = run_middle(chf(ci, C_CUR), dslot, t_glob,
                                             fb, steps)
                flg[0, 0, 3] = sc          # debug: last chain's phase scores
                sc, fb2, steps2 = run_side(False, ci, dslot, t_glob,
                                           t_length, sc, fb1, steps1)
                flg[0, 0, 4] = sc
                sc, fb3, steps3 = run_side(True, ci, dslot, t_glob,
                                           t_length, sc, fb2, steps2)
                flg[0, 0, 5] = sc
                return ci, fb3, steps3

            def done(_):
                return jnp.int32(C_CAP), fb, steps

            return jax.lax.cond(pick < C_CAP, work, done, None)

        _, fb, steps = jax.lax.while_loop(
            chain_cond, chain_body,
            (jnp.int32(-1), jnp.int32(0), jnp.int32(0)))

        # ---- outputs (SMEM: dynamic scalar writes lower there) -------------
        def out_chain(c, _):
            def out_f(f, __):
                cho[0, 0, c * 16 + f] = chw[c * 16 + f]
                return 0
            jax.lax.fori_loop(0, 16, out_f, 0)
            return 0
        jax.lax.fori_loop(0, C_CAP, out_chain, 0)
        flg[0, 0, 0] = (fb != 0).astype(I32)
        flg[0, 0, 1] = fb
        flg[0, 0, 2] = steps
        flg[0, 0, 6] = jnp.int32(0)
        flg[0, 0, 7] = jnp.int32(0)

    return kernel


# ---------------------------------------------------------------------------
# host-callable wrapper
# ---------------------------------------------------------------------------

def _pad_rows(a, lanes=LANES):
    """Flatten trailing dims and pad to (B, rows, 128)."""
    B = a.shape[0]
    flat = a.reshape(B, -1)
    n = flat.shape[1]
    pad = (-n) % lanes
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    return flat.reshape(B, -1, lanes)


@functools.partial(jax.jit,
                   static_argnames=("n_bases", "interpret"))
def rescore_kernel_pl(inp: RescoreIn, ref_pk, ref_off, ref_len_arr,
                      n_bases: int, interpret: bool = False):
    """Per-read Pallas rescore. Same contract as rescore.rescore_kernel:
    returns (chains, fallback, reason, iters). ref_pk: (1, W) u32 packed
    reference (16 chars/word, textwalk layout) — NOT ref_bin bytes."""
    B = inp.n_chains.shape[0]
    L2 = inp.codes_fr.shape[1]
    K = L2 // 2
    KR = -(-K // LANES)
    KP = KR * LANES

    codes_pk = _pack2(inp.codes_fr)
    WQR = -(-codes_pk.shape[1] // LANES)
    codes_pk3 = _pad_rows(codes_pk)

    rkv, rkp_, rkc = _build_sorted_rk(inp.codes_fr, inp.read_len)
    pad = KP - K
    if pad:
        big = jnp.int32(np.iinfo(np.int32).max)
        rkv = jnp.pad(rkv, ((0, 0), (0, 0), (0, pad)), constant_values=big)
        rkp_ = jnp.pad(rkp_, ((0, 0), (0, 0), (0, pad)))
    rkv3 = rkv.reshape(B, 2 * KR, LANES)
    rkp3 = rkp_.reshape(B, 2 * KR, LANES)

    # reference as (NR, 128) u32 word rows, plus ONE extra zero row so
    # fetch_window's 2-row DMA stays in range even when the window start
    # falls in the final row (r0 = gw0 >> 7 may then be NR - 2, i.e. the
    # true last data row, and r0 + 1 hits the pad row). Without the pad
    # the old clamp to NR - 2 silently fetched 2048 chars too early for
    # tail-of-last-sequence windows.
    rw = ref_pk.reshape(-1)
    padw = (-rw.shape[0]) % LANES
    if padw:
        rw = jnp.pad(rw, (0, padw))
    refrows = jnp.concatenate(
        [rw.reshape(-1, LANES), jnp.zeros((1, LANES), rw.dtype)])
    NR = refrows.shape[0]

    nref = ref_off.shape[0]
    RR = -(-nref // LANES)
    roff = jnp.pad(ref_off, (0, RR * LANES - nref)).reshape(RR, LANES)
    rlen = jnp.pad(ref_len_arr, (0, RR * LANES - nref)).reshape(RR, LANES)

    last_char = ((rw[(n_bases - 1) >> 4]
                  >> (U32(2) * U32((n_bases - 1) & 15))) & U32(3)).astype(I32)

    scal = jnp.stack([
        inp.n_chains, inp.n_hash, inp.read_len, inp.buf_len,
        jnp.broadcast_to(last_char, (B,)),
        jnp.zeros((B,), I32), jnp.zeros((B,), I32), jnp.zeros((B,), I32),
    ], axis=1)[:, None, :]

    chs = _pad_rows(jnp.pad(inp.chains, ((0, 0), (0, 0),
                                         (0, 16 - CF_N))))  # (B,1,128)
    chs2 = chs.reshape(B, 1, LANES)
    anc2 = inp.anchors.reshape(B, 1, -1)
    n_hash_cap = inp.schash.shape[1]
    sch2 = inp.schash.reshape(B, 1, -1)

    A2 = inp.anchors.shape[1]
    kernel = _make_kernel(n_bases, NR, KR, WQR, RR, n_hash_cap, A2)

    S = pltpu.SMEM
    V = pltpu.VMEM
    in_specs = [
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0), memory_space=S),
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0),
                         memory_space=S),
            pl.BlockSpec((1, 1, anc2.shape[2]), lambda i: (i, 0, 0),
                         memory_space=S),
            pl.BlockSpec((1, 1, sch2.shape[2]), lambda i: (i, 0, 0),
                         memory_space=S),
            pl.BlockSpec((1, WQR, LANES), lambda i: (i, 0, 0),
                         memory_space=V),
            pl.BlockSpec((1, 2 * KR, LANES), lambda i: (i, 0, 0),
                         memory_space=V),
            pl.BlockSpec((1, 2 * KR, LANES), lambda i: (i, 0, 0),
                         memory_space=V),
            pl.BlockSpec((1, 2, LANES), lambda i: (i, 0, 0),
                         memory_space=V),
            pl.BlockSpec((RR, LANES), lambda i: (0, 0), memory_space=V),
            pl.BlockSpec((RR, LANES), lambda i: (0, 0), memory_space=V),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
    out_specs = [
        pl.BlockSpec((1, 1, C_CAP * 16), lambda i: (i, 0, 0),
                     memory_space=S),
        pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0), memory_space=S),
    ]
    cho, flg = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, C_CAP * 16), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 8), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, LANES), jnp.int32),     # sms
            pltpu.VMEM((2, LANES), jnp.uint32),    # dma window buffer
            pltpu.SMEM((C_CAP * 16,), jnp.int32),  # working chains
            pltpu.VMEM((10, LANES), jnp.int32),    # combine-hash vectors
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(scal, chs2, anc2, sch2,
      codes_pk3.astype(jnp.uint32), rkv3, rkp3, rkc.astype(I32),
      roff, rlen, refrows)

    flg = flg[:, 0]
    chains = cho.reshape(B, C_CAP, 16)[:, :, :CF_N]
    fallback = flg[:, 0] != 0
    reason = flg[:, 1]
    iters = flg[:, 2]
    return chains, fallback, reason, iters, flg


def rescore_pl(inp, ref_pk, ref_off, ref_len_arr, n_bases, interpret=False):
    """Contract-compatible wrapper (chains, fallback, reason, iters)."""
    return rescore_kernel_pl(inp, ref_pk, ref_off, ref_len_arr,
                             n_bases=n_bases, interpret=interpret)[:4]
