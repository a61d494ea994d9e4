"""Differential fuzz: csrc/goldhot.c kernels vs their pure-python gold
oracles (which are themselves bit-parity-tested against the reference
binary). Covers lv_extd, mem_run, get_ref, exist_hits, sdp_match and
fm_mem_search."""
import types

import numpy as np
import pytest

from desamba_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_lv_extd_matches_python():
    from desamba_tpu.constants import LV_ERROR
    from desamba_tpu.engine.gold.mapseed import _lv_extd_py

    rng = np.random.default_rng(7)
    for _ in range(5000):
        rl = int(rng.integers(0, 14))
        ql = int(rng.integers(0, 14))
        r = rng.integers(0, 4, rl).astype(np.uint8)
        if rng.random() < 0.5 and ql <= rl:
            q = r[:ql].copy()
        else:
            q = rng.integers(0, 4, ql).astype(np.uint8)
        if len(q) and rng.random() < 0.7:
            k = rng.integers(0, len(q), rng.integers(0, 4))
            q[k] = rng.integers(0, 4, len(k))
        assert (_lv_extd_py(r, rl, q, ql)
                == native.lv_extd(r, rl, q, ql, LV_ERROR))


def test_mem_run_matches_python():
    import desamba_tpu.engine.gold.rescore as R
    import desamba_tpu.io.native as nv

    rng = np.random.default_rng(3)
    real = R.native
    R.native = types.SimpleNamespace(available=lambda: False)
    try:
        for _ in range(5000):
            lq = int(rng.integers(1, 60))
            lt = int(rng.integers(1, 60))
            qb = rng.integers(0, 4, lq).astype(np.uint8)
            t = rng.integers(0, 4, lt).astype(np.uint8)
            if rng.random() < 0.5:
                n = min(lq, lt)
                t[:n] = qb[:n]
            fw = bool(rng.random() < 0.5)
            if fw:
                qi = int(rng.integers(0, lq + 3))
                ti = int(rng.integers(0, lt + 3))
            else:
                qi = int(rng.integers(-1, lq))
                ti = int(rng.integers(-1, lt))
            ml = (int(rng.integers(0, 100)) if rng.random() < 0.9
                  else 0xFFFFFFFF)
            assert (R._mem_q(qb, qi, t, ti, fw, ml)
                    == nv.mem_run(qb, qi, t, ti, fw, ml))
    finally:
        R.native = real


def test_get_ref_matches_python():
    import desamba_tpu.engine.gold.mapseed as M

    rng = np.random.default_rng(5)
    rb = rng.integers(0, 256, 1000).astype(np.uint8)
    real = M.native
    M.native = types.SimpleNamespace(available=lambda: False)
    try:
        for _ in range(2000):
            off = int(rng.integers(0, 4100))
            ln = int(rng.integers(1, 80))
            fw = bool(rng.random() < 0.5)
            assert np.array_equal(M.get_ref(rb, off, ln, fw),
                                  native.get_ref_bases(rb, off, ln, fw))
    finally:
        M.native = real


def test_exist_hits_matches_python(small_my_index):
    from desamba_tpu.engine.gold.islands import exist_mask, store_kmers_mask

    idx = small_my_index
    rng = np.random.default_rng(5)
    for _ in range(100):
        n = int(rng.integers(idx.len_e_kmer + 1, 2000))
        br = rng.integers(0, 4, n).astype(np.uint8)
        nk = n - idx.len_e_kmer + 1
        km = store_kmers_mask(br, nk, idx.len_e_kmer, idx.single_base_max)
        a = exist_mask(km, idx.ekmer0, idx.ekmer1, idx.e_hash_mask)
        b = native.exist_hits(br, nk, idx.len_e_kmer, idx.single_base_max,
                              idx.ekmer0, idx.ekmer1, idx.e_hash_mask)
        assert np.array_equal(a, b)


def test_fm_mem_search_matches_python(small_my_index):
    import desamba_tpu.engine.gold.fm as fm_mod
    from desamba_tpu.engine.gold.fm import FM, SpSet, bwt_mem_search
    from desamba_tpu.constants import (L_PRE_IDX, MEM_SEARCH_FAST,
                                       MIN_MEM_LEN_FAST, PRE_IDX_MASK)
    from desamba_tpu.engine.gold.mapseed import get_ref
    from desamba_tpu.index.kmers import rolling_kmers

    idx = small_my_index
    fm = FM(idx)
    rng = np.random.default_rng(11)
    total = int(idx.ref_off[-1] + idx.ref_len[-1])
    real = fm_mod.native
    for _ in range(60):
        L = 200
        st = int(rng.integers(0, total - L))
        seq = get_ref(idx.ref_bin, st, L, True).copy()
        pos = rng.integers(0, L, size=L // 12)
        seq[pos] = (seq[pos] + rng.integers(1, 4, size=len(pos))) % 4
        kms = rolling_kmers(seq, idx.len_e_kmer)
        str_i = int(rng.integers(idx.len_e_kmer, L - 1))
        pre_v = int(kms[str_i - idx.len_e_kmer + 1]) & PRE_IDX_MASK
        out_py: list = []
        out_nat: list = []
        sp_py, sp_nat = SpSet(), SpSet()
        fm_mod.native = types.SimpleNamespace(available=lambda: False)
        try:
            bwt_mem_search(fm, seq, str_i, pre_v, MEM_SEARCH_FAST,
                           MIN_MEM_LEN_FAST, str_i, sp_py, out_py)
        finally:
            fm_mod.native = real
        bwt_mem_search(fm, seq, str_i, pre_v, MEM_SEARCH_FAST,
                       MIN_MEM_LEN_FAST, str_i, sp_nat, out_nat)
        assert [(r.match_len, r.sp, r.sa_sp, r.sa_sp_l) for r in out_py] \
            == [(r.match_len, r.sp, r.sa_sp, r.sa_sp_l) for r in out_nat]
        assert [int(x) for x in sp_py.items] == sp_nat.contents()


def test_map_seed_and_kmers_match_python(small_my_index):
    """classify_read anchors/chains with native map_seed + store_kmers ==
    the pure-python path, on mutated reads from the synthetic index."""
    import desamba_tpu.engine.gold.fastslow as fs
    import desamba_tpu.engine.gold.mapseed as ms
    from desamba_tpu.engine.gold.classify import ClassifyEngine, Options
    from desamba_tpu.engine.gold.mapseed import get_ref

    idx = small_my_index
    eng = ClassifyEngine(idx, Options())
    rng = np.random.default_rng(21)
    total = int(idx.ref_off[-1] + idx.ref_len[-1])
    reads = []
    for i in range(12):
        L = int(rng.integers(150, 900))
        st = int(rng.integers(0, total - L))
        seq = get_ref(idx.ref_bin, st, L, True).copy()
        pos = rng.integers(0, L, size=L // 10)
        seq[pos] = (seq[pos] + rng.integers(1, 4, size=len(pos))) % 4
        reads.append("".join("ACGT"[c] for c in seq))

    def run():
        out = []
        for i, s in enumerate(reads):
            eng.state.max_read_l = 0
            r = eng.classify_read(f"r{i}", s)
            out.append([(c.ref_id, c.sum_score, c.t_st, c.t_ed, c.q_st,
                         c.q_ed, c.anchor_number, c.primary)
                        for c in r.chains])
        return out

    a = run()
    stub = types.SimpleNamespace(available=lambda: False)
    real_ms, real_fs = ms.native, fs.native
    ms.native, fs.native = stub, stub
    try:
        b = run()
    finally:
        ms.native, fs.native = real_ms, real_fs
    assert a == b


def test_post_finish_native_matches_python(small_my_index):
    """rescore_finish mode 1 (device-engine host finish) == python
    post_rescore_finish + detect_primary on random chain sets."""
    import copy

    from desamba_tpu.engine.gold.chain import Chain
    from desamba_tpu.engine.gold.classify import Options, StreamState
    from desamba_tpu.engine.gold.rescore import (detect_primary,
                                                 post_finish_native,
                                                 post_rescore_finish)

    idx = small_my_index
    rng = np.random.default_rng(3)
    opts = Options()
    for it in range(500):
        nc = int(rng.integers(1, 9))
        l_read = int(rng.integers(100, 3000))
        chains = []
        for i in range(nc):
            t_st = int(rng.integers(0, 20000))
            span = int(rng.integers(0, 2000))
            q_st = int(rng.integers(0, l_read))
            qspan = int(rng.integers(0, l_read))
            chains.append(Chain(
                ref_id=int(rng.integers(0, 3)), q_t_dis=0,
                sum_score=int(rng.integers(0, 400)),
                anchor_number=int(rng.integers(1, 20)),
                direction=int(rng.integers(0, 2)),
                with_top_anchor=bool(rng.integers(0, 2)),
                primary=0, pri_index=0, t_st=t_st, t_ed=t_st + span,
                q_st=q_st, q_ed=min(l_read, q_st + qspan),
                indel=int(rng.integers(0, 50)), chain_id=i,
                chain_anchor_cur=None))
        st1, st2 = StreamState(), StreamState()
        st1.max_read_l = st2.max_read_l = int(rng.integers(0, 1200))
        c1 = copy.deepcopy(chains)
        post_rescore_finish(c1, l_read, st1, opts)
        detect_primary(c1, l_read)
        c2 = copy.deepcopy(chains)
        assert post_finish_native(idx, c2, l_read, st2, opts)
        key = lambda c: (c.ref_id, c.sum_score, c.direction, c.t_st,
                         c.t_ed, c.q_st, c.q_ed, c.indel, c.primary,
                         c.pri_index)
        assert [key(c) for c in c1] == [key(c) for c in c2]
        assert st1.max_read_l == st2.max_read_l


def test_resolve_tree_m2_matches_python(small_my_index):
    """Native M2 chaining rows == python resolve_tree over random
    anchor sets (< M3 threshold)."""
    from desamba_tpu.constants import (M3_ANCHOR_THRESHOLD, MAX_DIS_MINUS,
                                       MAX_WAITING_LEN)
    from desamba_tpu.engine.gold.chain import resolve_tree
    from desamba_tpu.engine.gold.mapseed import Anchor

    rng = np.random.default_rng(17)
    for it in range(800):
        n = int(rng.integers(1, 49))
        rows = np.zeros((n, 14), np.int64)
        anchors = []
        for a in range(n):
            mtch = int(rng.integers(9, 60))
            score = int(rng.integers(-10, 300))
            ref_id = int(rng.integers(0, 3))
            refoff = int(rng.integers(0, 3000))
            idxr = int(rng.integers(0, 1500))
            dup = int(rng.integers(0, 2))
            useless = int(rng.integers(0, 2))
            dirn = int(rng.integers(0, 2))
            sid = int(rng.integers(0, 5))
            rows[a] = (mtch, score, 0, 0, 0, 0, 0, ref_id, refoff, idxr,
                       dup, sid, useless, dirn)
            anchors.append(Anchor(
                mtch_len=mtch, score=score, left_len=0, left_ed=0,
                rigt_len=0, rigt_ed=0, direction=dirn, global_offset=0,
                ref_id=ref_id, ref_offset=refoff, index_in_read=idxr,
                chain_anchor_pre=None, seed_id=sid, chain_id=0,
                anchor_useless=bool(useless), duplicate=bool(dup)))
        chains = []
        resolve_tree(anchors, chains)
        rt = native.resolve_tree_m2(rows, M3_ANCHOR_THRESHOLD,
                                    MAX_DIS_MINUS, MAX_WAITING_LEN)
        assert rt is not None
        crow, anc3 = rt
        assert len(crow) == len(chains)
        for i, c in enumerate(chains):
            r = crow[i]
            assert (c.ref_id, c.sum_score, c.anchor_number, c.direction,
                    int(c.with_top_anchor), c.t_st, c.t_ed, c.q_st,
                    c.q_ed, c.indel) == tuple(int(x) for x in r[:10])
            # anchor triple list matches the cur->pre walk
            a = c.chain_anchor_cur
            trip = []
            while a is not None:
                trip.append((a.mtch_len, a.ref_offset, a.index_in_read))
                a = a.chain_anchor_pre
            off, cnt = int(r[10]), int(r[11])
            assert trip == [tuple(int(x) for x in anc3[k])
                            for k in range(off, off + cnt)]
