"""Run the GOLD python rescore on single reads from the captured batch
(/tmp/rescore_in.npz) with per-phase score tracing — the printable
ground truth for debugging the per-read Pallas kernel.

Usage: python3 tools/rescore_gold_one.py READ_IDX [--trace]
Prints per-chain (mid, right, left) scores and final chain rows.
"""
import sys
import types

sys.path.insert(0, '/root/repo')
import numpy as np

from desamba_tpu.io import native

# force the pure-python paths (they are instrumentable)
native.available = lambda: False

import desamba_tpu.engine.gold.rescore as gr
from desamba_tpu.engine.gold.chain import Chain


class Anchor:
    __slots__ = ("index_in_read", "ref_offset", "mtch_len",
                 "chain_anchor_pre", "ref_id")

    def __init__(self, q, t, m):
        self.index_in_read = q
        self.ref_offset = t
        self.mtch_len = m
        self.chain_anchor_pre = None
        self.ref_id = 0


class FakeIdx:
    pass


class Dir:
    pass


def load_read(i):
    d = np.load('/tmp/rescore_in.npz')
    ch = d['chains'][i]
    nch = int(d['n_chains'][i])
    anc = d['anchors'][i]
    codes = d['codes_fr'][i]
    rl = int(d['read_len'][i])
    bl = int(d['buf_len'][i])
    idx = FakeIdx()
    idx.ref_bin = d['ref_bin']
    idx.ref_off = d['ref_off'].astype(np.int64)
    idx.ref_len = d['ref_len_arr'].astype(np.int64)
    n_bases = int(d['n_bases'])

    # anchors -> linked objects
    aobjs = [Anchor(int(a[0]), int(a[1]), int(a[2])) for a in anc]
    for ao, a in zip(aobjs, anc):
        ao.chain_anchor_pre = aobjs[int(a[3])] if int(a[3]) >= 0 else None

    chains = []
    for c in range(nch):
        r = ch[c]
        cur = int(r[9])
        chains.append(Chain(
            ref_id=int(r[0]), q_t_dis=0, sum_score=int(r[2]) & 0xFFFFFFFF,
            anchor_number=int(r[3]), direction=int(r[1]),
            with_top_anchor=False, primary=0, pri_index=0,
            t_st=int(r[4]) & 0xFFFFFFFF, t_ed=int(r[5]) & 0xFFFFFFFF,
            q_st=int(r[6]) & 0xFFFFFFFF, q_ed=int(r[7]) & 0xFFFFFFFF,
            indel=int(r[8]), chain_id=c,
            chain_anchor_cur=aobjs[cur] if cur >= 0 else None))
        a = chains[-1].chain_anchor_cur
        while a is not None:
            a.ref_id = int(r[0])
            a = a.chain_anchor_pre

    L = codes.shape[0] // 2
    fwd = Dir()
    fwd.direction = 1
    fwd.bin_read = codes[:rl].astype(np.uint8)
    fwd.buf = codes[:bl].astype(np.uint8)
    fwd.base = 0
    rev = Dir()
    rev.direction = 0
    rev.bin_read = codes[L : L + rl].astype(np.uint8)
    rev.buf = codes[:bl].astype(np.uint8)
    rev.base = L
    return idx, chains, (fwd, rev), rl


def main():
    i = int(sys.argv[1])
    trace = '--trace' in sys.argv
    idx, chains, dirs, rl = load_read(i)
    sc_hash = gr.sc_hash_idx(chains)
    rk_cache = {}
    sms = []
    for c_i, c in enumerate(chains):
        if c.sum_score == 0:
            print(f'chain {c_i}: skipped (sum 0)')
            continue
        sd = dirs[0] if dirs[0].direction == c.direction else dirs[1]
        if c.direction not in rk_cache:
            rk_cache[c.direction] = gr.ReadKmerIndex(sd.bin_read)
        rk = rk_cache[c.direction]
        qbuf, qbase = sd.buf, sd.base
        s_mid = gr.sdp_middle(c.chain_anchor_cur, idx, sms, qbuf, qbase, rk)
        if trace:
            print(f'chain {c_i}: after mid sms={[list(map(int, s)) for s in sms]}')
        s_r = gr.sdp_right(idx, sms, qbuf, qbase, rk, chains, c_i, rl,
                           sc_hash, s_mid)
        if trace:
            print(f'chain {c_i}: after right sms={[list(map(int,s)) for s in sms]}')
        s_l = gr.sdp_left(idx, sms, qbuf, qbase, rk, chains, c_i, rl,
                          sc_hash, s_r)
        c.sum_score = s_l
        print(f'chain {c_i}: mid={s_mid} right={s_r} left={s_l} '
              f'bounds q=[{c.q_st},{c.q_ed}] t=[{c.t_st},{c.t_ed}] '
              f'anum={c.anchor_number}')
    print('final rows (ref, dir, sum, anum, t_st, t_ed, q_st, q_ed, indel):')
    for c in chains:
        print(' ', [c.ref_id, c.direction, c.sum_score & 0xFFFFFFFF,
                    c.anchor_number, c.t_st & 0xFFFFFFFF,
                    c.t_ed & 0xFFFFFFFF, c.q_st & 0xFFFFFFFF,
                    c.q_ed & 0xFFFFFFFF, c.indel])


if __name__ == '__main__':
    main()
