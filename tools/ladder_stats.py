"""Workload statistics of the fast/slow ladders on the demo corpus.

Counts, per (read, direction, island) lane and per read: probes,
FM interval-phase steps, row walks + their LCE lengths, map_seed calls,
occurrence fan-outs and get_new_ed activity — the numbers that size a
per-read Pallas ladder kernel. Runs the PYTHON oracle (native disabled)
with counting wrappers, so it is slow; use a subset (default 300 reads).

Usage: python3 tools/ladder_stats.py [N]
"""
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, '/root/repo')

from desamba_tpu.io import native
native.available = lambda: False          # force the python oracle

import desamba_tpu.engine.gold.fm as gfm
import desamba_tpu.engine.gold.mapseed as gms
import desamba_tpu.engine.gold.fastslow as gfs
from desamba_tpu.engine.gold.classify import ClassifyEngine, Options
from desamba_tpu.index.store import load_index
from desamba_tpu.io.fastx import read_fastx

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300
idx = load_index('/tmp/desamba_test_cache/index_viral_ours')
reads = list(read_fastx('/tmp/desamba_test_cache/demo/ERR1050068.fastq'))[:N]

S = Counter()
H = {'probe_steps': Counter(), 'walk_len': Counter(), 'occ': Counter(),
     'probes_per_island': Counter(), 'islands_per_read': Counter(),
     'mems_per_probe': Counter()}

_orig_mem = gfs.bwt_mem_search


def mem_search(fm, string, str_i, pre_v, max_rst, l_min, l_max, sp_set, out):
    S['probes'] += 1
    n0 = len(out)
    # count interval steps by replaying the interval loop cheaply:
    # instrument occ_prefix reads instead
    c0 = S['occ_reads']
    r = _orig_mem(fm, string, str_i, pre_v, max_rst, l_min, l_max, sp_set, out)
    S['mems'] += len(out) - n0
    H['mems_per_probe'][len(out) - n0] += 1
    H['probe_steps'][(S['occ_reads'] - c0) // 2] += 1
    return r


class OccCount:
    def __init__(self, op):
        self.op = op

    def __getitem__(self, key):
        S['occ_reads'] += 1
        return self.op[key]


_orig_occp = gfm.FM.occ_prefix


def occ_prefix(self):
    return OccCount(_orig_occp.fget(self))


gfm.FM.occ_prefix = property(occ_prefix)
gfs.bwt_mem_search = mem_search
# count single-row walks via bwt_single_search
_orig_single = gfm.bwt_single_search


def single(fm, sp, string, str_i, max_match_len, sp_set, rst):
    S['row_walks'] += 1
    _orig_single(fm, sp, string, str_i, max_match_len, sp_set, rst)
    H['walk_len'][max(0, rst.match_len)] += 1


gfm.bwt_single_search = single
# patch the copy bwt_mem_search holds
import desamba_tpu.engine.gold.fm as _g
_g.bwt_single_search = single

_orig_map = gfs.map_seed


def map_seed(idx_, fm, loc, q_mem, q_lv, r, buf, base, read_len, si, d,
             anchors, super_repeat):
    S['map_seed'] += 1
    n0 = len(anchors)
    out = _orig_map(idx_, fm, loc, q_mem, q_lv, r, buf, base, read_len, si,
                    d, anchors, super_repeat)
    H['occ'][len(anchors) - n0] += 1
    S['anchors'] += len(anchors) - n0
    return out


gfs.map_seed = map_seed

_orig_fast = gfs.fast_classify


def fast_classify(idx_, fm, loc, q_mem, q_lv, sd, read_len, anchors,
                  trace=None):
    S['fast_calls'] += 1
    p0 = S['probes']
    n_isl = sum(1 for s in sd.seeds if s[2])
    H['islands_per_read'][n_isl] += 1
    return _orig_fast(idx_, fm, loc, q_mem, q_lv, sd, read_len, anchors,
                      trace)


eng = ClassifyEngine(idx, Options())
for i, rec in enumerate(reads):
    eng.classify_read(rec.name, rec.seq, rec.qual)

print(f"reads={N}")
for k in sorted(S):
    print(f"  {k:14s} {S[k]:>10d}  ({S[k]/N:.1f}/read)")


def pct(h, q):
    tot = sum(h.values())
    acc = 0
    for k in sorted(h):
        acc += h[k]
        if acc >= q * tot:
            return k
    return max(h) if h else 0


for name, h in H.items():
    if not h:
        continue
    print(f"  {name}: p50={pct(h, .5)} p90={pct(h, .9)} p99={pct(h, .99)} "
          f"max={max(h)} n={sum(h.values())}")
