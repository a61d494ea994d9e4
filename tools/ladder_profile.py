"""Intra-ladder cost split on captured demo lane groups.

Captures every _k_ladder call's inputs during one demo classify, then
re-times the fast/slow ladder kernels in variants:
  full      — as shipped
  nomap     — map_seed_lanes stubbed (probe + walks + compaction only)
  noprobe   — mem_probe stubbed (compaction + loop skeleton only)
The deltas attribute the ladder wall to map_seed vs probe vs skeleton.

Usage: python3 tools/ladder_profile.py [--tpu] [N]
"""
import sys
import time

sys.path.insert(0, '/root/repo')
import jax

if '--tpu' not in sys.argv:
    jax.config.update('jax_platforms', 'cpu')
jax.config.update("jax_compilation_cache_dir", "/tmp/desamba_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from desamba_tpu.index.store import load_index
from desamba_tpu.engine.gold.classify import Options
from desamba_tpu.engine.device.classifier import DeviceClassifier
from desamba_tpu.io.fastx import read_fastx
import desamba_tpu.engine.device.ladder as lad
import desamba_tpu.engine.device.fm as dfm
import desamba_tpu.engine.device.mapseed as dms

args = [a for a in sys.argv[1:] if not a.startswith('--')]
N = int(args[0]) if args else 1237
idx = load_index('/tmp/desamba_test_cache/index_viral_ours')
reads = list(read_fastx('/tmp/desamba_test_cache/demo/ERR1050068.fastq'))[:N]
eng = DeviceClassifier(idx, Options())

CAP = []
orig_k = DeviceClassifier._k_ladder


def spy(self, kind, codes_fr, buf_len, pre13, lane_args, NB):
    CAP.append((kind, codes_fr, buf_len, pre13, lane_args, NB))
    return orig_k(self, kind, codes_fr, buf_len, pre13, lane_args, NB)


DeviceClassifier._k_ladder = spy
list(eng.classify_reads(reads))
DeviceClassifier._k_ladder = orig_k
print(f"captured {len(CAP)} ladder calls "
      f"({sum(1 for c in CAP if c[0]=='fast')} fast)")

dix = eng.dix
ixr = eng.ixr


PASS = [0]


def _one_pass(measure):
    # the axon relay memoizes (executable, inputs) -> outputs: perturb a
    # code char per pass so every timed call really executes
    PASS[0] += 1
    pp = PASS[0]
    t0 = time.perf_counter()
    for kind, codes_fr, buf_len, pre13, lane_args, NB in CAP:
        cf = codes_fr.at[0, 0].set((codes_fr[0, 0] + pp) & 3)
        a = (ixr, dix.fm_blocks, dix.rank, dix.hash13, cf, buf_len,
             pre13, dix.q_mem, dix.q_lv, *lane_args)
        kw = dict(l_ek=idx.len_e_kmer, a_cap=lad_a_cap, pack_cap=2 * NB,
                  bl=min(128, NB))
        if kind == "fast":
            out = lad.fast_ladder(*a, **kw)
        else:
            out = lad.slow_ladder(*a, m_cap=lad_m_cap, **kw)
        jax.device_get(out)    # the relay's block_until_ready does not
                               # actually wait; only value fetch does
    return time.perf_counter() - t0


def run_all(tag):
    _one_pass(False)            # compile + warm
    dt = min(_one_pass(True) for _ in range(2))
    print(f"  {tag:10s} {dt:6.2f}s")
    return dt


from desamba_tpu.engine.device.classifier import A_CAP as lad_a_cap
from desamba_tpu.engine.device.classifier import M_CAP as lad_m_cap

full = run_all("full")

# ---- nomap: stub map_seed_lanes -------------------------------------------
orig_map = lad.map_seed_lanes


def stub_map(ix, codes_pk, buf_len, q_mem, q_lv, ridx, base, read_len,
             direction, seed_id, sp_row, l_m0, sa_ok, sa_row, sa_l, q_off,
             active, anchors, a_cnt, a_cap, occ_cap=1000):
    ms = jnp.where(active, 36, 0)  # pretend score 36 (advances stride -7)
    return anchors, a_cnt, ms


lad.map_seed_lanes = stub_map
lad.fast_ladder = jax.jit(lad.fast_ladder.__wrapped__,
                          static_argnames=("l_ek", "a_cap", "pack_cap", "bl"))
lad.slow_ladder = jax.jit(lad.slow_ladder.__wrapped__,
                          static_argnames=("l_ek", "a_cap", "m_cap",
                                           "pack_cap", "bl"))
nomap = run_all("nomap")
lad.map_seed_lanes = orig_map

# ---- noprobe: stub mem_probe ---------------------------------------------
orig_probe = dfm.mem_probe


def stub_probe(ixr_, fm_blocks, rank6, hash13, codes, codes_pk, str_idx,
               pre_v, active, spset, spcount, max_rst, l_min_mth,
               col_off=None, row_idx=None, sa_cap=16):
    N = str_idx.shape[0]
    R = max_rst
    z = jnp.zeros((N, R), jnp.int32)
    zu = jnp.zeros((N, R), jnp.uint32)
    zb = jnp.zeros((N, R), bool)
    return z, zu, zu, zb, z, zb, spset, spcount


stub_probe.__wrapped__ = stub_probe   # ladder calls .__wrapped__
dfm.mem_probe = stub_probe
lad.dev_fm.mem_probe = stub_probe
lad.fast_ladder = jax.jit(lad.fast_ladder.__wrapped__,
                          static_argnames=("l_ek", "a_cap", "pack_cap", "bl"))
lad.slow_ladder = jax.jit(lad.slow_ladder.__wrapped__,
                          static_argnames=("l_ek", "a_cap", "m_cap",
                                           "pack_cap", "bl"))
noprobe = run_all("noprobe")

print(f"map_seed share ~ {full - nomap:.2f}s; probe share ~ "
      f"{nomap - noprobe:.2f}s; skeleton ~ {noprobe:.2f}s")
