"""Capture RescoreIn from a demo run and measure per-lane VM trip counts.

Usage: python3 tools/rescore_stats.py [--tpu]
Dumps /tmp/rescore_in.npz on first run; prints the distribution of outer
while_loop iterations each lane needs (drives the lane-compaction design).
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
import desamba_tpu.engine.device.rescore as dr
from desamba_tpu.io.fastx import read_fastx

idx = load_index('/tmp/desamba_test_cache/index_viral_ours')
reads = list(read_fastx('/tmp/desamba_test_cache/demo/ERR1050068.fastq'))
eng = DeviceClassifier(idx, Options())

cap = {}
orig_kernel = dr.rescore_kernel


def capture(inp, ref_bin, ref_off, ref_len_arr, n_bases):
    cap['inp'] = inp
    cap['args'] = (ref_bin, ref_off, ref_len_arr, n_bases)
    return orig_kernel(inp, ref_bin, ref_off, ref_len_arr, n_bases)


import desamba_tpu.engine.device.classifier as C
C.dr.rescore_kernel = capture
list(eng.classify_reads(reads))
C.dr.rescore_kernel = orig_kernel

inp = cap['inp']
ref_bin, ref_off, ref_len_arr, n_bases = cap['args']
np.savez('/tmp/rescore_in.npz',
         **{f: np.asarray(getattr(inp, f)) for f in inp._fields},
         ref_bin=np.asarray(ref_bin), ref_off=np.asarray(ref_off),
         ref_len_arr=np.asarray(ref_len_arr), n_bases=n_bases)
B = inp.n_chains.shape[0]
print('captured B =', B, 'real lanes =', int((np.asarray(inp.n_chains) > 0).sum()))

# ---- instrumented kernel: record the iteration each lane finishes ----------
import functools


@functools.partial(jax.jit, static_argnames=("n_bases",))
def kernel_trips(inp, ref_bin, ref_off, ref_len_arr, n_bases):
    B = inp.n_chains.shape[0]
    z = jnp.zeros((B,), jnp.int32)
    st = dr.VMState(
        mode=jnp.where(inp.n_chains > 0, dr.M_NEXT, dr.M_DONE), chain_i=z - 1,
        chains=inp.chains, side_total=z, score_ori=z, c_t_off=z,
        last_search=jnp.zeros((B,), bool),
        sms=jnp.zeros((B, dr.S_CAP, 4), jnp.int32),
        n_sms=z, cur_sms=z, max_id=z, mid_cur=z - 1, mid_score=z,
        mid_is_combine=jnp.zeros((B,), bool), save_side=z, save_nodemax=z,
        save_len=z, fallback=jnp.zeros((B,), bool), fb_reason=z,
        need_fetch=jnp.zeros((B,), bool))
    rk_tables = dr._build_rk_tables(inp.codes_fr, inp.read_len)

    def cond(c_st):
        it, st, fin = c_st
        return (it < dr.MAX_ITERS) & ((st.mode != dr.M_DONE)
                                      & ~st.fallback).any()

    def body(c_st):
        it, st, fin = c_st
        st = jax.lax.fori_loop(0, dr.PROC_PER_ITER,
                               lambda _k, s: dr._proc_micro(s, inp), st)
        st = dr._fetch_step(st, inp, rk_tables, ref_bin, ref_off,
                            ref_len_arr, n_bases)
        live = (st.mode != dr.M_DONE) & ~st.fallback
        fin = jnp.where(live, it + 1, fin)
        return it + 1, st, fin

    it, st, fin = jax.lax.while_loop(cond, body, (jnp.int32(0), st, z))
    return it, fin


t0 = time.time()
it, fin = jax.block_until_ready(kernel_trips(inp, ref_bin, ref_off,
                                             ref_len_arr, n_bases))
print('instrumented kernel wall:', round(time.time() - t0, 2), 's  it =',
      int(it))
fin = np.asarray(fin)
real = np.asarray(inp.n_chains) > 0
f = fin[real]
print('trip quantiles (real lanes):',
      {q: int(np.quantile(f, q)) for q in (0.5, 0.75, 0.9, 0.95, 0.99, 1.0)})
hist = np.bincount(f)
alive = len(f) - np.cumsum(hist)
print('lanes still live after iter k (k: n):',
      {k: int(alive[k]) for k in range(0, len(alive), max(1, len(alive) // 15))})
