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


def capture(inp, ref_bin, ref_off, ref_len_arr, n_bases, **kw):
    # keep the LARGEST batch (the main batch, not the M3 sub-batch)
    if 'inp' not in cap or inp.n_chains.shape[0] > cap['inp'].n_chains.shape[0]:
        cap['inp'] = inp
        cap['args'] = (ref_bin, ref_off, ref_len_arr, n_bases)
    return orig_kernel(inp, ref_bin, ref_off, ref_len_arr, n_bases, **kw)


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

# ---- instrumented kernel: trips per lane + fetch mode / window stats -------
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
    # counters: [fetch_mid, fetch_right, fetch_left, proc_active,
    #            micro_any_active]; winhist: t_len buckets of 64
    cnt0 = jnp.zeros((5,), jnp.int64)
    wh0 = jnp.zeros((12,), jnp.int64)

    def cond(c_st):
        it, st, fin, cnt, wh = c_st
        return (it < dr.MAX_ITERS) & ((st.mode != dr.M_DONE)
                                      & ~st.fallback).any()

    def body(c_st):
        it, st, fin, cnt, wh = c_st

        def micro(_k, s_c):
            s, cnt = s_c
            proc = (((s.mode == dr.M_RIGHT) | (s.mode == dr.M_LEFT)
                     | (s.mode == dr.M_MID))
                    & ~s.need_fetch & (s.cur_sms < s.n_sms))
            cnt = cnt.at[3].add(jnp.sum(proc))
            cnt = cnt.at[4].add(jnp.sum(((s.mode != dr.M_DONE)
                                         & ~s.need_fetch & ~s.fallback)))
            return dr._proc_micro(s, inp), cnt

        st, cnt = jax.lax.fori_loop(0, dr.PROC_PER_ITER, micro, (st, cnt))
        # replicate fetch-side geometry for stats
        lanes = jnp.arange(B, dtype=jnp.int32)
        ci = jnp.clip(st.chain_i, 0, dr.C_CAP - 1)
        is_mid = st.mode == dr.M_MID
        is_r = st.mode == dr.M_RIGHT
        is_l = st.mode == dr.M_LEFT
        act = st.need_fetch & ~st.fallback & (is_mid | is_r | is_l)
        cnt = cnt.at[0].add(jnp.sum(act & is_mid))
        cnt = cnt.at[1].add(jnp.sum(act & is_r))
        cnt = cnt.at[2].add(jnp.sum(act & is_l))
        mc = jnp.clip(st.mid_cur, 0, dr.A_CAP - 1)
        cur_a = inp.anchors[lanes, mc]
        pre_i = jnp.clip(cur_a[:, 3], 0, dr.A_CAP - 1)
        pre_a = inp.anchors[lanes, pre_i]
        trl = cur_a[:, 1] - (pre_a[:, 1] - 3 + pre_a[:, 2]) + 3
        t_len = jnp.where(is_mid, trl, 600)
        bucket = jnp.clip(t_len // 64, 0, 11)
        wh = wh + jnp.sum(
            (bucket[:, None] == jnp.arange(12)[None, :]) & act[:, None],
            axis=0).astype(jnp.int64)
        st = dr._fetch_step(st, inp, rk_tables, dr._pack2(inp.codes_fr),
                            dr._ref_as_rows(ref_bin), ref_bin, ref_off,
                            ref_len_arr, n_bases, B)
        live = (st.mode != dr.M_DONE) & ~st.fallback
        fin = jnp.where(live, it + 1, fin)
        return it + 1, st, fin, cnt, wh

    it, st, fin, cnt, wh = jax.lax.while_loop(
        cond, body, (jnp.int32(0), st, z, cnt0, wh0))
    return it, fin, cnt, wh


t0 = time.time()
it, fin, cnt, wh = jax.block_until_ready(kernel_trips(
    inp, ref_bin, ref_off, ref_len_arr, n_bases))
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
cnt = np.asarray(cnt)
print('fetch events: mid=%d right=%d left=%d' % (cnt[0], cnt[1], cnt[2]))
print('proc-node micro-steps (lane-steps): %d; live&ready lane-steps: %d'
      % (cnt[3], cnt[4]))
print('fetch window t_len histogram (64-char buckets):',
      np.asarray(wh).tolist())
