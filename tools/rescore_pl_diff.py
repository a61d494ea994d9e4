"""Differential: per-read Pallas rescore vs the XLA VM oracle.

Usage: python3 tools/rescore_pl_diff.py [N] [--tpu] [--start S]
Loads the captured full-demo batch (/tmp/rescore_in.npz, written by
tools/rescore_stats.py), runs both kernels on reads [S, S+N) and
compares (chains, fallback) on reads where NEITHER falls back.
Default interpret-mode on CPU for fast semantics iteration.
"""
import sys
import time

sys.path.insert(0, '/root/repo')
import jax

tpu = '--tpu' in sys.argv
if not tpu:
    jax.config.update('jax_platforms', 'cpu')
jax.config.update("jax_compilation_cache_dir", "/tmp/desamba_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

import desamba_tpu.engine.device.rescore as dr
import desamba_tpu.engine.device.rescore_pl as drp
from desamba_tpu.engine.device.textwalk import pack2

args = [a for a in sys.argv[1:] if not a.startswith('--')]
N = int(args[0]) if args else 8
S = 0
if '--start' in sys.argv:
    S = int(sys.argv[sys.argv.index('--start') + 1])

d = np.load('/tmp/rescore_in.npz')
sl = slice(S, S + N)
inp = dr.RescoreIn(**{f: jnp.asarray(d[f][sl]) for f in dr.RescoreIn._fields})
ref_bin = jnp.asarray(d['ref_bin'])
ref_off = jnp.asarray(d['ref_off'])
ref_len_arr = jnp.asarray(d['ref_len_arr'])
n_bases = int(d['n_bases'])

# packed-word reference (textwalk layout) from ref_bin bytes
rb = np.asarray(d['ref_bin'])
chars = np.zeros(len(rb) * 4, np.uint8)
for k in range(4):
    chars[k::4] = (rb >> (6 - 2 * k)) & 3
ref_pk = np.asarray(pack2(jnp.asarray(chars[None, :])))
print(f'reads [{S},{S+N}) n_bases={n_bases} ref_pk words={ref_pk.shape[1]}')

t0 = time.time()
vm_ch, vm_fb, vm_re, vm_it = jax.block_until_ready(dr.rescore_kernel(
    inp, ref_bin, ref_off, ref_len_arr, n_bases=n_bases))
print(f'VM: {time.time()-t0:.1f}s fallbacks={int(np.asarray(vm_fb).sum())}')

t0 = time.time()
pl_ch, pl_fb, pl_re, pl_it, pl_flg = jax.block_until_ready(drp.rescore_kernel_pl(
    inp, jnp.asarray(ref_pk), ref_off, ref_len_arr, n_bases=n_bases,
    interpret=not tpu))
print(f'PL: {time.time()-t0:.1f}s fallbacks={int(np.asarray(pl_fb).sum())} '
      f'reasons={np.unique(np.asarray(pl_re)).tolist()}')

vm_ch, vm_fb = np.asarray(vm_ch), np.asarray(vm_fb)
pl_ch, pl_fb = np.asarray(pl_ch), np.asarray(pl_fb)
real = np.asarray(inp.n_chains) > 0
both = ~vm_fb & ~pl_fb & real
print(f'real={int(real.sum())} both-ok={int(both.sum())} '
      f'vm-only-fb={int((vm_fb & ~pl_fb & real).sum())} '
      f'pl-only-fb={int((pl_fb & ~vm_fb & real).sum())}')
bad = 0
for i in np.flatnonzero(both):
    if not (vm_ch[i] == pl_ch[i]).all():
        bad += 1
        if bad <= 5:
            dcols = np.argwhere(vm_ch[i] != pl_ch[i])
            print(f'read {S+i}: MISMATCH at (chain,field) '
                  f'{dcols[:8].tolist()}')
            for c, f in dcols[:4]:
                print(f'   [{c},{f}] vm={vm_ch[i,c,f]} pl={pl_ch[i,c,f]}')
print(f'mismatched reads: {bad}/{int(both.sum())}')
sys.exit(1 if bad else 0)
