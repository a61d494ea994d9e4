"""Replay the captured full-demo RescoreIn through rescore_kernel.

Usage: python3 tools/rescore_replay.py [--cpu] [bf ...]
Loads /tmp/rescore_in.npz (written by tools/rescore_stats.py), runs the
kernel once to compile, then times 3 runs for each requested compact
width bf. Prints wall seconds — compare against the round-1 profile
(6.3 s for this capture on the TPU).
"""
import sys
import time

sys.path.insert(0, '/root/repo')
import jax

if '--cpu' in sys.argv:
    jax.config.update('jax_platforms', 'cpu')
jax.config.update("jax_compilation_cache_dir", "/tmp/desamba_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

import desamba_tpu.engine.device.rescore as dr

d = np.load('/tmp/rescore_in.npz')
inp = dr.RescoreIn(**{f: jnp.asarray(d[f]) for f in dr.RescoreIn._fields})
ref_bin = jnp.asarray(d['ref_bin'])
ref_off = jnp.asarray(d['ref_off'])
ref_len_arr = jnp.asarray(d['ref_len_arr'])
n_bases = int(d['n_bases'])
B = inp.n_chains.shape[0]
print('B =', B, 'platform =', jax.devices()[0].platform)

def parse(a):
    if ':' in a:
        parts = [int(x) for x in a.split(':')]
        return tuple(parts) + (None,) * (3 - len(parts))
    return int(a), None, None


grid = ([parse(a) for a in sys.argv[1:] if a[0].isdigit()]
        or [(None, None, None)])
ref_out = None
for bf, bp, pp in grid:
    kw = {} if pp is None else {'pp': pp}
    t0 = time.time()
    out = jax.block_until_ready(dr.rescore_kernel(
        inp, ref_bin, ref_off, ref_len_arr, n_bases=n_bases, bf=bf, bp=bp,
        **kw))
    t_compile = time.time() - t0
    times = []
    for rep in range(3):
        # the axon relay caches (executable, inputs) -> outputs, so
        # identical repeats return in ~0 s; perturb an inert input bit
        # (schash of a lane with no chains) to force real execution
        pert = inp._replace(schash=inp.schash.at[0, 0, 0].add(rep + 1))
        jax.block_until_ready(pert)
        t0 = time.time()
        out2 = dr.rescore_kernel(
            pert, ref_bin, ref_off, ref_len_arr, n_bases=n_bases, bf=bf,
            bp=bp, **kw)
        # block_until_ready over the axon relay can resolve on dispatch
        # ack; a scalar download anchors the real completion time
        np.asarray(out2[3])
        times.append(time.time() - t0)
        del out2
    chains, fb, reason, iters = out
    if ref_out is None:
        ref_out = (np.asarray(chains), np.asarray(fb))
        match = 'ref'
    else:
        match = bool((np.asarray(chains) == ref_out[0]).all()
                     and (np.asarray(fb) == ref_out[1]).all())
    print(f'bf={bf} bp={bp} pp={pp}: wall={min(times):.3f}s '
          f'(first={t_compile:.1f}s) iters={int(iters)} '
          f'fallbacks={int(np.asarray(fb).sum())} match={match}',
          flush=True)
