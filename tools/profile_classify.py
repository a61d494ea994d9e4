"""Per-stage wall-time profile of the device classify pipeline.

Usage: python3 tools/profile_classify.py [N] [--tpu]
Wraps the DeviceClassifier stage methods and the host finish helpers so
the steady-state pass prints a stage breakdown (device dispatch+sync
time vs host Python time).
"""
import sys
import time

sys.path.insert(0, '/root/repo')
import jax

if '--tpu' not in sys.argv:
    jax.config.update('jax_platforms', 'cpu')
jax.config.update("jax_compilation_cache_dir", "/tmp/desamba_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from desamba_tpu.index.store import load_index
from desamba_tpu.engine.gold.classify import Options
from desamba_tpu.engine.device.classifier import DeviceClassifier
from desamba_tpu.io.fastx import read_fastx
from desamba_tpu.io.sam import format_result

args = [a for a in sys.argv[1:] if a != '--tpu']
N = int(args[0]) if args else 300
idx = load_index('/tmp/desamba_test_cache/index_viral_ours')
_src = '/tmp/desamba_test_cache/demo/ERR1050068_x8.fastq' if N > 1237 else '/tmp/desamba_test_cache/demo/ERR1050068.fastq'
reads = list(read_fastx(_src))[:N]
eng = DeviceClassifier(idx, Options())

T = {}


def wrap(obj, name, key=None):
    orig = getattr(obj, name)
    k = key or name

    def f(*a, **kw):
        t0 = time.perf_counter()
        r = orig(*a, **kw)
        T[k] = T.get(k, 0) + time.perf_counter() - t0
        return r
    setattr(obj, name, f)


wrap(DeviceClassifier, '_islands')
wrap(DeviceClassifier, '_dispatch_ladder_group', 'ladder_dispatch')
wrap(DeviceClassifier, '_run_ladder', 'ladder_total')

import desamba_tpu.engine.device.classifier as C
import desamba_tpu.engine.device.chain as dchain_mod
import desamba_tpu.engine.device.rescore as dr_mod
import desamba_tpu.engine.gold.chain as chain_mod
import desamba_tpu.engine.gold.rescore as resc_mod

for _nm in ('chain_step', 'prep_rescore'):
    _orig = getattr(dchain_mod, _nm)

    def _mk_dev(orig, nm):
        def f(*a, **kw):
            t0 = time.perf_counter()
            import jax as _j
            r = _j.block_until_ready(orig(*a, **kw))
            T[nm + '_device'] = (T.get(nm + '_device', 0)
                                 + time.perf_counter() - t0)
            return r
        return f
    setattr(dchain_mod, _nm, _mk_dev(_orig, _nm))
C.dc.chain_step = dchain_mod.chain_step
C.dc.prep_rescore = dchain_mod.prep_rescore

_rk = dr_mod.rescore_kernel


def _rk_timed(*a, **kw):
    t0 = time.perf_counter()
    r = _rk(*a, **kw)
    import jax as _j
    r = _j.block_until_ready(r)
    T['rescore_device'] = T.get('rescore_device', 0) + time.perf_counter() - t0
    return r


C.dr.rescore_kernel = _rk_timed

_bp = C._bloom_packed


def _bp_timed(*a, **kw):
    t0 = time.perf_counter()
    r = _bp(*a, **kw)
    T['bloom_dispatch'] = (T.get('bloom_dispatch', 0)
                           + time.perf_counter() - t0)
    return r


C._bloom_packed = _bp_timed

for mod, fn in ((resc_mod, 'post_rescore_finish'),
                (resc_mod, 'detect_primary')):
    orig = getattr(mod, fn)

    def mk(orig, fn):
        def f(*a, **kw):
            t0 = time.perf_counter()
            r = orig(*a, **kw)
            T[fn] = T.get(fn, 0) + time.perf_counter() - t0
            return r
        return f
    setattr(mod, fn, mk(orig, fn))
    if hasattr(C, fn):
        setattr(C, fn, getattr(mod, fn))

# warm
list(eng.classify_reads(reads))
T.clear()
eng.state.max_read_l = 0
t0 = time.time()
out = [format_result(r, idx.ref_name, Options()) for r in eng.classify_reads(reads)]
wall = time.time() - t0
print("steady pass:", round(wall, 2), "s =", round(N / wall, 1), "reads/s")
for k, v in sorted(T.items(), key=lambda kv: -kv[1]):
    print(f"  {k:24s} {v:7.2f}s")
print(f"  {'(unattributed host)':24s} {wall - sum(T.values()):7.2f}s")
