"""Grid the ladder kernels' compact width bl over full demo classifies.

Usage: python3 tools/ladder_replay.py [--cpu] BL... (0 = default bl)
For each bl: one warm-up classify pass (compiles), then a timed pass;
prints ladder device seconds + total wall. SAM parity is implied by the
classifier's own differential tests — this tool only times.
"""
import sys
import time

sys.path.insert(0, '/root/repo')
import jax

if '--cpu' in sys.argv:
    jax.config.update('jax_platforms', 'cpu')
jax.config.update("jax_compilation_cache_dir", "/tmp/desamba_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from desamba_tpu.index.store import load_index
from desamba_tpu.engine.gold.classify import Options
from desamba_tpu.engine.device.classifier import DeviceClassifier
from desamba_tpu.io.fastx import read_fastx
import desamba_tpu.engine.device.ladder as lad
import desamba_tpu.engine.device.classifier as C

idx = load_index('/tmp/desamba_test_cache/index_viral_ours')
reads = list(read_fastx('/tmp/desamba_test_cache/demo/ERR1050068.fastq'))
eng = DeviceClassifier(idx, Options())

bls = [int(a) for a in sys.argv[1:] if a.lstrip('-').isdigit()] or [0]
orig_fast, orig_slow = lad.fast_ladder, lad.slow_ladder
T = {'dev': 0.0}


def timed(fn, kw):
    def f(*a, **k):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*a, **{**k, **kw}))
        T['dev'] += time.perf_counter() - t0
        return out
    return f


for bl in bls:
    kw = {} if bl == 0 else {'bl': bl}
    C.fast_ladder = timed(orig_fast, kw)
    C.slow_ladder = timed(orig_slow, kw)
    list(eng.classify_reads(reads))     # warm-up/compile
    eng.state.max_read_l = 0
    T['dev'] = 0.0
    t0 = time.time()
    list(eng.classify_reads(reads))
    wall = time.time() - t0
    eng.state.max_read_l = 0
    print(f'bl={bl}: ladder_dev={T["dev"]:.2f}s total={wall:.2f}s '
          f'({len(reads)/wall:.0f} reads/s)', flush=True)
