import sys, time
sys.path.insert(0,'/root/repo')
import jax
if '--tpu' not in sys.argv:
    jax.config.update('jax_platforms','cpu')
jax.config.update("jax_compilation_cache_dir", "/tmp/desamba_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from desamba_tpu.index.store import load_index
from desamba_tpu.engine.gold.classify import Options
from desamba_tpu.engine.device.classifier import DeviceClassifier
from desamba_tpu.io.fastx import read_fastx
from desamba_tpu.io.sam import format_result

args=[a for a in sys.argv[1:] if a != '--tpu']
N = int(args[0]) if args else 300
idx = load_index('/tmp/desamba_test_cache/index_viral_ours')
reads = list(read_fastx('/tmp/desamba_test_cache/demo/ERR1050068.fastq'))[:N]
eng = DeviceClassifier(idx, Options())

import desamba_tpu.engine.device.classifier as C
T = {}
def wrap(obj, name):
    orig = getattr(obj, name)
    def f(*a, **k):
        t0=time.perf_counter(); r = orig(*a, **k); T[name] = T.get(name,0)+time.perf_counter()-t0
        return r
    setattr(obj, name, f)
wrap(DeviceClassifier, '_islands')
wrap(DeviceClassifier, '_run_ladder')
wrap(DeviceClassifier, '_device_rescore')

# warm
list(eng.classify_reads(reads))
T.clear(); eng.state.max_read_l = 0
t0=time.time()
out = [format_result(r, idx.ref_name, Options()) for r in eng.classify_reads(reads)]
wall = time.time()-t0
print("CPU steady pass:", round(wall,2), "s =", round(N/wall,1), "reads/s")
print({k: round(v,2) for k,v in T.items()})
print("host other:", round(wall - sum(T.values()),2))
