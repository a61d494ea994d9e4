import sys, time
sys.path.insert(0,'/root/repo')
import jax
import numpy as np
from desamba_tpu.index.store import load_index
from desamba_tpu.engine.gold.classify import Options
from desamba_tpu.engine.device.classifier import DeviceClassifier
from desamba_tpu.io.fastx import read_fastx

mult = int(sys.argv[1]) if len(sys.argv) > 1 else 8
idx = load_index('/tmp/desamba_test_cache/index_viral_ours')
reads = list(read_fastx('/tmp/desamba_test_cache/demo/ERR1050068.fastq'))
class R:
    def __init__(s, name, seq, qual): s.name, s.seq, s.qual = name, seq, qual
big = []
for m in range(mult):
    for r in reads:
        big.append(R(f"{r.name}_{m}", r.seq, r.qual))
eng = DeviceClassifier(idx, Options(), batch_size=len(big))
t0=time.time(); out = list(eng.classify_reads(big)); warm = time.time()-t0
print(f"warm ({len(big)} reads): {warm:.1f}s", flush=True)
eng.state.max_read_l = 0
t0=time.time(); out = list(eng.classify_reads(big)); dt = time.time()-t0
print(f"x{mult} demo: {len(big)} reads in {dt:.1f}s = {len(big)/dt:.1f} reads/s")
