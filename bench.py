"""End-to-end benchmark: demo classify throughput vs the measured reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N/BASELINE}

Baseline: reference binary, 4 threads, demo viral index + ERR1050068.fastq
on this machine = 10,060 reads/s (BASELINE.md).
"""
from __future__ import annotations

import json
import os
import sys
import time
import zipfile
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_READS_PER_S = 10060.0
CACHE = Path(os.environ.get("DESAMBA_TEST_CACHE", "/tmp/desamba_test_cache"))
REFERENCE = Path("/root/reference")


def _demo_files():
    d = CACHE / "demo"
    fa, fq = d / "viral-gs.fa", d / "ERR1050068.fastq"
    if not (fa.exists() and fq.exists()):
        d.mkdir(parents=True, exist_ok=True)
        for z in ["viral-gs.zip", "ERR1050068.zip"]:
            with zipfile.ZipFile(REFERENCE / "demo" / z) as zf:
                zf.extractall(d)
    return fa, fq


def _demo_index(fa):
    from desamba_tpu.index.build import build_index
    from desamba_tpu.index.store import load_index, save_index

    out = CACHE / "index_viral_ours"
    if (out / "meta.json").exists():
        return load_index(str(out))
    idx = build_index(str(fa))
    save_index(idx, str(out))
    return idx


def main():
    # Watchdog: device dispatches over the tunnel can hang; run the real
    # bench in a child and fall back to the gold engine on timeout.
    if (os.environ.get("DESAMBA_BENCH_CHILD") != "1"
            and os.environ.get("DESAMBA_BENCH_ENGINE", "auto") == "auto"):
        import subprocess

        env = dict(os.environ, DESAMBA_BENCH_CHILD="1")
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, timeout=2400, capture_output=True,
                               text=True)
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if r.returncode == 0 and line:
                print(line[-1])
                return
            sys.stderr.write(r.stderr[-2000:])
        except subprocess.TimeoutExpired:
            print("bench child timed out; falling back to gold",
                  file=sys.stderr)
        os.environ["DESAMBA_BENCH_ENGINE"] = "gold"
    _bench()


def _bench():
    fa, fq = _demo_files()
    idx = _demo_index(fa)

    from desamba_tpu.engine.gold.classify import Options
    from desamba_tpu.io.fastx import read_fastx
    from desamba_tpu.io.sam import format_result

    opts = Options()
    reads = list(read_fastx(str(fq)))
    engine_name = os.environ.get("DESAMBA_BENCH_ENGINE", "auto")
    eng = None
    if engine_name in ("auto", "device"):
        try:
            from desamba_tpu.engine.device.classifier import DeviceClassifier

            eng = DeviceClassifier(idx, opts)
            engine_name = "device"
        except ImportError:
            if engine_name == "device":
                raise
    if eng is None:
        from desamba_tpu.engine.gold.classify import ClassifyEngine

        eng = ClassifyEngine(idx, opts)
        engine_name = "gold"

    out_lines = []
    t0 = time.time()
    if engine_name == "device":
        try:
            # full warm-up pass: compiles every production shape outside
            # the timed region (programs are shape-bucketed + disk-cached)
            warm = list(eng.classify_reads(reads))
            del warm
            eng.state.max_read_l = 0
            t0 = time.time()
            for res in eng.classify_reads(reads):
                out_lines.append(format_result(res, idx.ref_name, opts))
        except Exception as e:
            print(f"device engine failed ({e!r}); falling back to gold",
                  file=sys.stderr)
            from desamba_tpu.engine.gold.classify import ClassifyEngine

            eng = ClassifyEngine(idx, opts)
            engine_name = "gold"
    if engine_name != "device":
        t0 = time.time()
        for rec in reads:
            res = eng.classify_read(rec.name, rec.seq, rec.qual)
            out_lines.append(format_result(res, idx.ref_name, opts))
    dt = time.time() - t0

    # sanity: compare against the frozen golden SAM when present
    golden = Path(__file__).parent / "tests" / "golden" / "demo_viral.sam"
    parity = None
    if golden.exists():
        parity = "".join(out_lines) == golden.read_text()

    n = len(reads)
    val = n / dt
    print(json.dumps({
        "metric": f"demo_classify_{engine_name}",
        "value": round(val, 2),
        "unit": "reads/s",
        "vs_baseline": round(val / BASELINE_READS_PER_S, 4),
        "n_reads": n,
        "seconds": round(dt, 3),
        "sam_parity": parity,
    }))


if __name__ == "__main__":
    main()
