"""Gold engine parity vs frozen reference outputs (tests/golden/)."""
import gzip
from pathlib import Path

import pytest

GOLDEN = Path(__file__).parent / "golden"


def _run_engine(idx, reads, fmt, n=None):
    from desamba_tpu.engine.gold.classify import ClassifyEngine, Options
    from desamba_tpu.io.sam import format_result

    eng = ClassifyEngine(idx, Options(out_format=fmt))
    out = []
    for rec in reads if n is None else reads[:n]:
        res = eng.classify_read(rec.name, rec.seq, rec.qual)
        out.append(format_result(res, idx.ref_name, eng.opts))
    return "".join(out)


@pytest.fixture(scope="session")
def demo_reads(demo_files):
    from desamba_tpu.io.fastx import read_fastx

    return list(read_fastx(str(demo_files[1])))


def test_sam_parity_subset(demo_my_index, demo_reads):
    """First 150 reads, SAM format, byte-identical to the reference binary.

    Reads must be processed from the start of the file in order: the
    max_read_l filter state is stream-dependent (src/cly.h:157).
    """
    got = _run_engine(demo_my_index, demo_reads, "SAM", n=150)
    golden = (GOLDEN / "demo_viral.sam").read_text()
    names = {r.name for r in demo_reads[:150]}
    expected = "".join(
        l + "\n" for l in golden.splitlines() if l.split("\t")[0] in names
    )
    assert got == expected


@pytest.mark.slow
def test_sam_parity_full(demo_my_index, demo_reads):
    got = _run_engine(demo_my_index, demo_reads, "SAM")
    assert got == (GOLDEN / "demo_viral.sam").read_text()


@pytest.mark.slow
def test_des_parity_full(demo_my_index, demo_reads):
    got = _run_engine(demo_my_index, demo_reads, "DES")
    assert got == gzip.decompress((GOLDEN / "demo_viral.des.gz").read_bytes()).decode()


@pytest.mark.slow
def test_sam_full_parity(demo_my_index, demo_reads):
    got = _run_engine(demo_my_index, demo_reads, "SAM_FULL")
    assert got == gzip.decompress(
        (GOLDEN / "demo_viral_full.sam.gz").read_bytes()).decode()
