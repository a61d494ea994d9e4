"""Cross-tool comparator parsers vs the reference binary.

Synthesizes minimap2-PAF / centrifuge / kaiju outputs over the golden
nodes.dmp tid set and asserts our `analysis` modes print byte-identical
reports to the reference binary on the same files (src/analysis.c:601,
823, 895 parsers + ana_meta/ana_tax sinks)."""
import io
import subprocess
from pathlib import Path

import numpy as np
import pytest

NODES = Path(__file__).parent / "golden" / "nodes.dmp"


@pytest.fixture(scope="module")
def tids():
    out = []
    for line in NODES.read_text().splitlines():
        t = line.split("\t|\t")
        if len(t) >= 3 and t[2].strip("\t| ") == "species":
            out.append(int(t[0]))
    return out[:40]


@pytest.fixture(scope="module")
def sample_files(tids, tmp_path_factory):
    rng = np.random.default_rng(13)
    d = tmp_path_factory.mktemp("cmpfiles")

    cen = d / "cen.out"
    with open(cen, "w") as f:
        f.write("readID\tseqID\ttaxID\tscore\t2ndBestScore\t"
                "hitLength\tqueryLength\tnumMatches\treadLength\n")
        for k in range(120):
            tid = int(rng.choice(tids)) if k % 5 else 0
            f.write(f"read_{k}\tseq{k}\t{tid}\t{int(rng.integers(1, 900))}"
                    f"\t0\t50\t100\t1\t{int(rng.integers(100, 2000))}\n")

    kai = d / "kai.out"
    with open(kai, "w") as f:
        for k in range(120):
            if k % 4 == 0:
                f.write(f"U\tread_{k}\t0\n")
            else:
                tid = int(rng.choice(tids))
                # kaiju -v row: C name taxon score taxon_ids accs fragment
                f.write(f"C\tread_{k}\t{tid}\t{int(rng.integers(20, 99))}"
                        f"\t{tid},\tACC{k},\tFRAG\n")

    paf = d / "mm2.paf"
    with open(paf, "w") as f:
        for k in range(120):
            tid = int(rng.choice(tids))
            ln = int(rng.integers(200, 3000))
            f.write(f"read_{k}\t{ln}\t10\t{ln - 5}\t+\t"
                    f"tid|{tid}|ref|NC_{k:06d}.1\t50000\t100\t{100 + ln}"
                    f"\t{ln - 40}\t{ln}\t60\n")
    return cen, kai, paf


def _ref(reference_binary, mode, *args):
    r = subprocess.run([str(reference_binary), "analysis", mode,
                        *map(str, args)],
                       check=True, capture_output=True, text=True)
    return r.stdout


def _ours(mode, *args):
    from desamba_tpu.analysis.taxonomy import run_analysis

    buf = io.StringIO()
    run_analysis(mode, [str(a) for a in args], out=buf)
    return buf.getvalue()


@pytest.mark.parametrize("mode,file_i,extra", [
    ("ana_meta_cen", 0, ()),
    ("ana_meta_cen_base", 0, ()),
    ("ana_meta_kai", 1, ()),
])
def test_meta_modes_match_reference(reference_binary, sample_files,
                                    mode, file_i, extra):
    f = sample_files[file_i]
    assert _ours(mode, f, NODES, *extra) == _ref(
        reference_binary, mode, f, NODES, *extra)


@pytest.mark.parametrize("mode,file_i", [
    ("ana_cen", 0), ("ana_kai", 1), ("ana_paf", 2),
])
def test_tax_modes_match_reference(reference_binary, sample_files, tids,
                                   mode, file_i):
    f = sample_files[file_i]
    right = tids[0]
    assert _ours(mode, f, right, NODES, "species") == _ref(
        reference_binary, mode, f, right, NODES, "species")
