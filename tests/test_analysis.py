"""Taxonomy analysis parity vs the reference binary on synthetic inputs
exercising: deep trees, equal-score descendant replacement, unmapped reads,
score-0 groups, secondaries/supplementaries, and the EOF-drops-last-read
quirk."""
import subprocess

import pytest


@pytest.fixture(scope="module")
def synthetic(tmp_path_factory):
    d = tmp_path_factory.mktemp("ana")
    nodes = d / "nodes.dmp"
    rows = [
        (1, 1, "no rank"),
        (10, 1, "superkingdom"),
        (20, 10, "phylum"),
        (30, 20, "genus"),
        (31, 30, "species"),
        (32, 30, "species"),
        (40, 10, "genus"),
        (41, 40, "species"),
    ]
    nodes.write_text("".join(f"{t}\t|\t{p}\t|\t{r}\t|\n" for t, p, r in rows))
    sam = d / "in.sam"
    L = [
        # equal scores, 31 is a descendant of 30 -> replaced to 31
        "r1\t0\ttid|30|ref|A\t100\t30\t10S500M10S\t*\t0\t0\t*\t*\tAS:i:120\t",
        "r1\t256\ttid|31|ref|B\t200\t0\t10S500M10S\t*\t0\t0\t*\t*\tAS:i:120\t",
        # different scores -> no replacement
        "r2\t0\ttid|30|ref|A\t100\t30\t0S400M0S\t*\t0\t0\t*\t*\tAS:i:100\t",
        "r2\t256\ttid|32|ref|C\t200\t0\t0S400M0S\t*\t0\t0\t*\t*\tAS:i:90\t",
        # unmapped
        "r3\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*\t",
        # score 0 primary: grouping stops, the secondary counts as a new read
        "r4\t0\ttid|41|ref|D\t5\t30\t0S300M0S\t*\t0\t0\t*\t*\tAS:i:0\t",
        "r4\t256\ttid|40|ref|E\t9\t0\t0S300M0S\t*\t0\t0\t*\t*\tAS:i:55\t",
        # low coverage read (gate in base mode)
        "r5\t0\ttid|41|ref|D\t5\t30\t0S2000M0S\t*\t0\t0\t*\t*\tAS:i:4\t",
        # last read: EOF drops its tid from counts
        "r6\t0\ttid|32|ref|C\t7\t30\t0S600M0S\t*\t0\t0\t*\t*\tAS:i:200\t",
    ]
    sam.write_text("".join(l + "\n" for l in L))
    return sam, nodes


def _ref_analysis(exe, mode, sam, nodes, cwd):
    r = subprocess.run([str(exe), "analysis", mode, sam.name, str(nodes)],
                       cwd=str(sam.parent), capture_output=True, text=True,
                       check=True)
    return r.stdout


def _my_analysis(mode, sam, nodes):
    import io

    from desamba_tpu.analysis.taxonomy import run_analysis

    out = io.StringIO()
    import os

    cwd = os.getcwd()
    os.chdir(sam.parent)
    try:
        run_analysis(mode, [sam.name, str(nodes)], out)
    finally:
        os.chdir(cwd)
    return out.getvalue()


@pytest.mark.parametrize("mode", ["ana_meta", "ana_meta_base"])
def test_synthetic_parity(reference_binary, synthetic, mode):
    sam, nodes = synthetic
    ref = _ref_analysis(reference_binary, mode, sam, nodes, sam.parent)
    got = _my_analysis(mode, sam, nodes)
    assert got == ref


@pytest.mark.parametrize("mode", ["ana_meta", "ana_meta_base"])
def test_demo_parity(reference_binary, synthetic, tmp_path, mode):
    """Golden demo SAM through both implementations."""
    import shutil
    from pathlib import Path

    golden = Path(__file__).parent / "golden"
    sam = tmp_path / "demo.sam"
    shutil.copy(golden / "demo_viral.sam", sam)
    nodes = golden / "nodes.dmp"
    ref = _ref_analysis(reference_binary, mode, sam, nodes, tmp_path)
    got = _my_analysis(mode, sam, nodes)
    assert got == ref

@pytest.mark.parametrize("mode,extra", [
    ("ana_species", ["31"]),
    ("ana_genus", ["30"]),
    ("ana_sam", ["10", None, "superkingdom"]),
])
def test_ana_tax_parity(reference_binary, synthetic, mode, extra):
    """Accuracy modes vs the reference binary (stdout + stderr stats)."""
    import subprocess as sp

    sam, nodes = synthetic
    args = [str(reference_binary), "analysis", mode, sam.name]
    my_args = [sam.name]
    for a in extra:
        if a is None:
            args.append(str(nodes))
            my_args.append(str(nodes))
        else:
            args.append(a)
            my_args.append(a)
    if None not in extra:
        args.append(str(nodes))
        my_args.append(str(nodes))
    r = sp.run(args, cwd=str(sam.parent), capture_output=True, text=True,
               check=True)

    import contextlib
    import io
    import os

    from desamba_tpu.analysis.taxonomy import run_analysis

    out, err = io.StringIO(), io.StringIO()
    cwd = os.getcwd()
    os.chdir(sam.parent)
    try:
        with contextlib.redirect_stderr(err):
            # route ana_tax's stderr writes through the redirect
            import desamba_tpu.analysis.evaluate as ev
            orig = ev.sys.stderr
            ev_err = err
            run_analysis_out = out
            run_analysis(mode, my_args, out)
    finally:
        os.chdir(cwd)
    assert out.getvalue() == r.stdout
    assert err.getvalue() == r.stderr


def test_native_fastx_parity(demo_files):
    """Native C reader/encoder == python io.fastx on the demo FASTQ."""
    import numpy as np

    from desamba_tpu.index.kmers import CLY_BIT
    from desamba_tpu.io import native
    from desamba_tpu.io.fastx import read_fastx

    if not native.available():
        import pytest

        pytest.skip("no C compiler")
    path = str(demo_files[1])
    py = list(read_fastx(path))
    names, seqs, quals = [], [], []
    for nms, seqb, qualb, lens, hasq in native.NativeFastxReader(
            path, batch_reads=500, batch_bases=2_000_000):
        off = 0
        for i, nm in enumerate(nms):
            L = int(lens[i])
            names.append(nm.decode())
            seqs.append(seqb[off:off + L].decode())
            quals.append(qualb[off:off + L].decode() if hasq[i] else None)
            off += L
    assert len(seqs) == len(py)
    for i, rec in enumerate(py):
        full = rec.name + (" " + rec.comment if rec.comment else "")
        assert (names[i], seqs[i], quals[i]) == (full, rec.seq, rec.qual)
    lens = np.array([len(s) for s in seqs[:40]], np.int64)
    enc = native.encode_batch("".join(seqs[:40]).encode(), lens,
                              int(lens.max()))
    for i, s in enumerate(seqs[:40]):
        bf = CLY_BIT[np.frombuffer(s.encode(), np.uint8)]
        fr = np.concatenate([bf, (3 - bf)[::-1]])
        assert np.array_equal(enc[i, : 2 * len(s)], fr)
