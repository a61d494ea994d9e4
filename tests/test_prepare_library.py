"""The offline library builder reproduces `download`'s header rewrite
(reference repo `download:26-33,223`): every FASTA header becomes
`>tid|<TAXID>|ref|<original>`, rows are selected from
assembly_summary.txt, file names come from the ftp_path basename."""
import gzip
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SUMMARY = """#   See ftp://ftp.ncbi.nlm.nih.gov/genomes/README_assembly_summary.txt
# assembly_accession\tbioproject\tbiosample\twgs_master\trefseq_category\ttaxid\tspecies_taxid\torganism_name\tinfraspecific_name\tisolate\tversion_status\tassembly_level\trelease_type\tgenome_rep\tseq_rel_date\tasm_name\tsubmitter\tgbrs_paired_asm\tpaired_asm_comp\tftp_path\texcluded_from_refseq\trelation_to_type_material
GCF_000001.1\t-\t-\t-\tna\t11676\t11676\tVirus A\t-\t-\tlatest\tComplete Genome\tMajor\tFull\t2019/01/01\tASM1\tx\t-\t-\tftp://x/genomes/all/GCF_000001.1_ASM1\t\t
GCF_000002.1\t-\t-\t-\tna\t2697049\t694009\tVirus B\t-\t-\tlatest\tComplete Genome\tMajor\tFull\t2019/01/01\tASM2\tx\t-\t-\tftp://x/genomes/all/GCF_000002.1_ASM2\t\t
GCF_000003.1\t-\t-\t-\tna\t562\t561\tBact C\t-\t-\tlatest\tContig\tMajor\tFull\t2019/01/01\tASM3\tx\t-\t-\tftp://x/genomes/all/GCF_000003.1_ASM3\t\t
"""


def _mirror(tmp_path):
    d = tmp_path / "mirror"
    d.mkdir()
    (d / "GCF_000001.1_ASM1_genomic.fna").write_text(
        ">NC_0001.1 Virus A, complete genome\nACGTACGT\nGGCC\n")
    with gzip.open(d / "GCF_000002.1_ASM2_genomic.fna.gz", "wt") as f:
        f.write(">NC_0002.1 Virus B\nTTTT\n>NC_0003.1 plasmid\nCCCC\n")
    (d / "GCF_000003.1_ASM3_genomic.fna").write_text(
        ">NZ_0004.1 Bact C\nAAAA\n")
    s = tmp_path / "assembly_summary.txt"
    s.write_text(SUMMARY)
    return d, s


def _run(*args):
    return subprocess.run(
        [sys.executable, str(REPO / "tools" / "prepare_library.py"),
         *map(str, args)], capture_output=True, text=True)


def test_header_rewrite_matches_download_sed(tmp_path):
    d, s = _mirror(tmp_path)
    out = tmp_path / "lib.fa"
    r = _run(d, s, out)
    assert r.returncode == 0, r.stderr
    text = out.read_text()
    # exactly sed "s/^>/>tid|$TAXID|ref|/" per genome's summary taxid
    assert ">tid|11676|ref|NC_0001.1 Virus A, complete genome\n" in text
    assert ">tid|2697049|ref|NC_0002.1 Virus B\n" in text
    assert ">tid|2697049|ref|NC_0003.1 plasmid\n" in text
    assert ">tid|562|ref|NZ_0004.1 Bact C\n" in text
    assert text.count(">") == 4
    # bodies pass through untouched
    assert "ACGTACGT\nGGCC\n" in text


def test_taxid_and_level_filters(tmp_path):
    d, s = _mirror(tmp_path)
    out = tmp_path / "lib.fa"
    r = _run(d, s, out, "--taxids", "694009")  # species-taxid match
    assert r.returncode == 0, r.stderr
    text = out.read_text()
    assert "tid|2697049|" in text and "tid|11676|" not in text

    r = _run(d, s, out, "--assembly-level", "Complete Genome")
    assert r.returncode == 0
    text = out.read_text()
    assert "tid|562|" not in text and text.count(">") == 3


def test_missing_files_reported(tmp_path):
    d, s = _mirror(tmp_path)
    (d / "GCF_000003.1_ASM3_genomic.fna").unlink()
    out = tmp_path / "lib.fa"
    r = _run(d, s, out)
    assert r.returncode == 0
    assert "missing from mirror (1)" in r.stderr
    assert "GCF_000003.1_ASM3_genomic.fna.gz" in r.stderr


def test_library_feeds_index_builder(tmp_path):
    """End-to-end: the rewritten library is a valid index-build input
    and the taxonomy ids survive into ref_name (cly.c parses tid|N|)."""
    d, s = _mirror(tmp_path)
    # builder needs >= 31-mers: give virus A a real-length genome
    import numpy as np
    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 4096))
    (d / "GCF_000001.1_ASM1_genomic.fna").write_text(
        ">NC_0001.1 Virus A, complete genome\n" + seq + "\n")
    out = tmp_path / "lib.fa"
    assert _run(d, s, out).returncode == 0
    sys.path.insert(0, str(REPO))
    from desamba_tpu.index.build import build_index

    idx = build_index(str(out))
    names = list(idx.ref_name)
    assert any(n.startswith("tid|11676|ref|") for n in names)
