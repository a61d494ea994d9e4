"""kmersort --jf: Jellyfish JFLISTDN ingestion == FASTA counting."""
import subprocess
import sys

import numpy as np


def _write_jf_dump(path, kmers: np.ndarray, k: int):
    """Synthesize a JFLISTDN dump (layout per src/idx_sort.c:30-47)."""
    key_bits = 2 * k
    key_len = key_bits // 8 + (1 if key_bits % 8 else 0)
    h_size = 72 + 2 * (4 + 8 * key_bits)
    with open(path, "wb") as f:
        head = bytearray(h_size)
        head[:8] = b"JFLISTDN"
        head[8:16] = int(key_bits).to_bytes(8, "little")
        head[16:24] = (4).to_bytes(8, "little")
        head[48:56] = int(len(kmers)).to_bytes(8, "little")
        f.write(head)
        for v in kmers:
            f.write(int(v).to_bytes(key_len, "little"))
            f.write((1).to_bytes(4, "little"))  # count payload, ignored


def test_jf_dump_matches_fasta_counting(small_genome, tmp_path):
    srt_fa = tmp_path / "fa.srt"
    subprocess.run(
        [sys.executable, "-m", "desamba_tpu.cli", "kmersort",
         str(small_genome), "-o", str(srt_fa)],
        check=True, capture_output=True)
    data = np.fromfile(srt_fa, np.uint64)
    n, kmers = int(data[0]), data[1:]
    assert n == len(kmers) and n > 1000

    # Jellyfish would dump the same distinct k-mer set, hash-ordered
    rng = np.random.default_rng(1)
    shuffled = kmers.copy()
    rng.shuffle(shuffled)
    jdb = tmp_path / "mers.jdb"
    _write_jf_dump(jdb, shuffled, 31)

    srt_jf = tmp_path / "jf.srt"
    subprocess.run(
        [sys.executable, "-m", "desamba_tpu.cli", "kmersort", "--jf",
         str(jdb), "-o", str(srt_jf)],
        check=True, capture_output=True)
    assert srt_jf.read_bytes() == srt_fa.read_bytes()
