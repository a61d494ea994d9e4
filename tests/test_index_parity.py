"""Differential tests: our index builder vs the reference binary.

The exported reference-format files must be byte-identical, except two
known don't-care regions written uninitialized by the reference:
  - trailing pad bytes of the final FM block (src/bwt.c:217 buffer reuse)
  - bytes after the NUL in REF_INFO.name[128] (src/idx.c:590 strcpy)
"""
import numpy as np
import pytest

from desamba_tpu.index.compat import BLOCK_BYTES, export_reference_format


def _read(p):
    with open(p, "rb") as f:
        return f.read()


def _compare_dir(my_idx, ref_dir, tmp_path):
    out = tmp_path / "export"
    export_reference_format(my_idx, str(out))

    exact = [".sa", ".acg", ".exk0", ".exk1", ".exki", ".unv", ".ref_b", ".ref_p"]
    for ext in exact:
        a, b = _read(out / f"deSAMBA{ext}"), _read(ref_dir / f"deSAMBA{ext}")
        assert a == b, f"deSAMBA{ext} differs"

    # .bwt: mask the final block's unused char bytes
    a = bytearray(_read(out / "deSAMBA.bwt"))
    b = bytearray(_read(ref_dir / "deSAMBA.bwt"))
    assert len(a) == len(b)
    n_rows = len(my_idx.row_char)
    n_blocks = (n_rows + 255) // 256
    used_chars = n_rows - (n_blocks - 1) * 256
    used_bytes = (used_chars + 1) // 2
    pad_lo = 8 + (n_blocks - 1) * BLOCK_BYTES + 40 + used_bytes
    pad_hi = 8 + n_blocks * BLOCK_BYTES
    for buf in (a, b):
        buf[pad_lo:pad_hi] = bytes(pad_hi - pad_lo)
    assert a == b, "deSAMBA.bwt differs outside the pad region"

    # .ref_i: compare parsed fields (name up to NUL, lengths, offsets)
    ra = np.frombuffer(_read(out / "deSAMBA.ref_i")[8:],
                       dtype=np.dtype([("name", "S128"), ("l", "<u8"), ("off", "<u8")]))
    rb = np.frombuffer(_read(ref_dir / "deSAMBA.ref_i")[8:], dtype=ra.dtype)
    assert len(ra) == len(rb)
    assert all(x.split(b"\0")[0] == y.split(b"\0")[0] for x, y in zip(ra["name"], rb["name"]))
    assert (ra["l"] == rb["l"]).all() and (ra["off"] == rb["off"]).all()


def test_small_genome_parity(small_my_index, small_ref_index, tmp_path):
    _compare_dir(small_my_index, small_ref_index, tmp_path)


@pytest.mark.slow
def test_demo_index_parity(demo_my_index, demo_ref_index, tmp_path):
    _compare_dir(demo_my_index, demo_ref_index, tmp_path)
