"""External-memory builder == in-RAM builder, byte-equal on every array
(VERDICT r2 item 4). The external path (disk-bucketed k-mer sort,
memmapped tables, merge-join BWT rows) must produce the exact IndexData
the array-parallel builder does — which is itself byte-parity-tested
against the reference binary's 8-file index (test_index_parity)."""
import numpy as np
import pytest

from desamba_tpu.io import native

FIELDS = [
    "row_char", "row_pos", "rank", "hash13", "uni_len", "uni_ref_list",
    "uni_start", "rp_global_off", "rp_ref_id", "rp_dir", "ref_bin",
    "ref_len", "ref_off", "ekmer0", "ekmer1",
]
SCALARS = ["dollar_pos", "n_uni", "text_len", "e_kmer_size", "len_e_kmer",
           "e_hash_mask", "single_base_max"]


def test_external_build_matches_in_ram(small_genome, tmp_path):
    if not native.available():
        pytest.skip("external build needs the native runtime")
    from desamba_tpu.index.build import build_index
    from desamba_tpu.index.build_ext import build_index_external

    ram = build_index(str(small_genome))
    ext = build_index_external(str(small_genome), workdir=str(tmp_path))
    for f in FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(ram, f)), np.asarray(getattr(ext, f)),
            err_msg=f"field {f} differs")
    for s in SCALARS:
        assert getattr(ram, s) == getattr(ext, s), s
    assert ram.ref_name == ext.ref_name
