import numpy as np

from desamba_tpu.index.kmers import (
    BIT,
    CLY_BIT,
    encode,
    hash64_1,
    hash64_2,
    pack_2bit,
    rolling_kmers,
    unpack_2bit,
    valid_kmer_mask,
)


def test_encode_tables():
    assert list(encode("ACGTacgt")) == [0, 1, 2, 3, 0, 1, 2, 3]
    assert encode("N")[0] == 4
    assert encode("N", CLY_BIT)[0] == 1  # unknowns read as 'C' (src/cly.c:16)


def test_rolling_kmers():
    codes = encode("ACGTA")
    v = rolling_kmers(codes, 3)
    # ACG=0b000110, CGT=0b011011, GTA=0b101100
    assert list(v) == [0b000110, 0b011011, 0b101100]


def test_valid_kmer_mask():
    codes = encode("ACNGT")
    assert list(valid_kmer_mask(codes < 4, 2)) == [True, False, False, True]


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=1001).astype(np.uint8)
    packed = pack_2bit(codes)
    assert list(unpack_2bit(packed, 0, 1001)) == list(codes)
    assert list(unpack_2bit(packed, 17, 100)) == list(codes[17:117])


def test_hash64_reference_values():
    # values computed by the reference implementation (src/lib/utils.c)
    import ctypes

    def h1(key):
        key = ctypes.c_uint64(~key + (key << 21)).value
        key ^= key >> 24
        key = ctypes.c_uint64(key + (key << 3) + (key << 8)).value
        key ^= key >> 14
        key = ctypes.c_uint64(key + (key << 2) + (key << 4)).value
        key ^= key >> 28
        return ctypes.c_uint64(key + (key << 31)).value

    keys = np.array([0, 1, 12345, 2**62 + 3], dtype=np.uint64)
    got = hash64_1(keys)
    for k, g in zip(keys, got):
        assert int(g) == h1(int(k))
    # hash64_2 sanity: deterministic, differs from hash64_1
    assert int(hash64_2(np.uint64(12345))) != int(hash64_1(np.uint64(12345)))
