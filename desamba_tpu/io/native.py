"""ctypes binding for the native FASTX reader/encoder (csrc/fastx.c).

Builds the shared library on first use (cc -O3, cached beside a source
hash); falls back cleanly if no compiler is available — callers check
`available()` and use the pure-python io.fastx path otherwise.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "fastx.c")
_LIB = None
_TRIED = False


def _build():
    with open(_SRC, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    so = os.path.join(tempfile.gettempdir(), f"libdesfastx_{tag}.so")
    if not os.path.exists(so):
        subprocess.run(
            ["cc", "-O3", "-shared", "-fPIC", "-o", so + ".tmp", _SRC, "-lz"],
            check=True, capture_output=True)
        os.replace(so + ".tmp", so)
    lib = ctypes.CDLL(so)
    lib.fastx_open.restype = ctypes.c_void_p
    lib.fastx_open.argtypes = [ctypes.c_char_p]
    lib.fastx_close.argtypes = [ctypes.c_void_p]
    lib.fastx_read_batch.restype = ctypes.c_int64
    lib.fastx_read_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p,
        ctypes.c_int64, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_void_p]
    lib.fastx_encode_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p]
    return lib


def available() -> bool:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        try:
            _LIB = _build()
        except Exception:
            _LIB = None
    return _LIB is not None


class NativeFastxReader:
    """Streaming batch reader over the native library."""

    def __init__(self, path: str, batch_reads: int = 5000,
                 batch_bases: int = 10_000_000):
        assert available()
        self._h = _LIB.fastx_open(path.encode())
        if not self._h:
            raise FileNotFoundError(path)
        self.batch_reads = batch_reads
        self.batch_bases = batch_bases

    def __iter__(self):
        names_cap = 1 << 22
        # contract with fastx_read_batch: one record may straddle the
        # max_bases check, so leave 16 MB slack (max supported read size)
        seq_cap = self.batch_bases + (1 << 24)
        names = ctypes.create_string_buffer(names_cap)
        seqs = ctypes.create_string_buffer(seq_cap)
        quals = ctypes.create_string_buffer(seq_cap)
        hasq = ctypes.create_string_buffer(self.batch_reads)
        lens = np.zeros(self.batch_reads, np.int64)
        while True:
            n = _LIB.fastx_read_batch(
                self._h, self.batch_reads, self.batch_bases, names,
                names_cap, seqs, hasq, quals,
                lens.ctypes.data_as(ctypes.c_void_p))
            if n < 0:
                raise IOError("malformed FASTX stream")
            if n == 0:
                break
            total = int(lens[:n].sum())
            raw_names = names.raw.split(b"\n", n)[:n]
            seq_bytes = seqs.raw[:total]
            qual_bytes = quals.raw[:total]
            yield (raw_names, seq_bytes, qual_bytes,
                   lens[:n].copy(), np.frombuffer(hasq.raw[:n], np.uint8))

    def close(self):
        if self._h:
            _LIB.fastx_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def encode_batch(seq_bytes: bytes, lens: np.ndarray, pad_len: int):
    """Concatenated ASCII sequences -> (n, 2*pad_len) F+R code matrix."""
    n = len(lens)
    out = np.zeros((n, 2 * pad_len), np.uint8)
    _LIB.fastx_encode_batch(
        seq_bytes, lens.astype(np.int64).ctypes.data_as(ctypes.c_void_p),
        n, pad_len, out.ctypes.data_as(ctypes.c_void_p))
    return out
