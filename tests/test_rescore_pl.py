"""Differential test: the per-read Pallas rescore kernel (rescore_pl.py,
interpret mode) vs the lockstep XLA VM oracle (rescore.py) on real
RescoreIn batches captured from the device classifier.

This is the default-suite gate the round-4 review asked for: the Pallas
kernel is the main-batch path on real TPUs (classifier._use_pl), so a
semantic break in it must be caught on CPU. Reference semantics being
checked: the 9-mer SDP rescore, src/cly.c:2335-2849.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _reads_from(idx, spans, rng, err=0.08):
    """Reads copied from reference spans [(start, len)] with noise."""
    from desamba_tpu.engine.gold.mapseed import get_ref

    reads = []
    for st, ln in spans:
        seq = get_ref(idx.ref_bin, int(st), int(ln), True).copy()
        nerr = int(ln * err)
        pos = rng.integers(0, ln, size=nerr)
        seq[pos] = (seq[pos] + rng.integers(1, 4, size=nerr)) % 4
        reads.append(seq.astype(np.uint8))
    return reads


class _Rec:
    def __init__(self, i, seq):
        self.name = f"r{i}"
        self.seq = "".join("ACGT"[c] for c in seq)
        self.qual = None


def _capture_rescore_inputs(idx, reads, monkeypatch):
    """Run the device classifier on `reads`, capturing every main-batch
    RescoreIn that reaches _k_rescore (the VM still answers)."""
    from desamba_tpu.engine.device.classifier import DeviceClassifier
    from desamba_tpu.engine.gold.classify import Options

    dev = DeviceClassifier(idx, Options())
    captured = []
    orig = DeviceClassifier._k_rescore

    def spy(self, inp):
        captured.append(inp)
        return orig(self, inp)

    monkeypatch.setattr(DeviceClassifier, "_k_rescore", spy)
    recs = [_Rec(i, r) for i, r in enumerate(reads)]
    list(dev.classify_reads(recs))
    assert captured, "classifier never reached the rescore stage"
    return dev, captured


def _diff_vm_pl(dev, inp, rows):
    """Run both kernels on inp[rows]; assert fallback sets and chains of
    both-ok reads are identical."""
    import desamba_tpu.engine.device.rescore as dr
    import desamba_tpu.engine.device.rescore_pl as drp

    dix = dev.dix
    sub = dr.RescoreIn(*[jnp.asarray(np.asarray(f)[rows]) for f in inp])
    vm_ch, vm_fb, _r, _i = dr.rescore_kernel(
        sub, dix.ref_bin, dix.ref_off, dix.ref_len_arr,
        n_bases=dix.n_bases)
    pl_ch, pl_fb, _r2, _i2 = drp.rescore_pl(
        sub, dev.ixr.ref_pk, dix.ref_off, dix.ref_len_arr,
        n_bases=dix.n_bases, interpret=True)
    vm_ch, vm_fb = np.asarray(vm_ch), np.asarray(vm_fb)
    pl_ch, pl_fb = np.asarray(pl_ch), np.asarray(pl_fb)
    real = np.asarray(sub.n_chains) > 0
    # the PL kernel may fall back where the VM copes, but not silently
    # diverge; a PL-only fallback regression shows up as over-fallback
    assert not (vm_fb & ~pl_fb & real).any(), "VM fell back where PL ran"
    both = real & ~vm_fb & ~pl_fb
    assert both.sum() >= max(1, int(0.7 * real.sum())), (
        f"too few both-ok reads: {int(both.sum())}/{int(real.sum())}")
    for i in np.flatnonzero(both):
        assert (vm_ch[i] == pl_ch[i]).all(), (
            f"row {i}: chains diverge at "
            f"{np.argwhere(vm_ch[i] != pl_ch[i])[:6].tolist()}")
    return int(both.sum())


def test_rescore_pl_matches_vm(small_my_index, monkeypatch):
    """Random mid-reference reads: PL == VM chains + fallbacks."""
    idx = small_my_index
    rng = np.random.default_rng(11)
    total = int(idx.ref_off[-1] + idx.ref_len[-1])
    spans = [(int(rng.integers(0, total - ln)), ln)
             for ln in rng.integers(250, 900, size=10)]
    reads = _reads_from(idx, spans, rng)
    dev, captured = _capture_rescore_inputs(idx, reads, monkeypatch)
    inp = captured[0]
    n_ch = np.asarray(inp.n_chains)
    rows = np.flatnonzero(n_ch > 0)[:10]
    assert len(rows) >= 5
    _diff_vm_pl(dev, inp, rows)


def test_rescore_pl_tail_of_reference(small_my_index, monkeypatch):
    """Reads mapping inside the FINAL 2048-char packed row of the
    reference: the round-4 fetch_window clamp fetched these windows
    2048 chars early (ADVICE r4 high finding) — this pins the fix."""
    idx = small_my_index
    rng = np.random.default_rng(12)
    total = int(idx.ref_off[-1] + idx.ref_len[-1])
    # window rows are 128 u32 words = 2048 chars; land reads wholly in
    # the last row and straddling its boundary
    spans = []
    for ln in (300, 400, 500, 600):
        spans.append((total - ln - 5, ln))           # wholly in tail
        spans.append((total - 2048 - ln // 2, ln))   # straddles row edge
    reads = _reads_from(idx, spans, rng, err=0.05)
    dev, captured = _capture_rescore_inputs(idx, reads, monkeypatch)
    inp = captured[0]
    n_ch = np.asarray(inp.n_chains)
    rows = np.flatnonzero(n_ch > 0)
    assert len(rows) >= 4
    _diff_vm_pl(dev, inp, rows)
