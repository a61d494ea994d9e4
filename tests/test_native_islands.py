"""Native batched island segmentation == Python walk, fuzzed."""
import numpy as np
import pytest

from desamba_tpu.constants import FORWARD, REVERSE, SEED_RANGE, STEP_EK


def test_islands_batch_matches_python():
    from desamba_tpu.engine.device.islands import segment_islands
    from desamba_tpu.engine.gold.islands import mark_top
    from desamba_tpu.io import native

    if not native.available():
        pytest.skip("no C compiler")
    rng = np.random.default_rng(9)
    S, W = 200, 1200
    hits = np.zeros((S, W), np.uint8)
    n_k = np.zeros((S,), np.int32)
    dirs = np.zeros((S,), np.int32)
    for s in range(S):
        n = int(rng.integers(0, W + 1))
        n_k[s] = n
        dirs[s] = FORWARD if s % 2 == 0 else REVERSE
        density = rng.choice([0.02, 0.3, 0.7, 0.97])
        hits[s, :n] = (rng.random(n) < density).astype(np.uint8)

    out, offs, counts, totals = native.islands_batch(
        hits, n_k, dirs, STEP_EK, SEED_RANGE)
    for s in range(S):
        exp = segment_islands(hits[s].astype(bool), int(n_k[s]),
                              int(dirs[s]))
        exp_total = mark_top(exp, int(n_k[s]), int(dirs[s]))
        got = out[int(offs[s]) : int(offs[s]) + int(counts[s])]
        assert [list(map(int, r)) for r in got] == exp, s
        assert int(totals[s]) == exp_total, s
