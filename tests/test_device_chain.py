"""Device chain kernel vs gold resolve_tree on randomized anchor sets."""
import numpy as np
import jax.numpy as jnp


def _gold_chains(anchor_rows):
    from desamba_tpu.engine.gold.chain import chain_insert_m2, resolve_tree
    from desamba_tpu.engine.gold.mapseed import Anchor

    anchors = []
    for r in anchor_rows:
        anchors.append(Anchor(
            mtch_len=int(r[2]), score=int(r[3]), left_len=0, left_ed=0,
            rigt_len=0, rigt_ed=0, direction=int(r[5]),
            global_offset=0, ref_id=int(r[4]), ref_offset=int(r[1]),
            index_in_read=int(r[0]), chain_anchor_pre=None, seed_id=0,
            chain_id=0, anchor_useless=bool(r[6]), duplicate=False))
    probe = []
    for a in anchors:
        chain_insert_m2(a, probe)
    pre_trunc = len(probe)
    chains = []
    resolve_tree(anchors, chains)
    return anchors, chains, pre_trunc


def _rand_anchors(rng, n):
    """Anchor rows clustered on a few diagonals so chains actually form."""
    rows = np.zeros((n, 7), np.int32)
    n_diag = int(rng.integers(1, 5))
    diags = rng.integers(0, 5000, n_diag)
    for k in range(n):
        d = int(diags[rng.integers(0, n_diag)]) + int(rng.integers(-40, 40))
        iir = int(rng.integers(0, 800))
        mlen = int(rng.integers(9, 80))
        rows[k] = (iir, iir + d, mlen, int(rng.integers(20, 300)),
                   int(rng.integers(0, 3)), int(rng.integers(0, 2)),
                   int(rng.integers(0, 2)))
    return rows


def test_chain_kernel_matches_resolve_tree():
    from desamba_tpu.engine.device.chain import CH_NF, chain_kernel

    rng = np.random.default_rng(3)
    B, A2 = 64, 48
    anc = np.zeros((B, A2, 7), np.int32)
    n_anc = np.zeros((B,), np.int32)
    goldv = []
    for b in range(B):
        n = int(rng.integers(0, 41))
        rows = _rand_anchors(rng, n)
        anc[b, :n] = rows
        n_anc[b] = n
        goldv.append(_gold_chains(rows))

    chs, n_out, pre, ovf = (np.asarray(x) for x in chain_kernel(
        jnp.asarray(anc), jnp.asarray(n_anc)))

    from desamba_tpu.engine.device.chain import C2

    n_checked = 0
    for b in range(B):
        anchors, chains, pre_trunc = goldv[b]
        if pre_trunc > C2:
            assert ovf[b], b   # legitimate slot overflow -> host fallback
            continue
        n_checked += 1
        assert not ovf[b], b
        assert n_out[b] == len(chains), (b, n_out[b], len(chains))
        for ci, c in enumerate(chains):
            row = chs[b, ci]
            got = tuple(int(v) for v in row[:11])
            exp = (c.ref_id, c.q_t_dis, c.sum_score, c.anchor_number,
                   c.direction, int(c.with_top_anchor), c.t_st, c.t_ed,
                   c.q_st, c.q_ed, c.indel)
            assert got == exp, (b, ci, got, exp)
            assert row[12] == c.chain_id, (b, ci)
            # anchor linked list == pre[] walk from cur
            exp_walk = []
            a = c.chain_anchor_cur
            while a is not None:
                exp_walk.append(
                    next(i for i, x in enumerate(anchors) if x is a))
                a = a.chain_anchor_pre
            got_walk = []
            i = int(row[11])
            while i >= 0:
                got_walk.append(i)
                i = int(pre[b, i])
            assert got_walk == exp_walk, (b, ci, got_walk, exp_walk)
    assert n_checked >= 40, n_checked


def test_chain_kernel_m3_flags_overflow():
    from desamba_tpu.engine.device.chain import chain_kernel

    rng = np.random.default_rng(4)
    B, A2 = 4, 64
    anc = np.zeros((B, A2, 7), np.int32)
    n_anc = np.array([10, 50, 64, 0], np.int32)
    for b in range(B):
        anc[b, : n_anc[b]] = _rand_anchors(rng, int(n_anc[b]))
    _, n_out, _, ovf = (np.asarray(x) for x in chain_kernel(
        jnp.asarray(anc), jnp.asarray(n_anc)))
    assert not ovf[0] and ovf[1] and ovf[2]
    assert n_out[3] == 0


def _gold_m3(anchor_rows):
    """Gold resolve_tree (M3 path for >=50 anchors) + original-order
    anchor positions for pre-link comparison."""
    from desamba_tpu.engine.gold.chain import resolve_tree
    from desamba_tpu.engine.gold.mapseed import Anchor

    anchors = []
    for r in anchor_rows:
        anchors.append(Anchor(
            mtch_len=int(r[2]), score=int(r[3]), left_len=0, left_ed=0,
            rigt_len=0, rigt_ed=0, direction=int(r[5]),
            global_offset=0, ref_id=int(r[4]),
            ref_offset=int(r[1]) & 0xFFFFFFFF,
            index_in_read=int(r[0]), chain_anchor_pre=None, seed_id=0,
            chain_id=0, anchor_useless=bool(r[6] & 1),
            duplicate=bool(r[6] >> 1)))
    orig_pos = {id(a): i for i, a in enumerate(anchors)}
    chains = []
    resolve_tree(list(anchors), chains)
    return orig_pos, chains


def _rand_m3_anchors(rng, n):
    """Dense diagonal clusters (DP actually chains), some wrapped
    offsets, useless/duplicate flag bits."""
    rows = np.zeros((n, 7), np.int32)
    n_cl = int(rng.integers(1, 6))
    bases = rng.integers(0, 200000, n_cl)
    refs = rng.integers(0, 3, n_cl)
    k = 0
    while k < n:
        c = int(rng.integers(0, n_cl))
        iir = int(rng.integers(0, 2500))
        d = int(bases[c]) + int(rng.integers(-150, 150))
        roff = iir + d
        if rng.random() < 0.05:
            roff = int(rng.integers(-40, -1))    # wrapped (u32) offset
        rows[k] = (iir, roff, int(rng.integers(9, 60)),
                   int(rng.integers(20, 200)), int(refs[c]),
                   int(rng.integers(0, 2)), int(rng.integers(0, 4)))
        k += 1
    return rows


def test_m3_kernel_matches_gold():
    from desamba_tpu.engine.device.chain import C2, M3_A2, m3_kernel

    rng = np.random.default_rng(7)
    B = 16
    anc = np.zeros((B, M3_A2, 7), np.int32)
    n_anc = np.zeros((B,), np.int32)
    goldv = []
    for b in range(B):
        n = int(rng.integers(50, 400))
        rows = _rand_m3_anchors(rng, n)
        anc[b, :n] = rows
        n_anc[b] = n
        goldv.append((_gold_m3(rows), rows))

    chs, n_out, pre, ovf = (np.asarray(x) for x in m3_kernel(
        jnp.asarray(anc), jnp.asarray(n_anc)))

    U = 0xFFFFFFFF
    n_checked = 0
    for b in range(B):
        (orig_pos, chains), rows = goldv[b]
        if len(chains) > C2:
            assert ovf[b], b
            continue
        n_checked += 1
        assert not ovf[b], b
        assert n_out[b] == len(chains), (b, n_out[b], len(chains))
        for ci, c in enumerate(chains):
            row = chs[b, ci]
            got = (int(row[0]), int(row[1]), int(row[2]), int(row[3]),
                   int(row[4]), int(row[5]), int(row[6]) & U,
                   int(row[7]) & U, int(row[8]) & U, int(row[9]) & U,
                   int(row[10]))
            exp = (c.ref_id, c.q_t_dis, c.sum_score, c.anchor_number,
                   c.direction, int(c.with_top_anchor), c.t_st & U,
                   c.t_ed & U, c.q_st & U, c.q_ed & U, c.indel)
            assert got == exp, (b, ci, got, exp)
            exp_walk = []
            a = c.chain_anchor_cur
            while a is not None:
                exp_walk.append(orig_pos[id(a)])
                a = a.chain_anchor_pre
            got_walk = []
            i = int(row[11])
            while i >= 0:
                got_walk.append(i)
                i = int(pre[b, i])
            assert got_walk == exp_walk, (b, ci, got_walk, exp_walk)
    assert n_checked >= 12, n_checked
