"""Single-chip batched device pipeline.

`seed_wave_step` is the jittable per-batch seeding step (existence probe +
first-wave FM MEM search) used by the driver entry point; the full
DeviceClassifier (ladder + anchors + chains + rescore) builds on it.

All index arrays are explicit function arguments: closing over them would
embed them as HLO constants (hash13 alone is 256 MB), which breaks remote
compilation and bloats executables.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...constants import (
    L_PRE_IDX,
    MEM_SEARCH_FAST,
    MIN_MEM_LEN_FAST,
    PRE_IDX_MASK,
    STEP_EK,
)
from . import fm as dev_fm
from .islands import ekmer_probe_indices
from .textwalk import pack2


@functools.partial(jax.jit, static_argnames=("l_ek",))
def pre13_values(codes, l_ek: int):
    """13-mer prefix value for the e-kmer ending at each position.

    codes: (B, L); returns (B, L - l_ek + 1) int32 (kmer & PRE_IDX_MASK).
    """
    B, L = codes.shape
    n_k = L - l_ek + 1
    c32 = codes.astype(jnp.uint32)
    pre = jnp.zeros((B, n_k), jnp.uint32)
    for j in range(L_PRE_IDX):
        sh = 2 * (L_PRE_IDX - 1 - j)
        off = l_ek - L_PRE_IDX + j
        pre = pre | (c32[:, off : off + n_k] << sh)
    return (pre & jnp.uint32(PRE_IDX_MASK)).astype(jnp.int32)


def index_args(dix):
    """The positional index-array arguments of seed_wave_step."""
    walk = dev_fm.WalkRefs(row_pos=dix.row_pos, text_pk=dix.text_pk,
                           sep_any=dix.sep_any, samp_bits=dix.samp_bits,
                           isa=dix.isa)
    return (walk, dix.fm_blocks, dix.rank, dix.hash13,
            dix.ekmer0, dix.ekmer1)


@functools.partial(
    jax.jit, static_argnames=("l_ek", "single_base_max", "mask_bits", "n_probes"))
def seed_wave_step(walk, fm_blocks, rank6, hash13, ek0, ek1,
                   codes, lengths, *, l_ek: int, single_base_max: int,
                   mask_bits: int, n_probes: int = 8):
    """(codes, lengths) -> (hit_count, mem_len, mem_valid).

    Probes the existence filter for every read position, picks the first
    `n_probes` hit positions (>= STEP_EK apart) and runs fast-mode FM MEM
    search on them.
    """
    b1, s1, b2, s2, valid = ekmer_probe_indices(codes, lengths, l_ek,
                                                single_base_max, mask_bits)
    hit = (((ek0[b1] >> s1) & 1) > 0) & (((ek1[b2] >> s2) & 1) > 0) & valid
    B, n_k = hit.shape
    pos = jnp.arange(n_k, dtype=jnp.int32)[None, :]

    def pick(carry, _):
        taken_after = carry
        cand = hit & (pos >= taken_after[:, None])
        idx = jnp.argmax(cand, axis=1).astype(jnp.int32)
        ok = jnp.take_along_axis(cand, idx[:, None], axis=1)[:, 0]
        taken_after = jnp.where(ok, idx + STEP_EK, n_k)
        return taken_after, (idx, ok)

    _, (p_idx, p_ok) = jax.lax.scan(
        pick, jnp.zeros(B, jnp.int32), None, length=n_probes)
    p_idx, p_ok = p_idx.T, p_ok.T
    pre = pre13_values(codes, l_ek)

    spset, spcount = dev_fm.spset_init(B)
    codes_pk = pack2(codes)
    lens, valids = [], []
    for k in range(n_probes):
        ki = p_idx[:, k]
        out = dev_fm.mem_probe.__wrapped__(
            walk, fm_blocks, rank6, hash13,
            codes, codes_pk, ki + l_ek - 1,
            jnp.take_along_axis(pre, ki[:, None], 1)[:, 0],
            p_ok[:, k], spset, spcount,
            MEM_SEARCH_FAST, MIN_MEM_LEN_FAST - 1)
        (res_len, _sp, _sa, _ok, _sal, res_valid, spset, spcount) = out
        lens.append(res_len)
        valids.append(res_valid)
    return (hit.sum(axis=1), jnp.stack(lens, 1), jnp.stack(valids, 1))
