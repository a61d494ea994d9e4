"""DeviceClassifier: batched classify with device seeding/ladders.

Stage split (v1):
  device — existence-filter probe, fast ladder, slow ladder (all anchors)
  host   — island segmentation, chaining, 9-mer rescore, filter, primary
The host stages run per read in input order so stream state
(max_read_l) and output order match the reference exactly. Reads whose
device buffers overflow fall back to the gold engine wholesale.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ...constants import FORWARD, MIN_READ_LEN, REVERSE
from ...index.kmers import CLY_BIT
from ..gold.classify import ClassifyEngine, Options, ReadResult, StreamState
from ..gold.islands import SearchDir, mark_top
from ..gold.mapseed import Anchor
from ..gold.chain import resolve_tree
from ..gold.rescore import detect_primary, post_rescore_finish, truncate_chains
from .arrays import DeviceIndex
from .islands import bloom_hit_kernel, segment_islands
from .ladder import fast_ladder, slow_ladder
from .pipeline import pre13_values
from . import rescore as dr

A_CAP = 96
M_CAP = 128


def _bucket(n: int, lo: int = 256) -> int:
    """Round lane counts up to power-of-two buckets so jit shapes repeat."""
    b = lo
    while b < n:
        b *= 2
    return b


def _enable_compile_cache():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/desamba_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


@functools.partial(
    jax.jit, static_argnames=("l_ek", "single_base_max", "mask_bits"))
def _bloom_packed(strands, lens, ek0, ek1, l_ek, single_base_max, mask_bits):
    hit = bloom_hit_kernel.__wrapped__(strands, lens, ek0, ek1, l_ek,
                                       single_base_max, mask_bits)
    pad = (-hit.shape[1]) % 8
    hitp = jnp.pad(hit, ((0, 0), (0, pad)))
    return jnp.packbits(hitp, axis=1)


def _anchor_from_row(row, useless):
    return Anchor(
        mtch_len=int(row[0]), score=int(row[1]), left_len=int(row[2]),
        left_ed=int(row[3]), rigt_len=int(row[4]), rigt_ed=int(row[5]),
        direction=int(row[6]), global_offset=int(row[7]), ref_id=int(row[8]),
        ref_offset=int(row[9]), index_in_read=int(row[10]),
        chain_anchor_pre=None, seed_id=int(row[11]), chain_id=0,
        anchor_useless=useless, duplicate=False)


class DeviceClassifier:
    def __init__(self, idx, opts: Options | None = None, batch_size: int = 2048):
        _enable_compile_cache()
        self.idx = idx
        self.opts = opts or Options()
        self.dix = DeviceIndex.build(idx)
        self.ixr = self.dix.index_refs()
        self.gold = ClassifyEngine(idx, self.opts)  # fallback + host tables
        self.state = StreamState()
        self.batch_size = batch_size

    # ---- island stage ------------------------------------------------------
    def _islands(self, seqs):
        """Gold get_islands per read with the existence probe batched on
        device (one bloom_hit_kernel dispatch for all strands). Returns
        list of (dirs, both)."""
        idx = self.idx
        l_ek = idx.len_e_kmer
        bufs = []
        for seq in seqs:
            bin_f = CLY_BIT[np.frombuffer(seq.encode(), np.uint8)]
            bufs.append(np.concatenate([bin_f, (3 - bin_f)[::-1]]))
        if not bufs:
            return []
        B = len(bufs)
        Lmax = max(len(b) // 2 for b in bufs)
        Lpad = ((Lmax + 1023) // 1024) * 1024
        Bpad = _bucket(2 * B, 64)
        strands = np.zeros((Bpad, Lpad), np.uint8)
        lens = np.zeros((Bpad,), np.int32)
        for i, b in enumerate(bufs):
            rl = len(b) // 2
            strands[2 * i, :rl] = b[:rl]
            strands[2 * i + 1, :rl] = b[rl:]
            lens[2 * i] = lens[2 * i + 1] = rl
        # bit-pack on device: the tunnel downloads ~10 MB/s
        packed = np.asarray(_bloom_packed(
            jnp.asarray(strands), jnp.asarray(lens), self.dix.ekmer0,
            self.dix.ekmer1, l_ek, idx.single_base_max, self.dix.mask_bits))
        hits = np.unpackbits(packed, axis=1).astype(bool)

        out = []
        for i, (seq, buf) in enumerate(zip(seqs, bufs)):
            read_len = len(seq)
            n_kmers = read_len - l_ek + 1
            dirs = []
            for si, (base, direction) in enumerate(
                    ((0, FORWARD), (read_len, REVERSE))):
                bin_read = buf[base : base + read_len]
                hit = hits[2 * i + si, :n_kmers]
                # run-based walk == gold search_islands (tested parity)
                seeds = segment_islands(hit, n_kmers, direction)
                total = mark_top(seeds, n_kmers, direction)
                dirs.append(SearchDir(seeds, bin_read, hit, direction, total,
                                      buf, base))
            if dirs[0].total_score < dirs[1].total_score:
                dirs = [dirs[1], dirs[0]]
            both = (dirs[0].total_score - dirs[1].total_score) <= (
                dirs[0].total_score >> 3)
            out.append((dirs, both))
        return out

    # ---- ladder helpers ----------------------------------------------------
    # Island-length partition thresholds: ladder trip counts follow the
    # longest island in the batch, and lengths are heavily skewed
    # (p50=5, max 61) — grouping by length cuts lockstep waste ~4x.
    _LEN_SPLITS = (7, 17, 1 << 30)

    def _run_ladder(self, kind, lanes, codes_fr, buf_len, pre13, read_lens):
        if not lanes:
            return None
        n = len(lanes)
        order = sorted(range(n), key=lambda j: lanes[j][5])
        groups = []
        start = 0
        for thr in self._LEN_SPLITS:
            g = []
            while start + len(g) < n and lanes[order[start + len(g)]][5] <= thr:
                g.append(order[start + len(g)])
            if g:
                groups.append(g)
            start += len(g)
        packed_all = []
        base_all = np.zeros((n,), np.int64)
        acnt_all = np.zeros((n,), np.int32)
        skip_all = np.zeros((n,), bool)
        ovf = False
        offset = 0
        for g in groups:
            out = self._run_ladder_group(kind, [lanes[j] for j in g],
                                         codes_fr, buf_len, pre13, read_lens)
            packed, base, acnt, skip, povf = out
            for k, j in enumerate(g):
                base_all[j] = offset + int(base[k])
                acnt_all[j] = acnt[k]
                skip_all[j] = bool(skip[k])
            packed_all.append(packed)
            offset += packed.shape[0]
            ovf = ovf or bool(povf)
        return [np.concatenate(packed_all, axis=0), base_all, acnt_all,
                skip_all, ovf]

    def _run_ladder_group(self, kind, lanes, codes_fr, buf_len, pre13,
                          read_lens):
        dix = self.dix
        N = len(lanes)
        NB = _bucket(N)
        cols = np.zeros((6, NB), np.int32)
        for j, l in enumerate(lanes):
            cols[:, j] = l
        rlv = np.zeros((NB,), np.int32)
        rlv[:N] = [read_lens[l[0]] for l in lanes]
        on = np.zeros((NB,), bool)
        on[:N] = True
        args = (self.ixr, dix.fm_blocks, dix.rank, dix.hash13, codes_fr,
                buf_len, pre13, dix.q_mem, dix.q_lv,
                jnp.asarray(cols[0]), jnp.asarray(cols[1]), jnp.asarray(rlv),
                jnp.asarray(cols[2]), jnp.asarray(cols[3]),
                jnp.asarray(cols[4]), jnp.asarray(cols[5]), jnp.asarray(on))
        if kind == "fast":
            out = fast_ladder(*args, l_ek=self.idx.len_e_kmer, a_cap=A_CAP,
                              pack_cap=2 * NB)
        else:
            out = slow_ladder(*args, l_ek=self.idx.len_e_kmer, a_cap=A_CAP,
                              m_cap=M_CAP, pack_cap=2 * NB)
        return [np.asarray(x) for x in jax.block_until_ready(out)]

    def _run_fast(self, lanes, codes_fr, buf_len, pre13, read_lens):
        return self._run_ladder("fast", lanes, codes_fr, buf_len, pre13,
                                read_lens)

    def _run_slow(self, lanes, codes_fr, buf_len, pre13, read_lens):
        return self._run_ladder("slow", lanes, codes_fr, buf_len, pre13,
                                read_lens)

    @staticmethod
    def _collect_group(lane_ids, packed_h, base_h, acnt_h, skip_h, out,
                       fallback):
        """Apply skip_next + useless marking for one (read, dir) group of
        fast lanes (in island order); append Anchor objects to out."""
        skip_next = False
        for lid in lane_ids:
            if skip_next:
                skip_next = False
                continue
            cnt = int(acnt_h[lid])
            if cnt > A_CAP:
                fallback[0] = True
                return
            b = int(base_h[lid])
            rows = packed_h[b : b + cnt]
            top = 35
            for r in rows:
                top = max(top, int(r[1]))
            for r in rows:
                out.append(_anchor_from_row(r, int(r[1]) < top))
            if skip_h is not None and skip_h[lid]:
                skip_next = True

    # ---- main entry --------------------------------------------------------
    def classify_reads(self, recs):
        for i in range(0, len(recs), self.batch_size):
            yield from self._classify_batch(recs[i : i + self.batch_size])

    def _classify_batch(self, recs):
        idx = self.idx
        l_ek = idx.len_e_kmer
        results = [ReadResult(r.name, r.seq, r.qual, len(r.seq))
                   for r in recs]
        todo = [i for i, r in enumerate(recs) if len(r.seq) >= MIN_READ_LEN]
        island_info = self._islands([recs[i].seq for i in todo])

        read_lens = {}
        bufs = {}
        for k, i in enumerate(todo):
            read_lens[i] = len(recs[i].seq)
            bufs[i] = island_info[k][0][0].buf
        if not todo:
            yield from results
            return
        # pad buffer dims to buckets so ladder jit shapes repeat across
        # batches (B to pow2, width to a 2048 multiple)
        Lmax = max(len(b) for b in bufs.values())
        Lmax = ((Lmax + 2047) // 2048) * 2048
        B_pad = _bucket(len(todo), 64)
        rows = {}
        codes_np = np.zeros((B_pad, Lmax), np.uint8)
        blen_np = np.zeros((B_pad,), np.int32)
        for k, i in enumerate(todo):
            rows[i] = k
            codes_np[k, : len(bufs[i])] = bufs[i]
            blen_np[k] = len(bufs[i])
        codes_fr = jnp.asarray(codes_np)
        buf_len = jnp.asarray(blen_np)
        pre13 = pre13_values(codes_fr, l_ek)
        rl = {rows[i]: read_lens[i] for i in todo}

        # ---- fast pass (dir0 + dir1-if-both) ------------------------------
        fast_lanes = []          # (row, base, dir, sid, off, len)
        fast_groups = {}         # (read_i, dpos) -> [lane ids]
        for k, i in enumerate(todo):
            dirs, both = island_info[k]
            for dpos in range(2 if both else 1):
                sd = dirs[dpos]
                ids = []
                for sid, s in enumerate(sd.seeds):
                    if s[2]:
                        ids.append(len(fast_lanes))
                        fast_lanes.append((rows[i], sd.base, sd.direction,
                                           sid, s[0], s[1]))
                fast_groups[(i, dpos)] = ids
        fast_out = self._run_fast(fast_lanes, codes_fr, buf_len, pre13, rl)

        fallback_reads = set()
        if fast_out is not None and bool(fast_out[4]):
            fallback_reads.update(todo)
        chains_by_read = {}
        anchors_by_read = {}
        slow0_lanes, slow0_groups = [], {}
        for k, i in enumerate(todo):
            dirs, both = island_info[k]
            anchors = []
            fb = [False]
            for dpos in range(2 if both else 1):
                self._collect_group(fast_groups[(i, dpos)], fast_out[0],
                                    fast_out[1], fast_out[2], fast_out[3],
                                    anchors, fb)
            if fb[0]:
                fallback_reads.add(i)
                continue
            chains = []
            resolve_tree(anchors, chains)
            run_slow = False
            if not chains:
                run_slow = True
            elif chains[0].anchor_number < 5:
                run_slow = True
                if read_lens[i] <= 300 and chains[0].sum_score > 200:
                    run_slow = False
            chains_by_read[i] = chains
            anchors_by_read[i] = anchors
            if run_slow:
                results[i].fast = False
                sd = dirs[0]
                first_top = bool(sd.seeds[0][2]) if sd.seeds else False
                ids = []
                for sid, s in enumerate(sd.seeds):
                    if s[1] < 3 and not first_top:
                        continue
                    ids.append(len(slow0_lanes))
                    slow0_lanes.append((rows[i], sd.base, sd.direction, sid,
                                        s[0], s[1]))
                slow0_groups[i] = ids

        slow0_out = self._run_slow(slow0_lanes, codes_fr, buf_len, pre13, rl)
        if slow0_out is not None and bool(slow0_out[4]):
            fallback_reads.update(slow0_groups.keys())

        # ---- slow dir0 results + decide slow dir1 -------------------------
        slow1_lanes, slow1_groups = [], {}
        for k, i in enumerate(todo):
            if i in fallback_reads or i not in slow0_groups:
                continue
            dirs, both = island_info[k]
            anchors = []
            fb = [False]
            if slow0_groups[i]:  # a read can have zero eligible islands
                self._collect_group(slow0_groups[i], slow0_out[0],
                                    slow0_out[1], slow0_out[2], None,
                                    anchors, fb)
                if fb[0] or any(slow0_out[3][lid]
                                for lid in slow0_groups[i]):
                    fallback_reads.add(i)
                    continue
            chains = []
            resolve_tree(anchors, chains)
            chains_by_read[i] = chains
            anchors_by_read[i] = anchors
            if both or not chains or chains[0].anchor_number < 5:
                sd = dirs[1]
                first_top = bool(sd.seeds[0][2]) if sd.seeds else False
                ids = []
                for sid, s in enumerate(sd.seeds):
                    if s[1] < 3 and not first_top:
                        continue
                    ids.append(len(slow1_lanes))
                    slow1_lanes.append((rows[i], sd.base, sd.direction, sid,
                                        s[0], s[1]))
                slow1_groups[i] = ids

        slow1_out = self._run_slow(slow1_lanes, codes_fr, buf_len, pre13, rl)
        if slow1_out is not None and bool(slow1_out[4]):
            fallback_reads.update(slow1_groups.keys())

        for i in list(slow1_groups):
            if i in fallback_reads:
                continue
            anchors = anchors_by_read[i]
            fb = [False]
            if slow1_groups[i]:
                self._collect_group(slow1_groups[i], slow1_out[0],
                                    slow1_out[1], slow1_out[2], None,
                                    anchors, fb)
                if fb[0] or any(slow1_out[3][lid]
                                for lid in slow1_groups[i]):
                    fallback_reads.add(i)
                    continue
            chains = []
            resolve_tree(anchors, chains)
            chains_by_read[i] = chains

        # ---- device rescore ------------------------------------------------
        dev_scores = self._device_rescore(
            todo, island_info, chains_by_read, fallback_reads, rows,
            codes_np, blen_np, read_lens)

        # ---- host finish, in input order ----------------------------------
        for k, i in enumerate(todo):
            res = results[i]
            if i in fallback_reads or (
                    chains_by_read.get(i) and dev_scores.get(i) is None):
                g = self.gold
                g.state = self.state
                results[i] = g.classify_read(recs[i].name, recs[i].seq,
                                             recs[i].qual)
                continue
            dirs, both = island_info[k]
            res.chains = chains_by_read.get(i, [])
            res.anchors = anchors_by_read.get(i, [])
            if res.chains:
                rows_dev = dev_scores[i]

                def coord(v):
                    # undo the kernel's uint32-wrap surrogate (T_BIAS) so
                    # the gold finish code sees the reference's exact ints
                    v = int(v)
                    if v >= dr.T_BIAS:
                        return v - dr.T_BIAS + (1 << 32)
                    return v & 0xFFFFFFFF if v < 0 else v

                for ci, c in enumerate(res.chains):
                    row = rows_dev[ci]
                    c.sum_score = int(row[dr.C_SUM])
                    c.anchor_number = int(row[dr.C_ANUM])
                    c.t_st = coord(row[dr.C_TST])
                    c.t_ed = coord(row[dr.C_TED])
                    c.q_st = coord(row[dr.C_QST])
                    c.q_ed = coord(row[dr.C_QED])
                    c.indel = int(row[dr.C_INDEL])
                post_rescore_finish(res.chains, read_lens[i], self.state,
                                    self.opts)
            detect_primary(res.chains, read_lens[i])
        yield from results

    def _device_rescore(self, todo, island_info, chains_by_read,
                        fallback_reads, rows, codes_np, blen_np, read_lens):
        """Run rescore_kernel over reads with chains (partitioned by
        estimated walk length so short reads don't pay long reads' VM
        iterations); returns {read_i: device chain rows}."""
        work = []
        for k, i in enumerate(todo):
            if i in fallback_reads:
                continue
            chains = chains_by_read.get(i)
            if chains:
                truncate_chains(chains)
                if len(chains) > dr.C_CAP:
                    fallback_reads.add(i)
                    continue
                work.append((k, i))
        if not work:
            return {}
        # NOTE: partitioning by estimated walk length was measured SLOWER
        # here (111 -> 99 reads/s): the rescore VM's fetch steps already
        # amortize across mixed lanes, and extra dispatches + padding
        # dominate. One batch it is.
        return self._device_rescore_part(work, chains_by_read,
                                         fallback_reads, rows, codes_np,
                                         blen_np, read_lens)

    def _device_rescore_part(self, work, chains_by_read, fallback_reads,
                             rows, codes_np, blen_np, read_lens):
        B = ((len(work) + 255) // 256) * 256  # finer than pow2: the
        # rescore kernel's gathers scale with B, so padding waste matters
        chains_a = np.zeros((B, dr.C_CAP, dr.CF_N), np.int32)
        n_chains = np.zeros((B,), np.int32)
        anchors_a = np.zeros((B, dr.A_CAP, dr.AF_N), np.int32)
        schash = np.zeros((B, 2 * dr.C_CAP, 3), np.int32)
        n_hash = np.zeros((B,), np.int32)
        codes2 = np.zeros((B, codes_np.shape[1]), np.uint8)
        blen2 = np.zeros((B,), np.int32)
        rlen2 = np.zeros((B,), np.int32)
        ok_rows = []
        for b, (k, i) in enumerate(work):
            chains = chains_by_read[i]
            n_chains[b] = len(chains)
            # anchor tables with pre links
            amap = {}
            overflow = False
            for ci, c in enumerate(chains):
                a = c.chain_anchor_cur
                while a is not None and id(a) not in amap:
                    if len(amap) >= dr.A_CAP:
                        overflow = True
                        break
                    amap[id(a)] = (len(amap), a)
                    a = a.chain_anchor_pre
                if overflow:
                    break
            if overflow:
                fallback_reads.add(i)
                continue
            for ai, a in amap.values():
                pre = (amap[id(a.chain_anchor_pre)][0]
                       if a.chain_anchor_pre is not None else -1)
                anchors_a[b, ai] = (a.index_in_read, a.ref_offset,
                                    a.mtch_len, pre)
            for ci, c in enumerate(chains):
                cur = (amap[id(c.chain_anchor_cur)][0]
                       if c.chain_anchor_cur is not None else -1)
                chains_a[b, ci] = (c.ref_id, c.direction, c.sum_score,
                                  c.anchor_number, c.t_st, c.t_ed, c.q_st,
                                  c.q_ed, c.indel, cur)
            # sc_hash insertion order: chain asc, i in (1, 0)
            e = 0
            for ci, c in enumerate(chains):
                for s_or_e in (1, 0):
                    key = ((c.t_st - c.q_st) if s_or_e == 1
                           else (c.t_ed - c.q_ed)) & 0xFF
                    schash[b, e] = (key, ci, s_or_e)
                    e += 1
            n_hash[b] = e
            row = rows[i]
            rl = read_lens[i]
            codes2[b] = codes_np[row]
            blen2[b] = blen_np[row]
            rlen2[b] = rl
            ok_rows.append((b, i))

        inp = dr.RescoreIn(
            chains=jnp.asarray(chains_a), n_chains=jnp.asarray(n_chains),
            anchors=jnp.asarray(anchors_a), schash=jnp.asarray(schash),
            n_hash=jnp.asarray(n_hash),
            codes_fr=jnp.asarray(codes2), buf_len=jnp.asarray(blen2),
            read_len=jnp.asarray(rlen2))
        dix = self.dix
        chains_out, fb, _reason, _iters = dr.rescore_kernel(
            inp, dix.ref_bin, dix.ref_off, dix.ref_len_arr,
            n_bases=dix.n_bases)
        chains_out = np.asarray(chains_out)
        fb = np.asarray(fb)
        out = {}
        for b, i in ok_rows:
            if fb[b]:
                fallback_reads.add(i)
            else:
                out[i] = chains_out[b]
        return out

    def classify_file(self, path):
        """Ordered read -> classify -> emit pipeline (the analogue of the
        reference's 3-stage kt_pipeline, src/lib/kthread.c:157-197): a
        reader thread parses/encodes batch N+1 while batch N classifies;
        results drain in input order."""
        import queue
        import threading

        from ...io.fastx import read_fastx_fast as read_fastx

        q: "queue.Queue" = queue.Queue(maxsize=2)

        def reader():
            batch = []
            try:
                for rec in read_fastx(path):
                    batch.append(rec)
                    if len(batch) >= self.batch_size:
                        q.put(batch)
                        batch = []
                if batch:
                    q.put(batch)
                q.put(None)
            except BaseException as e:  # surface parse errors in order
                q.put(e)

        t = threading.Thread(target=reader, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield from self._classify_batch(item)
        t.join()
