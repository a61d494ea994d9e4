/* Hot scalar kernels of the host (gold) classify engine.
 *
 * lv_extd: Landau-Vishkin semi-global edit distance <= lv_error. Native
 * port of desamba_tpu/engine/gold/mapseed.py:lv_extd, which is the
 * bit-parity oracle for the reference's extension scorer
 * (src/cly.c:510-609). Semantics notes carried over from the python
 * port:
 *   - buffers are uint8 base codes; one-past-the-end reads yield the
 *     sentinels 254 (ref '#') / 255 (query '$');
 *   - out-of-range matches (the C reference reads stack garbage there)
 *     terminate the run: guarded indices compare as mismatch;
 *   - when ref is shorter than query the operands swap.
 */
#include <stdint.h>
#include <stdlib.h>

#define LV_MAX_E 8

static inline int rat(const uint8_t *r, int64_t n, int64_t k) {
    return k == n ? 254 : (int)r[k];
}

static inline int qat(const uint8_t *q, int64_t n, int64_t k) {
    return k == n ? 255 : (int)q[k];
}

/* get_ref: unpack `length` 2-bit bases from the packed reference at
 * global position `offset` (gold mapseed.get_ref; src/cly.c:435-466).
 * Backward mode reads offset, offset-1, ...; indices clamp to range. */
void get_ref_bases(const uint8_t *ref_bin, int64_t n_bases, int64_t offset,
                   int64_t length, int forward, uint8_t *out) {
    if (offset < 0) offset = 0;
    for (int64_t k = 0; k < length; k++) {
        int64_t idx = forward ? offset + k : offset - k;
        if (idx < 0) idx = 0;
        if (idx >= n_bases) idx = n_bases - 1;
        out[k] = (ref_bin[idx >> 2] >> (6 - ((idx & 3) << 1))) & 3;
    }
}

/* mem_run: length of the exact-match run (gold rescore._mem_q;
 * src/cly.c:1810-1818). Directions +1/-1 from (qi, ti); bounds clamp. */
int64_t mem_run(const uint8_t *qbuf, int64_t lq, int64_t qi,
                const uint8_t *t, int64_t lt, int64_t ti,
                int forward, int64_t maxlen) {
    int64_t m = maxlen, n = 0;
    if (forward) {
        if (lq - qi < m) m = lq - qi;
        if (lt - ti < m) m = lt - ti;
        if (m <= 0) return 0;
        while (n < m && qbuf[qi + n] == t[ti + n]) n++;
    } else {
        /* q below the buffer start compares as char 0: the reference
         * walks into the glibc chunk header (top size bytes 0x00) —
         * see gold rescore._mem_q */
        if (ti + 1 < m) m = ti + 1;
        if (m <= 0) return 0;
        while (n < m && (qi - n >= 0 ? qbuf[qi - n] : 0) == t[ti - n]) n++;
    }
    return n;
}

/* FM backward MEM search (gold fm.py bwt_mem_search/bwt_single_search;
 * src/cly.c:1281-1447). occ is the (6, n_rows+1) cumulative table laid
 * out row-major with stride occ_stride; rank6 the 6-char LF bases;
 * spset/spcount the caller-owned 500-entry linear dedup set
 * (wrap-reset). Emits rows [match_len, sp, sa_sp(-1 = none), sa_sp_l]
 * and returns the row count. */
#define SPSET_CAP 500

static int spset_insert(uint64_t *set, int64_t *cnt, uint64_t node) {
    int64_t n = *cnt;
    if (n == SPSET_CAP) { n = 0; }
    for (int64_t k = 0; k < n; k++)
        if (set[k] == node) { *cnt = n; return 0; }
    set[n] = node;
    *cnt = n + 1;
    return 1;
}

/* Blocked FM table (the reference's bwt.c layout, re-derived): 168-byte
 * blocks of 256 rows = 5 x int64 cumulative char counts at block start
 * + 256 nibbles (char per row, low nibble first). The whole demo-scale
 * FM fits in L2/L3 (11.8M rows -> 7.7 MB vs a 472 MB flat occ), which
 * is where the reference's serial speed comes from. */
static inline int64_t blk_occ(const uint8_t *blk, int64_t r, int c) {
    const uint8_t *b = blk + (r >> 8) * 168;
    int64_t base = ((const int64_t *)b)[c];
    const uint8_t *nib = b + 40;
    int64_t off = r & 255;
    int64_t cnt = 0;
    const uint64_t dupc = 0x1111111111111111ull * (uint64_t)c;
    int64_t full = off >> 4;
    const uint64_t *w = (const uint64_t *)nib;
    for (int64_t k = 0; k < full; k++) {
        uint64_t t = w[k] ^ dupc;
        t = (t | (t >> 1) | (t >> 2) | (t >> 3)) & 0x1111111111111111ull;
        cnt += 16 - __builtin_popcountll(t);
    }
    for (int64_t i = full << 4; i < off; i++)
        cnt += (((nib[i >> 1] >> ((i & 1) * 4)) & 0xF) == c);
    return base + cnt;
}

/* paired rank: sp/ep usually land in the same 256-row block during the
 * narrow-interval phase; count both in one nibble pass */
static inline void blk_occ2(const uint8_t *blk, int64_t sp, int64_t ep,
                            int c, int64_t *osp, int64_t *oep) {
    if ((sp >> 8) != (ep >> 8)) {
        *osp = blk_occ(blk, sp, c);
        *oep = blk_occ(blk, ep, c);
        return;
    }
    const uint8_t *b = blk + (sp >> 8) * 168;
    int64_t base = ((const int64_t *)b)[c];
    const uint8_t *nib = b + 40;
    int64_t off1 = sp & 255, off2 = ep & 255;   /* off1 <= off2 */
    int64_t cnt = 0;
    const uint64_t dupc = 0x1111111111111111ull * (uint64_t)c;
    const uint64_t *w = (const uint64_t *)nib;
    int64_t full1 = off1 >> 4;
    for (int64_t k = 0; k < full1; k++) {
        uint64_t t = w[k] ^ dupc;
        t = (t | (t >> 1) | (t >> 2) | (t >> 3)) & 0x1111111111111111ull;
        cnt += 16 - __builtin_popcountll(t);
    }
    for (int64_t i = full1 << 4; i < off1; i++)
        cnt += (((nib[i >> 1] >> ((i & 1) * 4)) & 0xF) == c);
    *osp = base + cnt;
    for (int64_t i = off1; i < off2; i++)
        cnt += (((nib[i >> 1] >> ((i & 1) * 4)) & 0xF) == c);
    *oep = base + cnt;
}

/* fused LF: read the row's char and count its occurrences before r in
 * one pass over the same (cached) block */
static inline int64_t blk_lf_occ(const uint8_t *blk, int64_t r, int *c_out) {
    const uint8_t *b = blk + (r >> 8) * 168;
    const uint8_t *nib = b + 40;
    int64_t off = r & 255;
    int c = (nib[off >> 1] >> ((off & 1) * 4)) & 0xF;
    *c_out = c;
    if (c == 5) return 0;  /* '$': caller uses dollar_pos */
    int64_t base = ((const int64_t *)b)[c];
    int64_t cnt = 0;
    const uint64_t dupc = 0x1111111111111111ull * (uint64_t)c;
    const uint64_t *w = (const uint64_t *)nib;
    int64_t full = off >> 4;
    for (int64_t k = 0; k < full; k++) {
        uint64_t t = w[k] ^ dupc;
        t = (t | (t >> 1) | (t >> 2) | (t >> 3)) & 0x1111111111111111ull;
        cnt += 16 - __builtin_popcountll(t);
    }
    for (int64_t i = full << 4; i < off; i++)
        cnt += (((nib[i >> 1] >> ((i & 1) * 4)) & 0xF) == c);
    return base + cnt;
}

static inline int blk_char(const uint8_t *blk, int64_t r) {
    const uint8_t *nib = blk + (r >> 8) * 168 + 40;
    int64_t off = r & 255;
    return (nib[off >> 1] >> ((off & 1) * 4)) & 0xF;
}

typedef struct {
    const uint8_t *blocks;
    const int64_t *rank6;
    int64_t dollar_pos;
    int64_t sa_mask;
} FmTab;

static int64_t fm_lf(const FmTab *fm, int64_t r, int *c_out) {
    int64_t occ = blk_lf_occ(fm->blocks, r, c_out);
    int c = *c_out;
    if (c == 5)  /* '$' */
        return fm->dollar_pos + fm->rank6[5];
    return occ + fm->rank6[c];
}

static void fm_single(const FmTab *fm, int64_t sp, const uint8_t *string,
                      int64_t str_i, int64_t max_match_len,
                      uint64_t *spset, int64_t *spcount,
                      int64_t *match_len_out, int64_t *sp_out,
                      int64_t *sa_sp_out, int64_t *sa_sp_l_out) {
    int64_t sa_sp = -1, sa_sp_l = 0, match_len = 0;
    for (;;) {
        if (match_len >= max_match_len) break;
        if ((sp & fm->sa_mask) == 0) { sa_sp = sp; sa_sp_l = 0; }
        else sa_sp_l -= 1;
        int c;
        int64_t new_sp = fm_lf(fm, sp, &c);
        if (str_i < 0 || c != (int)string[str_i]) break;
        match_len += 1;
        str_i -= 1;
        if (!spset_insert(spset, spcount, (uint64_t)new_sp)) {
            *match_len_out = -1000;
            return;
        }
        sp = new_sp;
    }
    *match_len_out = match_len;
    *sp_out = sp;
    *sa_sp_out = sa_sp;
    *sa_sp_l_out = sa_sp_l;
}

int64_t fm_mem_search(const uint8_t *blocks, const int64_t *rank6,
                      int64_t dollar_pos, int64_t sa_mask,
                      const uint32_t *hash13,
                      const uint8_t *string, int64_t str_i, int64_t pre_v,
                      int64_t max_rst, int64_t l_min_mth, int64_t l_max_mth,
                      int64_t l_pre_idx,
                      uint64_t *spset, int64_t *spcount,
                      int64_t *out, int64_t out_cap) {
    FmTab fm = {blocks, rank6, dollar_pos, sa_mask};
    int64_t sp = hash13[pre_v];
    int64_t ep = hash13[pre_v + 1];
    str_i -= l_pre_idx;
    int64_t match_len = l_pre_idx;
    int64_t new_sp, new_ep;
    for (;;) {
        int64_t c = str_i >= 0 ? (int64_t)string[str_i] : -1;
        str_i -= 1;
        if (c < 0) { new_sp = new_ep = 0; }
        else {
            blk_occ2(blocks, sp, ep, (int)c, &new_sp, &new_ep);
            new_sp += rank6[c];
            new_ep += rank6[c];
        }
        if (match_len >= l_min_mth - 1) {
            if (new_sp + max_rst >= new_ep) break;
            if (match_len >= l_max_mth) return 0;
        }
        if (new_sp + 1 >= new_ep) break;
        match_len += 1;
        sp = new_sp; ep = new_ep;
    }
    if (new_sp >= new_ep) return 0;
    int64_t n_out = 0;
    if (new_sp + 1 == new_ep) {
        if (!spset_insert(spset, spcount, (uint64_t)new_sp)) return 0;
        /* rst inits mirror MemRst(0, 0, MAX_U64, 0): the -1000 dedup
           path leaves them untouched */
        int64_t ml = 0, rsp = 0, sa_sp = -1, sa_sp_l = 0;
        int64_t mm = l_max_mth - match_len; if (mm < 0) mm = 0;
        fm_single(&fm, new_sp, string, str_i, mm, spset, spcount,
                  &ml, &rsp, &sa_sp, &sa_sp_l);
        ml += match_len + 1;
        if (ml >= l_min_mth && n_out < out_cap) {
            out[4 * n_out] = ml; out[4 * n_out + 1] = rsp;
            out[4 * n_out + 2] = sa_sp; out[4 * n_out + 3] = sa_sp_l;
            n_out++;
        }
    } else {
        for (int64_t c_sp = new_sp; c_sp < new_ep; c_sp++) {
            if (!spset_insert(spset, spcount, (uint64_t)c_sp)) continue;
            int64_t ml = 0, rsp = 0, sa_sp = -1, sa_sp_l = 0;
            int64_t mm = l_max_mth - match_len; if (mm < 0) mm = 0;
            fm_single(&fm, c_sp, string, str_i, mm, spset, spcount,
                      &ml, &rsp, &sa_sp, &sa_sp_l);
            ml += match_len + 1;
            if (ml >= l_min_mth && n_out < out_cap) {
                out[4 * n_out] = ml; out[4 * n_out + 1] = rsp;
                out[4 * n_out + 2] = sa_sp; out[4 * n_out + 3] = sa_sp_l;
                n_out++;
            }
        }
    }
    return n_out;
}

/* exist_hits: rolling e-kmers + low-complexity filter + 2-hash
 * existence-table probe for one strand (gold islands.store_kmers_mask +
 * exist_mask; src/cly.c:360-398, 956-972). out[i] = 1 when the e-kmer
 * at position i passes the filter and both bit tables. */
static inline uint64_t wang1(uint64_t k) {
    k = (~k) + (k << 21);
    k = k ^ (k >> 24);
    k = k + (k << 3) + (k << 8);
    k = k ^ (k >> 14);
    k = k + (k << 2) + (k << 4);
    k = k ^ (k >> 28);
    k = k + (k << 31);
    return k;
}

static inline uint64_t wang2(uint64_t k) {
    k = k + (~(k << 32));
    k = k ^ (k >> 22);
    k = k + (~(k << 13));
    k = k ^ (k >> 8);
    k = k + (k << 3);
    k = k ^ (k >> 15);
    k = k + (~(k << 27));
    k = k ^ (k >> 31);
    return k;
}

/* store_kmers_vals: rolling e-kmer values with the low-complexity
 * zeroing (gold islands.store_kmers_mask; src/cly.c:360-398). */
void store_kmers_vals(const uint8_t *bin_read, int64_t n_kmers,
                      int64_t l_ek, int64_t single_base_max,
                      uint64_t *out) {
    if (n_kmers <= 0) return;
    const uint64_t kmask =
        l_ek >= 32 ? ~0ull : ((1ull << (2 * l_ek)) - 1);
    uint64_t kv = 0;
    int64_t cnt[4] = {0, 0, 0, 0};
    for (int64_t j = 0; j < l_ek - 1; j++) {
        kv = (kv << 2) | bin_read[j];
        cnt[bin_read[j]]++;
    }
    for (int64_t i = 0; i < n_kmers; i++) {
        uint8_t cin = bin_read[i + l_ek - 1];
        kv = ((kv << 2) | cin) & kmask;
        cnt[cin]++;
        int bad = (cnt[0] >= single_base_max) | (cnt[1] >= single_base_max)
                | (cnt[2] >= single_base_max) | (cnt[3] >= single_base_max);
        out[i] = bad ? 0 : kv;
        cnt[bin_read[i]]--;
    }
}

/* build_exist_tables: one pass over the unitig text setting both
 * existence bit tables (index/build.py existence-filter stage;
 * src/idx.c:964-1026). text chars are 0..3 bases / 4 separators; a
 * window is hashed only when fully ACGT. */
void build_exist_tables(const uint8_t *text, int64_t n, int64_t l_ek,
                        uint64_t hash_mask, uint8_t *ek0, uint8_t *ek1) {
    int64_t nk = n - l_ek + 1;
    if (nk <= 0) return;
    const uint64_t kmask =
        l_ek >= 32 ? ~0ull : ((1ull << (2 * l_ek)) - 1);
    uint64_t kv = 0;
    int64_t invalid_until = -1;
    for (int64_t j = 0; j < l_ek - 1; j++) {
        uint8_t c = text[j];
        if (c >= 4) invalid_until = j;
        kv = (kv << 2) | (c & 3);
    }
    for (int64_t i = 0; i < nk; i++) {
        uint8_t c = text[i + l_ek - 1];
        if (c >= 4) invalid_until = i + l_ek - 1;
        kv = ((kv << 2) | (c & 3)) & kmask;
        if (invalid_until >= i) continue;
        uint64_t h1 = wang1(kv) & hash_mask;
        ek0[h1 >> 3] |= (uint8_t)(0x80u >> (h1 & 7));
        uint64_t h2 = wang2(kv) & hash_mask;
        ek1[h2 >> 3] |= (uint8_t)(0x80u >> (h2 & 7));
    }
}

void exist_hits(const uint8_t *bin_read, int64_t n_kmers, int64_t l_ek,
                int64_t single_base_max, const uint8_t *ek0,
                const uint8_t *ek1, uint64_t hash_mask, uint8_t *out) {
    if (n_kmers <= 0) return;
    const uint64_t kmask =
        l_ek >= 32 ? ~0ull : ((1ull << (2 * l_ek)) - 1);
    uint64_t kv = 0;
    int64_t cnt[4] = {0, 0, 0, 0};
    for (int64_t j = 0; j < l_ek - 1; j++) {
        kv = (kv << 2) | bin_read[j];
        cnt[bin_read[j]]++;
    }
    for (int64_t i = 0; i < n_kmers; i++) {
        uint8_t cin = bin_read[i + l_ek - 1];
        kv = ((kv << 2) | cin) & kmask;
        cnt[cin]++;
        int bad = (cnt[0] >= single_base_max) | (cnt[1] >= single_base_max)
                | (cnt[2] >= single_base_max) | (cnt[3] >= single_base_max);
        uint8_t hit = 0;
        if (!bad && kv != 0) {
            uint64_t h1 = wang1(kv) & hash_mask;
            if ((ek0[h1 >> 3] >> (7 - (h1 & 7))) & 1) {
                uint64_t h2 = wang2(kv) & hash_mask;
                hit = (ek1[h2 >> 3] >> (7 - (h2 & 7))) & 1;
            }
        }
        out[i] = hit;
        cnt[bin_read[i]]--;
    }
}

/* resolve_tree, M2 path (gold chain.py chain_insert_m2/_insert_meta/
 * resolve_tree; src/cly.c:72-235,326-349). Anchor rows are the
 * classify_dir 13 cols + direction (col 13). Emits chain rows in the
 * rescore_finish layout + anchor (mtch, refoff, idx) triples in
 * cur->pre order. Returns the chain count, or -1 when the caller must
 * fall back (>= m3_threshold anchors, or caps). */
typedef struct {
    int64_t ref_id, q_t_dis, sum_score, anchor_number, direction;
    int64_t with_top, t_st, t_ed, q_st, q_ed, indel;
    int64_t cur;                 /* head anchor index, -1 none */
} CChain;

static inline int64_t rt_u32(int64_t x) { return x & 0xFFFFFFFFll; }
static inline int64_t rt_i32(int64_t x) {
    x &= 0xFFFFFFFFll;
    return x >= 0x80000000ll ? x - 0x100000000ll : x;
}

int64_t resolve_tree_m2(const int64_t *arows, int64_t n,
                        int64_t m3_threshold, int64_t max_dis_minus,
                        int64_t max_waiting_len,
                        int64_t *chains_out, int64_t cmax,
                        int64_t *anc3_out, int64_t amax) {
    if (n >= m3_threshold) return -1;
    CChain ch[64];
    int64_t pre_idx[64];         /* per-anchor chain_anchor_pre index */
    int64_t nc = 0;
    for (int64_t a = 0; a < n; a++) {
        const int64_t *r = arows + 14 * a;
        int64_t mtch = r[0], score = r[1], goff_unused = r[6];
        (void)goff_unused;
        int64_t ref_id = r[7], refoff = r[8], idx_in_read = r[9];
        int64_t dup = r[10], useless = r[12], dir = r[13];
        int64_t dis = rt_i32(refoff - idx_in_read);
        int64_t ref_l = refoff, ref_r = rt_u32(refoff + mtch);
        int64_t read_l = idx_in_read, read_r = idx_in_read + mtch;
        int64_t eff_score = dup ? 1 : score;
        CChain *hit = 0;
        int64_t dis_minus = 0;
        for (int64_t ci = 0; ci < nc; ci++) {
            CChain *c = &ch[ci];
            if (c->direction == dir && c->ref_id == ref_id) {
                int64_t dm = dis - c->q_t_dis;
                if (dm < 0) dm = -dm;
                int64_t dt = c->t_ed - refoff;
                if (dt < 0) dt = -dt;
                if (dm < max_dis_minus && dt < max_waiting_len) {
                    hit = c;
                    dis_minus = dm;
                    break;
                }
            }
        }
        if (!hit) {
            if (nc >= 64 || nc >= cmax) return -1;
            CChain *c = &ch[nc++];
            pre_idx[a] = -1;
            c->ref_id = ref_id;
            c->direction = dir;
            c->q_t_dis = dis;
            c->t_st = ref_l; c->t_ed = ref_r;
            c->q_st = read_l; c->q_ed = read_r;
            c->with_top = !useless;
            c->anchor_number = 1;
            c->sum_score = eff_score;
            c->indel = 0;
            c->cur = a;
        } else {
            CChain *c = hit;
            c->with_top = c->with_top || !useless;
            if (c->q_ed >= read_r) { pre_idx[a] = -1; continue; }
            if (ref_r > c->t_ed) c->t_ed = ref_r;
            c->q_ed = read_r;
            pre_idx[a] = c->cur;
            c->cur = a;
            c->q_t_dis = dis;
            c->indel += dis_minus;
            c->anchor_number += 1;
            c->sum_score += eff_score;
        }
    }
    /* sort: with_top first, then score + 2*span - 4*indel desc; stable */
    int64_t ord[64];
    for (int64_t i = 0; i < nc; i++) ord[i] = i;
    for (int64_t i = 1; i < nc; i++) {
        int64_t key = ord[i];
        int64_t kt = ch[key].with_top ? 0 : 1;
        int64_t ks = rt_i32(ch[key].sum_score
                            + (rt_u32(ch[key].q_ed - ch[key].q_st) << 1))
                     - rt_i32(rt_u32(ch[key].indel) << 2);
        int64_t p = i - 1;
        while (p >= 0) {
            int64_t pt = ch[ord[p]].with_top ? 0 : 1;
            int64_t ps = rt_i32(ch[ord[p]].sum_score
                                + (rt_u32(ch[ord[p]].q_ed
                                          - ch[ord[p]].q_st) << 1))
                         - rt_i32(rt_u32(ch[ord[p]].indel) << 2);
            if (pt > kt || (pt == kt && ps < ks)) {
                ord[p + 1] = ord[p];
                p--;
            } else {
                break;
            }
        }
        ord[p + 1] = key;
    }
    int64_t rst = nc < 5 ? nc : 5;
    while (rst < nc && ch[ord[rst]].with_top) rst++;
    /* emit */
    int64_t aw = 0;
    for (int64_t i = 0; i < rst; i++) {
        const CChain *c = &ch[ord[i]];
        int64_t *o = chains_out + 14 * i;
        int64_t off = aw;
        for (int64_t a = c->cur; a >= 0; a = pre_idx[a]) {
            if (aw >= amax) return -1;
            const int64_t *r = arows + 14 * a;
            anc3_out[3 * aw] = r[0];
            anc3_out[3 * aw + 1] = r[8];
            anc3_out[3 * aw + 2] = r[9];
            aw++;
        }
        o[0] = c->ref_id; o[1] = c->sum_score; o[2] = c->anchor_number;
        o[3] = c->direction; o[4] = c->with_top; o[5] = c->t_st;
        o[6] = c->t_ed; o[7] = c->q_st; o[8] = c->q_ed; o[9] = c->indel;
        o[10] = off; o[11] = aw - off; o[12] = 0; o[13] = 0;
    }
    return rst;
}

/* lazy_islands: the reference's island walk with on-demand probes
 * (gold islands.search_islands + mark_top over exist_hits;
 * src/cly.c:1071-1234). Only ~1/3 of positions get hashed (stride-3
 * walk + local expansion) instead of the full mask. Emits
 * [offset, len, top] int32 rows; returns the count and writes the
 * direction total_score. */
static inline uint64_t lz_kval(const uint8_t *br, int64_t i, int64_t l_ek) {
    uint64_t kv = 0;
    for (int64_t j = 0; j < l_ek; j++)
        kv = (kv << 2) | br[i + j];
    if (l_ek < 32) kv &= (1ull << (2 * l_ek)) - 1;
    return kv;
}

/* Rolling window state for the walk's probes: every move in the island
 * walk is small (stride +3, expansions +-1/2), so the k-mer value and
 * the 4 base counts update incrementally instead of re-reading l_ek
 * chars per probe. */
typedef struct {
    int64_t pos;
    uint64_t kv;
    int64_t cnt[4];
} LzWin;

static void lz_init(LzWin *w, const uint8_t *br, int64_t i, int64_t l_ek) {
    w->pos = i;
    w->kv = 0;
    w->cnt[0] = w->cnt[1] = w->cnt[2] = w->cnt[3] = 0;
    for (int64_t j = 0; j < l_ek; j++) {
        w->kv = (w->kv << 2) | br[i + j];
        w->cnt[br[i + j]]++;
    }
    if (l_ek < 32) w->kv &= (1ull << (2 * l_ek)) - 1;
}

static void lz_seek(LzWin *w, const uint8_t *br, int64_t target,
                    int64_t l_ek) {
    int64_t d = target - w->pos;
    const uint64_t mask =
        l_ek >= 32 ? ~0ull : ((1ull << (2 * l_ek)) - 1);
    if (d == 0) return;
    if (d < 0 ? -d >= l_ek : d >= l_ek) {
        lz_init(w, br, target, l_ek);
        return;
    }
    while (d > 0) {
        uint8_t out = br[w->pos];
        uint8_t in = br[w->pos + l_ek];
        w->cnt[out]--;
        w->cnt[in]++;
        w->kv = ((w->kv << 2) | in) & mask;
        w->pos++;
        d--;
    }
    while (d < 0) {
        uint8_t out = br[w->pos + l_ek - 1];
        uint8_t in = br[w->pos - 1];
        w->cnt[out]--;
        w->cnt[in]++;
        w->kv = (w->kv >> 2) | ((uint64_t)in << (2 * l_ek - 2));
        w->pos--;
        d++;
    }
}

static int lz_probe_at(LzWin *w, const uint8_t *br, int64_t i,
                       int64_t l_ek, int64_t sbm, const uint8_t *ek0,
                       const uint8_t *ek1, uint64_t hmask) {
    lz_seek(w, br, i, l_ek);
    if (w->kv == 0) return 0;
    if (w->cnt[0] >= sbm || w->cnt[1] >= sbm || w->cnt[2] >= sbm
            || w->cnt[3] >= sbm)
        return 0;
    uint64_t h1 = wang1(w->kv) & hmask;
    if (!((ek0[h1 >> 3] >> (7 - (h1 & 7))) & 1)) return 0;
    uint64_t h2 = wang2(w->kv) & hmask;
    return (ek1[h2 >> 3] >> (7 - (h2 & 7))) & 1;
}

int64_t lazy_islands(const uint8_t *bin_read, int64_t n_kmers,
                     int64_t l_ek, int64_t single_base_max,
                     const uint8_t *ek0, const uint8_t *ek1,
                     uint64_t hash_mask, int64_t step_ek,
                     int64_t seed_range, int forward,
                     int32_t *seeds_out, int64_t cap,
                     int64_t *total_out) {
    int64_t ns = 0;
    const int64_t n = n_kmers;
    if (n <= 0) { *total_out = 0; return 0; }
    LzWin w;
    lz_init(&w, bin_read, 0, l_ek);
#define PROBE(ix) lz_probe_at(&w, bin_read, (ix), l_ek, single_base_max, \
                              ek0, ek1, hash_mask)
    if (forward) {
        int64_t i = step_ek - 1;
        while (i < n) {
            /* hide the first table probe's DRAM latency: hash the next
               stride position and prefetch its ek0 byte (hint only,
               semantics unchanged) */
            if (i + step_ek < n) {
                uint64_t pk = wang1(lz_kval(bin_read, i + step_ek, l_ek))
                              & hash_mask;
                __builtin_prefetch(ek0 + (pk >> 3), 0, 1);
            }
            if (PROBE(i)) {
                int64_t offset = i, length = 1;
                for (int64_t j = 1; j < step_ek; j++) {
                    if (i - j >= 0 && PROBE(i - j)) {
                        offset -= 1;
                        length += 1;
                    } else {
                        break;
                    }
                }
                for (int64_t j = 1; i + j < n; j++) {
                    if (PROBE(i + j)) {
                        length += 1;
                        if (length > 60) break;
                    } else {
                        break;
                    }
                }
                if (ns >= cap) return -1;
                seeds_out[3 * ns] = (int32_t)offset;
                seeds_out[3 * ns + 1] = (int32_t)length;
                seeds_out[3 * ns + 2] = 0;
                ns++;
                i = offset + length;
            }
            i += step_ek;
        }
    } else {
        int64_t i = n - step_ek;
        while (i >= 0) {
            if (i - step_ek >= 0) {
                uint64_t pk = wang1(lz_kval(bin_read, i - step_ek, l_ek))
                              & hash_mask;
                __builtin_prefetch(ek0 + (pk >> 3), 0, 1);
            }
            if (PROBE(i)) {
                int64_t offset = i, length = 1;
                for (int64_t j = 1; j < step_ek; j++) {
                    if (i + j < n && PROBE(i + j)) {
                        offset += 1;
                        length += 1;
                    } else {
                        break;
                    }
                }
                for (int64_t j = 1; j <= i; j++) {
                    if (PROBE(i - j)) {
                        length += 1;
                        if (length > 60) break;
                    } else {
                        break;
                    }
                }
                if (ns >= cap) return -1;
                seeds_out[3 * ns] = (int32_t)(offset - length + 1);
                seeds_out[3 * ns + 1] = (int32_t)length;
                seeds_out[3 * ns + 2] = 0;
                ns++;
                i = offset - length;
            }
            i -= step_ek;
        }
    }
#undef PROBE
    /* mark_top (gold islands.mark_top; src/cly.c:1174-1226) */
    int64_t total_score = 0;
    int64_t max_index = 0, max_length = 0, index_end = seed_range;
    for (int64_t m = 0; m < ns; m++) {
        int32_t *s = seeds_out + 3 * m;
        s[2] = 0;
        int64_t key = forward ? s[0] : n - s[0] - s[1];
        if (key < index_end) {
            if (max_length < s[1]) {
                max_length = s[1];
                max_index = m;
            }
            seeds_out[3 * max_index + 2] = 0;
        } else {
            seeds_out[3 * max_index + 2] = 1;
            index_end += seed_range;
            total_score += max_length;
            max_index = m;
            max_length = s[1];
        }
    }
    if (ns)
        seeds_out[3 * max_index + 2] = 1;
    total_score += max_length;
    *total_out = total_score;
    return ns;
}

/* sdp_match: 9-mer seeded match harvest over one reference window
 * (gold rescore.sdp_match; src/cly.c:2335-2440). Probes the window's
 * 9-mers every 4th position against the read's sorted 9-mer table,
 * MEM-extends hits (leftmost-only check via a 4-cap back run), and
 * emits [q_start, t_start, len, 0] rows with uint32 wrap semantics.
 * Returns the row count, or -(needed) if out_cap is too small. */
static int64_t lower_b(const uint64_t *v, int64_t n, uint64_t x) {
    /* branchless (cmov) binary search: the probe values are effectively
       random, so the branching version mispredicts every level
       (+10% whole-engine serial, interleaved A/B) */
    int64_t base = 0;
    while (n > 1) {
        int64_t half = n >> 1;
        base += (v[base + half - 1] < x) ? half : 0;
        n -= half;
    }
    return base + (n == 1 && v[base] < x ? 1 : 0);
}

static int64_t upper_b(const uint64_t *v, int64_t n, uint64_t x) {
    int64_t lo = 0, hi = n;
    while (lo < hi) { int64_t m = (lo + hi) >> 1;
        if (v[m] <= x) lo = m + 1; else hi = m; }
    return lo;
}

int64_t sdp_match(uint64_t q_bg, uint64_t q_ed,
                  const uint8_t *qbuf, int64_t lq, int64_t qbase,
                  const uint64_t *rkvals, const int64_t *rkpos, int64_t nrk,
                  const uint8_t *t_arr, int64_t lt, int64_t t0,
                  int64_t t_len, uint64_t t_st, int forward,
                  int64_t over_search, int64_t k9,
                  int64_t *out, int64_t out_cap) {
    int64_t t_kmer_num = t_len - k9 + 1;
    int64_t n_out = 0, need = 0;
    if (t_kmer_num <= 4) return 0;
    const uint64_t kmask = (1ull << (2 * k9)) - 1;
    /* rolling probe k-mer: advance by 4 chars per stride instead of
       re-reading all k9 (forward walks ascending, backward descending
       t positions — both are strided by 4 in their own direction) */
    uint64_t tv = 0;
    {
        int64_t p0 = forward ? 4 : t_kmer_num - 5;
        for (int64_t j = 0; j < k9; j++)
            tv = (tv << 2) | t_arr[t0 + p0 + j];
        tv &= kmask;
    }
    for (int64_t i = 4; i < t_kmer_num; i += 4) {
        int64_t tpos = forward ? i : t_kmer_num - 1 - i;
        if (i > 4) {
            if (forward) {
                tv = ((tv << 8)
                      | ((uint64_t)t_arr[t0 + tpos + k9 - 4] << 6)
                      | ((uint64_t)t_arr[t0 + tpos + k9 - 3] << 4)
                      | ((uint64_t)t_arr[t0 + tpos + k9 - 2] << 2)
                      | (uint64_t)t_arr[t0 + tpos + k9 - 1]) & kmask;
            } else {
                tv = (tv >> 8)
                     | ((uint64_t)t_arr[t0 + tpos] << (2 * k9 - 2))
                     | ((uint64_t)t_arr[t0 + tpos + 1] << (2 * k9 - 4))
                     | ((uint64_t)t_arr[t0 + tpos + 2] << (2 * k9 - 6))
                     | ((uint64_t)t_arr[t0 + tpos + 3] << (2 * k9 - 8));
            }
        }
        int64_t lo = lower_b(rkvals, nrk, tv);
        int64_t hi = lo;
        while (hi < nrk && rkvals[hi] == tv) hi++;  /* runs are short */
        for (int64_t r = lo; r < hi; r++) {
            int64_t q_pos = rkpos[r];
            /* filter 2 (src/cly.c:2251,2306): the C compares q_bg, not
             * q_pos, to q_ed — q_ed only gates the window as a whole */
            if ((uint64_t)q_pos < q_bg || q_bg > q_ed) continue;
            if (forward) {
                int64_t back_len = mem_run(qbuf, lq, qbase + q_pos - 1,
                                           t_arr, lt, t0 + i - 1, 0, 4);
                if (back_len < 4 || i == 4) {
                    int64_t ms = (int64_t)q_ed - q_pos - 1;
                    uint64_t msu = ms < 0 ? 0xFFFFFFFFull : (uint64_t)ms;
                    uint64_t lim = (uint64_t)(t_len - i - 1);
                    int64_t max_search =
                        (int64_t)(msu < lim ? msu : lim) + over_search;
                    int64_t fwd_len = mem_run(qbuf, lq, qbase + q_pos + k9,
                                              t_arr, lt, t0 + i + k9, 1,
                                              max_search);
                    int64_t total = back_len + fwd_len + 1;
                    if (total >= 4) {
                        if (n_out < out_cap) {
                            out[4 * n_out] =
                                (int64_t)((uint64_t)(q_pos - back_len)
                                          & 0xFFFFFFFFull);
                            out[4 * n_out + 1] =
                                (int64_t)((uint64_t)(i - back_len + t_st)
                                          & 0xFFFFFFFFull);
                            out[4 * n_out + 2] = total;
                            out[4 * n_out + 3] = 0;
                            n_out++;
                        }
                        need++;
                    }
                }
            } else {
                int64_t fwd_len = mem_run(qbuf, lq, qbase + q_pos + k9,
                                          t_arr, lt, t0 + tpos + k9, 1, 4);
                if (fwd_len < 4 || i == 4) {
                    int64_t mq = q_pos < tpos ? q_pos : tpos;
                    int64_t max_search = mq + over_search;
                    int64_t back_len = mem_run(qbuf, lq, qbase + q_pos - 1,
                                               t_arr, lt, t0 + tpos - 1, 0,
                                               max_search);
                    int64_t total = back_len + fwd_len + 1;
                    if (total >= 4) {
                        if (n_out < out_cap) {
                            out[4 * n_out] =
                                (int64_t)((uint64_t)(q_pos - back_len)
                                          & 0xFFFFFFFFull);
                            out[4 * n_out + 1] =
                                (int64_t)((uint64_t)(tpos - back_len + t_st)
                                          & 0xFFFFFFFFull);
                            out[4 * n_out + 2] = total;
                            out[4 * n_out + 3] = 0;
                            n_out++;
                        }
                        need++;
                    }
                }
            }
        }
    }
    return need > n_out ? -need : n_out;
}

/* ---- map_seed (gold mapseed.map_seed; src/cly.c:706-939) --------------
 * One MEM result -> scored anchors over every reference occurrence of
 * the located unitig. The context block packs table pointers + scalars
 * (python builds it once per engine; see gold/mapseed.py MapSeedCtx):
 *   [0] row_char*  [1] occ*    [2] occ_stride [3] rank6*  [4] dollar_pos
 *   [5] sa_mask    [6] row_pos*[7] uni_start* [8] uni_len*(u32)
 *   [9] uni_ref_list*(u32)    [10] rp_global_off* [11] rp_ref_id*(i32)
 *   [12] ref_off*  [13] text_len [14] n_uni  [15] ref_bin* [16] n_bases
 *   [17] q_mem*    [18] q_lv*  [19] q_lv_stride [20] LV_L [21] MIN_S_1
 *   [22] MIN_S_2   [23] MIN_UNI_L [24] LV_ERROR
 * Anchor rows (11 cols): mtch, score, ll, le, rl, re, global_offset,
 * ref_id, ref_offset, index_in_read, duplicate. out[0] = row count.
 * Returns the map_seed score (python falls back when rows > cap,
 * signalled by -1). */
int64_t lv_extd(const uint8_t *ref, int64_t ref_length,
                const uint8_t *query, int64_t query_length,
                int64_t lv_error);

typedef struct {
    const uint8_t *fm_blocks; int64_t occ_stride_unused;
    const int64_t *rank6; int64_t dollar_pos; int64_t sa_mask;
    const int64_t *row_pos; const int64_t *uni_start;
    const uint32_t *uni_len; const uint32_t *uni_ref_list;
    const int64_t *rp_global_off; const int32_t *rp_ref_id;
    const int64_t *ref_off; int64_t text_len; int64_t n_uni;
    const uint8_t *ref_bin; int64_t n_bases;
    const int64_t *q_mem; const int64_t *q_lv; int64_t q_lv_stride;
    int64_t lv_l, min_s_1, min_s_2, min_uni_l, lv_error;
    /* classify_dir extras (ctx block slots 25..32) */
    const uint32_t *hash13; int64_t pre_idx_mask;
    int64_t mem_search_fast, min_mem_len_fast;
    int64_t mem_search_slow, min_mem_len_slow;
    int64_t l_ek, single_base_max, l_pre_idx;
} MsCtx;

static void ms_load(MsCtx *c, const int64_t *x) {
    c->fm_blocks = (const uint8_t *)x[0];
    c->occ_stride_unused = x[2];
    c->rank6 = (const int64_t *)x[3];
    c->dollar_pos = x[4];
    c->sa_mask = x[5];
    c->row_pos = (const int64_t *)x[6];
    c->uni_start = (const int64_t *)x[7];
    c->uni_len = (const uint32_t *)x[8];
    c->uni_ref_list = (const uint32_t *)x[9];
    c->rp_global_off = (const int64_t *)x[10];
    c->rp_ref_id = (const int32_t *)x[11];
    c->ref_off = (const int64_t *)x[12];
    c->text_len = x[13];
    c->n_uni = x[14];
    c->ref_bin = (const uint8_t *)x[15];
    c->n_bases = x[16];
    c->q_mem = (const int64_t *)x[17];
    c->q_lv = (const int64_t *)x[18];
    c->q_lv_stride = x[19];
    c->lv_l = x[20]; c->min_s_1 = x[21]; c->min_s_2 = x[22];
    c->min_uni_l = x[23]; c->lv_error = x[24];
    c->hash13 = (const uint32_t *)x[25];
    c->pre_idx_mask = x[26];
    c->mem_search_fast = x[27]; c->min_mem_len_fast = x[28];
    c->mem_search_slow = x[29]; c->min_mem_len_slow = x[30];
    c->l_ek = x[31]; c->single_base_max = x[32];
    c->l_pre_idx = x[33];
}

static int64_t ms_lf(const MsCtx *c, int64_t r, int *ch) {
    int64_t occ = blk_lf_occ(c->fm_blocks, r, ch);
    int cc = *ch;
    if (cc == 5)
        return c->dollar_pos + c->rank6[5];
    return occ + c->rank6[cc];
}

/* Locator.get_uni: SA sample -> (unitig, uni_offset, global ref pos) */
static void ms_get_uni(const MsCtx *c, int64_t bwt_pos, int64_t search_l,
                       int64_t *u_out, int64_t *off_out, int64_t *g_out) {
    int64_t p1 = (c->row_pos[bwt_pos] - 1) % c->text_len;
    if (p1 < 0) p1 += c->text_len;
    /* searchsorted right over uni_start[1..n_uni] */
    int64_t lo = 0, hi = c->n_uni;
    while (lo < hi) { int64_t m = (lo + hi) >> 1;
        if (c->uni_start[1 + m] <= p1) lo = m + 1; else hi = m; }
    int64_t u = lo;
    int64_t off = p1 - c->uni_start[u];
    int64_t uni_offset = off + search_l + 1;
    if (search_l > 0) {
        while (uni_offset >= (int64_t)c->uni_len[u]) {
            uni_offset -= (int64_t)c->uni_len[u] + 1;
            u += 1;
        }
    } else if (uni_offset < 0) {
        uni_offset &= 0xFFFFFFFFll;  /* uint32 wrap (cly.c:486) */
    }
    *u_out = u;
    *off_out = uni_offset;
    *g_out = c->rp_global_off[c->uni_ref_list[u]] + uni_offset;
}

/* qslice: GARBAGE (200) outside the F+R buffer (gold mapseed.qslice) */
static void ms_qslice(const uint8_t *buf, int64_t buf_len, int64_t start,
                      int64_t length, int step, uint8_t *out) {
    for (int64_t k = 0; k < length; k++) {
        int64_t i = start + step * k;
        out[k] = (i >= 0 && i < buf_len) ? buf[i] : 200;
    }
}

static void ms_get_ref(const MsCtx *c, int64_t offset, int64_t length,
                       int forward, uint8_t *out) {
    get_ref_bases(c->ref_bin, c->n_bases, offset, length, forward, out);
}

/* get_new_ed (gold mapseed.get_new_ed; src/cly.c:629-694) */
static void ms_get_new_ed(const MsCtx *c, int64_t q_off, int64_t t_off,
                          int64_t l_read, const uint8_t *buf,
                          int64_t buf_len, int64_t base, int is_fwd,
                          int64_t *ed_out, int64_t *len_out,
                          int64_t *ext_out) {
    uint8_t q[16], t[16];
    int64_t l_mem_ext = 0, max_len, length;
    if (is_fwd) {
        if (q_off < 0) q_off = 0;
        max_len = q_off;
        length = max_len < 12 ? max_len : 12;
        ms_qslice(buf, buf_len, base + q_off, length, -1, q);
    } else {
        max_len = l_read - q_off;
        length = max_len < 12 ? max_len : 12;
        ms_qslice(buf, buf_len, base + q_off, length, 1, q);
    }
    ms_get_ref(c, t_off, length, !is_fwd, t);
    if (length > 0 && t[0] == q[0]) {
        for (;;) {
            int64_t mtc = 0;
            while (mtc < length && t[mtc] == q[mtc]) mtc++;
            if (mtc <= 0) break;
            l_mem_ext += mtc;
            max_len -= mtc;
            length = max_len < 12 ? max_len : 12;
            if (is_fwd) {
                q_off -= mtc;
                t_off -= mtc;
                ms_qslice(buf, buf_len, base + q_off, length, -1, q);
            } else {
                t_off += mtc;
                ms_qslice(buf, buf_len, base + q_off + l_mem_ext, length,
                          1, q);
            }
            ms_get_ref(c, t_off, length, !is_fwd, t);
            if (length <= 0) break;
        }
    }
    *ed_out = lv_extd(t, length, q, length, c->lv_error);
    *len_out = length;
    *ext_out = l_mem_ext;
}

static int64_t ms_map_seed_core(const MsCtx *Cp, const uint8_t *buf,
                                int64_t buf_len, int64_t base,
                                int64_t read_len, int64_t sp_in,
                                int64_t read_offset, int64_t match_len,
                                int64_t sa_sp, int64_t sa_sp_l,
                                int64_t *rows, int64_t stride,
                                int64_t cap, int64_t *n_io) {
    const MsCtx C = *Cp;
    const int64_t LVL = C.lv_l;
    int64_t b_p = sp_in, q_off = read_offset, l_m = match_len;
    int64_t uni = -1, u_off = 0, t_off = 0;
    int64_t l_pre = 0, l_suf = 0, d_pre = 0, d_suf = 0;
    int64_t s = 0, max_s = 0;
    uint8_t q_pre[16], t_pre[40], q_suf[16], t_suf[16];
    int64_t s_l = 0;

    do {
        /* step 1: prefix */
        l_pre = q_off + 1 < LVL ? q_off + 1 : LVL;
        ms_qslice(buf, buf_len, base + q_off, LVL, -1, q_pre);
        int64_t n_walked = 0;
        if (sa_sp >= 0) {
            ms_get_uni(&C, sa_sp, sa_sp_l, &uni, &u_off, &t_off);
        } else {
            for (;;) {
                if ((b_p & C.sa_mask) == 0) break;
                int ch;
                int64_t new_sp = ms_lf(&C, b_p, &ch);
                if (ch == 4) break;
                t_pre[n_walked++] = (uint8_t)ch;
                s_l += 1;
                b_p = new_sp;
                if (s_l >= l_pre) break;
            }
            if ((b_p & C.sa_mask) == 0)
                ms_get_uni(&C, b_p, s_l, &uni, &u_off, &t_off);
            else
                l_pre = s_l;
        }
        if (uni >= 0) {
            if ((int64_t)C.uni_len[uni] < C.min_uni_l) break;
            if (u_off < l_pre) l_pre = u_off;
            ms_get_ref(&C, t_off - 1, l_pre, 0, t_pre);
        }
        /* else t_pre already holds the walked chars (first l_pre) */
        d_pre = lv_extd(t_pre, l_pre, q_pre, l_pre, C.lv_error);
        s = C.q_mem[l_m] + C.q_lv[d_pre * C.q_lv_stride + l_pre];
        if (s < C.min_s_1 && l_pre == LVL && uni < 0) { s = 0; break; }
        /* step 2: suffix */
        if (uni < 0) {
            while (b_p & C.sa_mask) {
                int ch;
                b_p = ms_lf(&C, b_p, &ch);
                s_l += 1;
            }
            ms_get_uni(&C, b_p, s_l, &uni, &u_off, &t_off);
            if ((int64_t)C.uni_len[uni] < C.min_uni_l) { s = 0; break; }
        }
        int64_t q_off_r = q_off + l_m + 1;
        uint64_t a32 = (uint64_t)((int64_t)C.uni_len[uni] - u_off - l_m)
                       & 0xFFFFFFFFull;
        uint64_t b32 = (uint64_t)(read_len - q_off_r) & 0xFFFFFFFFull;
        uint64_t l_max_suf = a32 < b32 ? a32 : b32;
        if (l_max_suf != 0) {
            l_suf = (int64_t)l_max_suf < LVL ? (int64_t)l_max_suf : LVL;
            int64_t q_suf_i = q_off_r;
            ms_get_ref(&C, t_off + l_m, l_suf, 1, t_suf);
            ms_qslice(buf, buf_len, base + q_suf_i, l_suf, 1, q_suf);
            if (l_suf > 0 && t_suf[0] == q_suf[0]) {
                for (;;) {
                    int64_t mtc = 0;
                    while (mtc < l_suf && t_suf[mtc] == q_suf[mtc]) mtc++;
                    if (mtc <= 0) break;
                    l_m += mtc;
                    s = C.q_mem[l_m] + C.q_lv[d_pre * C.q_lv_stride + l_pre];
                    l_max_suf -= (uint64_t)mtc;
                    l_suf = (int64_t)l_max_suf < LVL
                            ? (int64_t)l_max_suf : LVL;
                    q_suf_i += mtc;
                    ms_get_ref(&C, t_off + l_m, l_suf, 1, t_suf);
                    ms_qslice(buf, buf_len, base + q_suf_i, l_suf, 1,
                              q_suf);
                    if (l_suf <= 0) break;
                }
            }
            d_suf = lv_extd(t_suf, l_suf, q_suf, l_suf, C.lv_error);
            s += C.q_lv[d_suf * C.q_lv_stride + l_suf];
        } else {
            l_suf = d_suf = 0;
        }
        if (s <= C.min_s_2 && l_suf == LVL) { s = 0; break; }
    } while (0);

    if (s > 0) {
        int64_t rl_s = C.uni_ref_list[uni];
        int64_t rl_e = C.uni_ref_list[uni + 1];
        int ref_search_l = (l_pre < LVL) || (d_pre == 0);
        int ref_search_r = (l_suf < LVL) || (d_suf == 0);
        if (rl_e - rl_s > 50 && rl_e - rl_s >= 1000)
            return 50;
        for (int64_t ci = rl_s; ci < rl_e; ci++) {
            int64_t a_mtch = l_m, a_score = s, a_ll = l_pre, a_le = d_pre,
                    a_rl = l_suf, a_re = d_suf;
            int64_t g_off = C.rp_global_off[ci];
            int64_t l_m_ext_l = 0;
            if (ref_search_l || ref_search_r) {
                if (ref_search_l) {
                    int64_t ed_l, len_l;
                    ms_get_new_ed(&C, q_off, g_off + u_off - 1, read_len,
                                  buf, buf_len, base, 1, &ed_l, &len_l,
                                  &l_m_ext_l);
                    a_ll = len_l;
                    a_le = ed_l;
                }
                a_mtch = l_m + l_m_ext_l;
                if (ref_search_r) {
                    int64_t ed_r, len_r, ext_r;
                    ms_get_new_ed(&C, q_off + l_m + 1, g_off + u_off + l_m,
                                  read_len, buf, buf_len, base, 0, &ed_r,
                                  &len_r, &ext_r);
                    a_rl = len_r;
                    a_re = ed_r;
                    a_mtch += ext_r;
                }
                a_score = C.q_mem[a_mtch]
                        + C.q_lv[a_le * C.q_lv_stride + a_ll]
                        + C.q_lv[a_re * C.q_lv_stride + a_rl];
                if (a_score < C.min_s_2) continue;
            }
            if (a_score > max_s) max_s = a_score;
            if (*n_io >= cap) { *n_io = -1; return 0; }
            int64_t ref_id = C.rp_ref_id[ci];
            int64_t global_offset = g_off + u_off - l_m_ext_l;
            int64_t *row = rows + stride * (*n_io);
            row[0] = a_mtch; row[1] = a_score; row[2] = a_ll; row[3] = a_le;
            row[4] = a_rl; row[5] = a_re; row[6] = global_offset;
            row[7] = ref_id;
            /* uint32: extensions crossing the ref start wrap */
            row[8] = (global_offset - C.ref_off[ref_id]) & 0xFFFFFFFFll;
            row[9] = q_off + 1 - l_m_ext_l; row[10] = 0;
            *n_io += 1;
        }
    }
    return max_s;
}

int64_t map_seed(const int64_t *ctx_block, const uint8_t *buf,
                 int64_t buf_len, int64_t base, int64_t read_len,
                 int64_t sp_in, int64_t read_offset, int64_t match_len,
                 int64_t sa_sp, int64_t sa_sp_l,
                 int64_t *out, int64_t out_cap) {
    MsCtx C;
    ms_load(&C, ctx_block);
    int64_t n = 0;
    int64_t s = ms_map_seed_core(&C, buf, buf_len, base, read_len, sp_in,
                                 read_offset, match_len, sa_sp, sa_sp_l,
                                 out + 1, 11, out_cap, &n);
    if (n < 0) { out[0] = 0; return -1; }
    out[0] = n;
    return s;
}

/* classify_dir: one direction's fast or slow seeding ladder (gold
 * fastslow.fast_classify / slow_classify; src/cly.c:1478-1611). Rolls
 * the e-kmer values, walks the top (fast) / len>=3 (slow) islands with
 * the adaptive stride, FM-MEM-probes, map_seeds every hit, and marks
 * per-island useless anchors. Anchor rows are 13 cols: the 11 map_seed
 * cols + seed_id + anchor_useless. Returns the row count (-1 = caller
 * must fall back to python). */
int64_t classify_dir(const int64_t *ctx_block, const uint8_t *buf,
                     int64_t buf_len, int64_t base, int64_t read_len,
                     const int32_t *seeds, int64_t n_seeds, int mode,
                     int64_t *out, int64_t out_cap) {
    MsCtx C;
    ms_load(&C, ctx_block);
    int64_t n_k = read_len - C.l_ek + 1;
    int64_t n_out = 0;
    if (n_k <= 0 || n_seeds == 0) return 0;
    uint64_t *kmers = (uint64_t *)malloc((size_t)n_k * 8);
    if (!kmers) return -1;
    store_kmers_vals(buf + base, n_k, C.l_ek, C.single_base_max, kmers);
    uint64_t spset[SPSET_CAP + 1];
    int64_t spcount = 0;
    int64_t fmrows[64 * 4];

    if (mode == 0) { /* fast: top islands, adaptive stride */
        int64_t min_index = C.min_mem_len_fast - C.l_ek;
        int64_t si = -1;
        while (si + 1 < n_seeds) {
            si += 1;
            const int32_t *sd = seeds + 3 * si;
            if (!sd[2]) continue;
            spcount = 0;
            int64_t a_b = n_out;
            int64_t j = sd[1] - 1;
            int skip_next = 0;
            while (j >= min_index) {
                int64_t k_idx = sd[0] + j;
                int64_t pre_v =
                    (int64_t)(kmers[k_idx] & (uint64_t)C.pre_idx_mask);
                if (j - 2 >= min_index)
                    /* hide the likely next probe's hash13 jumpstart
                       miss (the no-hit path steps -2; hint only,
                       +2.7% interleaved A/B) */
                    __builtin_prefetch(C.hash13 + (kmers[sd[0] + j - 2]
                        & (uint64_t)C.pre_idx_mask), 0, 1);
                int64_t s_idx = k_idx + C.l_ek - 1;
                int64_t nm = fm_mem_search(
                    C.fm_blocks, C.rank6, C.dollar_pos,
                    C.sa_mask, C.hash13, buf + base, s_idx, pre_v,
                    C.mem_search_fast, C.min_mem_len_fast - 1, s_idx,
                    C.l_pre_idx, spset, &spcount, fmrows, 64);
                if (nm == 0) { j -= 2; continue; }
                j -= 3;
                int64_t max_score = 0;
                for (int64_t r = 0; r < nm; r++) {
                    int64_t ml = fmrows[4 * r];
                    int64_t sc = ms_map_seed_core(
                        &C, buf, buf_len, base, read_len, fmrows[4 * r + 1],
                        s_idx - ml, ml,
                        fmrows[4 * r + 2], fmrows[4 * r + 3],
                        out, 13, out_cap, &n_out);
                    if (n_out < 0) { free(kmers); return -1; }
                    if (sc > max_score) max_score = sc;
                }
                if (max_score > 35) j -= 7;
                if (max_score > 256) {
                    if (max_score > 512) skip_next = 1;
                    break;
                }
            }
            int64_t top = 35;
            for (int64_t r = a_b; r < n_out; r++)
                if (out[13 * r + 1] > top) top = out[13 * r + 1];
            for (int64_t r = a_b; r < n_out; r++) {
                out[13 * r + 11] = si;
                out[13 * r + 12] = out[13 * r + 1] < top;
            }
            if (skip_next) si += 1;
        }
    } else { /* slow: all islands len>=3 (or first-top quirk), stride 2 */
        int64_t min_match_len = C.min_mem_len_slow - 1 < C.l_ek + 1
                                ? C.min_mem_len_slow - 1 : C.l_ek + 1;
        for (int64_t si = 0; si < n_seeds; si++) {
            const int32_t *sd = seeds + 3 * si;
            if (sd[1] < 3 && !seeds[2])  /* FIRST seed's top (cly.c:1564) */
                continue;
            spcount = 0;
            int64_t mem[512 * 5];
            int64_t nmem = 0;
            for (int64_t j = sd[1] - 1; j >= 1; j -= 2) {
                int64_t k_idx = sd[0] + j;
                int64_t pre_v =
                    (int64_t)(kmers[k_idx] & (uint64_t)C.pre_idx_mask);
                if (j - 2 >= 1)
                    __builtin_prefetch(C.hash13 + (kmers[sd[0] + j - 2]
                        & (uint64_t)C.pre_idx_mask), 0, 1);
                int64_t s_idx = k_idx + C.l_ek - 1;
                int64_t nm = fm_mem_search(
                    C.fm_blocks, C.rank6, C.dollar_pos,
                    C.sa_mask, C.hash13, buf + base, s_idx, pre_v,
                    C.mem_search_slow, min_match_len, s_idx,
                    C.l_pre_idx, spset, &spcount, fmrows, 64);
                for (int64_t r = 0; r < nm && nmem < 512; r++) {
                    int64_t *m = mem + 5 * nmem++;
                    m[0] = fmrows[4 * r];
                    m[1] = fmrows[4 * r + 1];
                    m[2] = fmrows[4 * r + 2];
                    m[3] = fmrows[4 * r + 3];
                    m[4] = s_idx - fmrows[4 * r];
                }
            }
            if (nmem == 0) continue;
            /* stable insertion sort, descending match_len (the python
               oracle's sorted(key=-match_len)) */
            for (int64_t i = 1; i < nmem; i++) {
                int64_t key[5];
                for (int k = 0; k < 5; k++) key[k] = mem[5 * i + k];
                int64_t p = i - 1;
                while (p >= 0 && mem[5 * p] < key[0]) {
                    for (int k = 0; k < 5; k++)
                        mem[5 * (p + 1) + k] = mem[5 * p + k];
                    p--;
                }
                for (int k = 0; k < 5; k++) mem[5 * (p + 1) + k] = key[k];
            }
            int64_t a_b = n_out;
            int64_t take = nmem < C.mem_search_slow ? nmem
                           : C.mem_search_slow;
            for (int64_t r = 0; r < take; r++) {
                ms_map_seed_core(&C, buf, buf_len, base, read_len,
                                 mem[5 * r + 1], mem[5 * r + 4],
                                 mem[5 * r], mem[5 * r + 2], mem[5 * r + 3],
                                 out, 13, out_cap, &n_out);
                if (n_out < 0) { free(kmers); return -1; }
            }
            int64_t top = 35;
            for (int64_t r = a_b; r < n_out; r++)
                if (out[13 * r + 1] > top) top = out[13 * r + 1];
            for (int64_t r = a_b; r < n_out; r++) {
                out[13 * r + 11] = si;
                out[13 * r + 12] = out[13 * r + 1] < top;
            }
        }
    }
    free(kmers);
    return n_out;
}

int64_t lv_extd(const uint8_t *ref, int64_t ref_length,
                const uint8_t *query, int64_t query_length,
                int64_t lv_error) {
    if (lv_error > LV_MAX_E) return -1;
    if (ref_length < query_length) {
        const uint8_t *tp = ref; ref = query; query = tp;
        int64_t tl = ref_length; ref_length = query_length; query_length = tl;
    }
    const int64_t base = lv_error;          /* LV_BASE == LV_ERROR */
    const int64_t off = base + 1;
    int64_t mn[2 * (LV_MAX_E + 1) + 3];
    int64_t ed[2 * (LV_MAX_E + 1) + 3];
    int64_t best = query_length;

    for (int64_t i = -base - 1; i <= base + 1; i++) {
        mn[off + i] = -1;
        ed[off + i] = i > 0 ? i : -i;
    }
    for (int64_t i = 0; i <= lv_error; i++) {
        int64_t prev_mn = -1, cur_mn = i - 1, next_mn = mn[off - i + 1];
        int64_t prev_ed = i + 1, cur_ed = i, next_ed = ed[off - i + 1];
        for (int64_t j = -i; j <= lv_error; j++) {
            int64_t max_mn_ed;
            if (cur_mn + j < ref_length - 1) {
                max_mn_ed = cur_mn + 1 - cur_ed;
                mn[off + j] = cur_mn + 1;
                ed[off + j] = cur_ed + 1;
                if (max_mn_ed < next_mn + 1 - next_ed) {
                    mn[off + j] = next_mn + 1;
                    ed[off + j] = next_ed + 1;
                    max_mn_ed = next_mn - next_ed;
                }
                if (max_mn_ed < prev_mn - prev_ed) {
                    mn[off + j] = prev_mn + 1;
                    ed[off + j] = prev_ed + 1;
                }
            } else {
                max_mn_ed = cur_mn - cur_ed;
                mn[off + j] = cur_mn;
                ed[off + j] = cur_ed + 1;
                if (max_mn_ed < prev_mn - prev_ed) {
                    mn[off + j] = prev_mn;
                    ed[off + j] = prev_ed + 1;
                    max_mn_ed = prev_mn - prev_ed;
                }
                if (max_mn_ed < next_mn + 1 - next_ed) {
                    mn[off + j] = next_mn + 1;
                    ed[off + j] = next_ed + 1;
                }
            }
            int64_t mn_j = mn[off + j];
            if (mn_j > query_length) mn_j = query_length;
            if (mn_j > ref_length - j) mn_j = ref_length - j;
            while (mn_j >= 0 && mn_j + j >= 0 && mn_j < query_length + 1
                   && mn_j + j < ref_length + 1
                   && rat(ref, ref_length, mn_j + j)
                      == qat(query, query_length, mn_j))
                mn_j++;
            mn[off + j] = mn_j;
            int hit = 0;
            if (mn_j >= 0 && mn_j < query_length + 1
                && qat(query, query_length, mn_j) == 255)
                hit = 1;
            if (mn_j + j >= 0 && mn_j + j < ref_length + 1
                && rat(ref, ref_length, mn_j + j) == 254)
                hit = 1;
            if (hit) {
                if (ed[off + j] - 1 < best) best = ed[off + j] - 1;
                if (j <= i + 1) return best;
            }
            prev_mn = cur_mn; cur_mn = next_mn; next_mn = mn[off + j + 2];
            prev_ed = cur_ed; cur_ed = next_ed; next_ed = ed[off + j + 2];
        }
    }
    return best;
}
