/* Per-read classify driver: the full fast/slow mode ladder of
 * src/cly.c:3064-3132 run natively over the csrc kernels, plus a batch
 * entry that loops many reads in one GIL-releasing call.
 *
 * Pipeline per read (mirrors ClassifyEngine._classify_read_rows in
 * desamba_tpu/engine/gold/classify.py, the parity-tested row path):
 *   encode F+R -> lazy_islands x2 -> direction order + "both" ->
 *   classify_dir(fast) -> resolve_tree_m2 -> maybe classify_dir(slow)
 *   -> rescore_finish.  Any kernel's fallback signal (-1) marks the
 *   read for the python oracle path (M3 chaining, caps, overflows).
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* kernels from goldhot.c / rescorehot.c */
int64_t lazy_islands(const uint8_t *bin_read, int64_t n_kmers, int64_t l_ek,
                     int64_t single_base_max, const uint8_t *ek0,
                     const uint8_t *ek1, uint64_t hash_mask, int64_t step_ek,
                     int64_t seed_range, int32_t forward, int32_t *out,
                     int64_t cap, int64_t *total_out);
int64_t classify_dir(const int64_t *ctx_block, const uint8_t *buf,
                     int64_t buf_len, int64_t base, int64_t read_len,
                     const int32_t *seeds, int64_t n_seeds, int mode,
                     int64_t *out, int64_t out_cap);
int64_t resolve_tree_m2(const int64_t *arows, int64_t n,
                        int64_t m3_threshold, int64_t max_dis_minus,
                        int64_t max_waiting_len, int64_t *chains_out,
                        int64_t cmax, int64_t *anc3_out, int64_t amax);
int64_t rescore_finish(const int64_t *params, int64_t *chains_io,
                       int64_t nc, const int64_t *anc3);

#define DRV_FORWARD 1  /* desc.h FORWARD/REVERSE codes */
#define DRV_REVERSE 0
#define DRV_ROWCAP 8192    /* classify_dir row cap (io/native.py cd_out) */
#define DRV_CATCAP 16384   /* two directions of ladder rows */
#define DRV_CCAP 64        /* resolve_tree_m2 chain/anchor caps */

typedef struct {
    uint8_t *buf;      /* 2 * max_len F+R codes */
    int32_t *seeds[2]; /* per-direction islands */
    int64_t *rows13;   /* one classify_dir call's rows */
    int64_t *cat14;    /* concatenated 14-col anchor rows */
} DrvScratch;

static uint8_t DRV_CODE[256];

/* Eager init (library constructor): the classify entry points may be
 * called from multiple host threads with the GIL released; a lazy init
 * here would be a (benign-looking but real) data race. */
__attribute__((constructor)) static void drv_code_ctor(void) {
    for (int i = 0; i < 256; i++) DRV_CODE[i] = 1;
    DRV_CODE['A'] = DRV_CODE['a'] = 0;
    DRV_CODE['C'] = DRV_CODE['c'] = 1;
    DRV_CODE['G'] = DRV_CODE['g'] = 2;
    DRV_CODE['T'] = DRV_CODE['t'] = 3;
}

/* dp layout (int64): 0 ms_ctx ptr, 1 rf template ptr (18 slots),
 * 2 ek0 ptr, 3 ek1 ptr, 4 e_hash_mask, 5 step_ek, 6 seed_range,
 * 7 m3_threshold, 8 max_dis_minus, 9 max_waiting_len, 10 min_read_len */
typedef struct {
    const int64_t *ctx;
    const int64_t *rf;
    const uint8_t *ek0, *ek1;
    uint64_t e_hash_mask;
    int64_t step_ek, seed_range;
    int64_t m3, max_dis_minus, max_waiting_len, min_read_len;
    int64_t l_ek, single_base_max;
} Drv;

static void drv_load(Drv *d, const int64_t *dp) {
    d->ctx = (const int64_t *)dp[0];
    d->rf = (const int64_t *)dp[1];
    d->ek0 = (const uint8_t *)dp[2];
    d->ek1 = (const uint8_t *)dp[3];
    d->e_hash_mask = (uint64_t)dp[4];
    d->step_ek = dp[5];
    d->seed_range = dp[6];
    d->m3 = dp[7];
    d->max_dis_minus = dp[8];
    d->max_waiting_len = dp[9];
    d->min_read_len = dp[10];
    d->l_ek = d->ctx[31];            /* mapseed._ms_ctx layout (ms_load) */
    d->single_base_max = d->ctx[32];
}

/* one ladder call appended into cat14 with the direction column;
 * returns new row count or -1 */
static int64_t drv_ladder(const Drv *d, const uint8_t *buf, int64_t buf_len,
                          int64_t base, int64_t read_len,
                          const int32_t *seeds, int64_t n_seeds, int mode,
                          int64_t direction, DrvScratch *S, int64_t n_cat) {
    if (n_seeds == 0) return n_cat;
    int64_t n = classify_dir(d->ctx, buf, buf_len, base, read_len, seeds,
                             n_seeds, mode, S->rows13, DRV_ROWCAP);
    if (n < 0 || n_cat + n > DRV_CATCAP) return -1;
    for (int64_t r = 0; r < n; r++) {
        int64_t *o = S->cat14 + 14 * (n_cat + r);
        memcpy(o, S->rows13 + 13 * r, 13 * sizeof(int64_t));
        o[13] = direction;
    }
    return n_cat + n;
}

/* meta: [status, n_chains, n_anchors, fast]; chains_out: 64x14.
 * status 0 = done, -1 = python fallback. */
static void drv_classify_one(const Drv *d, const char *seq, int64_t len,
                             int64_t eff, int64_t *meta, int64_t *chains_out,
                             DrvScratch *S) {
    meta[0] = 0; meta[1] = 0; meta[2] = 0; meta[3] = 1;
    if (len < d->min_read_len) return;
    uint8_t *buf = S->buf;
    for (int64_t j = 0; j < len; j++) {
        uint8_t c = DRV_CODE[(uint8_t)seq[j]];
        buf[j] = c;
        buf[2 * len - 1 - j] = 3 - c;
    }
    int64_t n_k = len - d->l_ek + 1;
    if (n_k <= 0) return;
    int64_t scap = n_k / 2 + 4;
    if (scap < 64) scap = 64;
    /* both directions' islands (gold islands.get_islands) */
    int64_t n_seeds[2], totals[2];
    for (int di = 0; di < 2; di++) {
        int fwd = (di == 0);
        int64_t tot = 0;
        int64_t n = lazy_islands(buf + (fwd ? 0 : len), n_k, d->l_ek,
                                 d->single_base_max, d->ek0, d->ek1,
                                 d->e_hash_mask, d->step_ek, d->seed_range,
                                 fwd, S->seeds[di], scap, &tot);
        if (n < 0) { meta[0] = -1; return; }
        n_seeds[di] = n;
        totals[di] = tot;
    }
    /* best direction first; forward wins ties (cly.c:1261-1266) */
    int first = totals[0] >= totals[1] ? 0 : 1;
    int second = 1 - first;
    int both = (totals[first] - totals[second]) <= (totals[first] >> 3);
    int64_t dircode[2];
    dircode[0] = DRV_FORWARD;  /* index by buffer slot, not order */
    dircode[1] = DRV_REVERSE;
    int64_t bases[2] = {0, len};

    int64_t chains[DRV_CCAP * 14];
    int64_t anc3[DRV_CCAP * 3];
    int64_t nc, n_cat;

    /* fast ladders */
    n_cat = drv_ladder(d, buf, 2 * len, bases[first], len, S->seeds[first],
                       n_seeds[first], 0, dircode[first], S, 0);
    if (n_cat < 0) { meta[0] = -1; return; }
    if (both) {
        n_cat = drv_ladder(d, buf, 2 * len, bases[second], len,
                           S->seeds[second], n_seeds[second], 0,
                           dircode[second], S, n_cat);
        if (n_cat < 0) { meta[0] = -1; return; }
    }
    nc = resolve_tree_m2(S->cat14, n_cat, d->m3, d->max_dis_minus,
                         d->max_waiting_len, chains, DRV_CCAP, anc3,
                         DRV_CCAP);
    if (nc < 0) { meta[0] = -1; return; }

    /* run_slow decision (cly.c:3097-3127 via the row path) */
    int run_slow = 0;
    if (nc == 0) {
        run_slow = 1;
    } else if (chains[2] < 5) { /* anchor_number; super_repeat==0 here */
        run_slow = 1;
        if (len <= 300 && chains[1] > 200) run_slow = 0;
    }
    if (run_slow) {
        meta[3] = 0;
        n_cat = drv_ladder(d, buf, 2 * len, bases[first], len,
                           S->seeds[first], n_seeds[first], 1,
                           dircode[first], S, 0);
        if (n_cat < 0) { meta[0] = -1; return; }
        nc = resolve_tree_m2(S->cat14, n_cat, d->m3, d->max_dis_minus,
                             d->max_waiting_len, chains, DRV_CCAP, anc3,
                             DRV_CCAP);
        if (nc < 0) { meta[0] = -1; return; }
        if (both || nc == 0 || chains[2] < 5) {
            n_cat = drv_ladder(d, buf, 2 * len, bases[second], len,
                               S->seeds[second], n_seeds[second], 1,
                               dircode[second], S, n_cat);
            if (n_cat < 0) { meta[0] = -1; return; }
            nc = resolve_tree_m2(S->cat14, n_cat, d->m3, d->max_dis_minus,
                                 d->max_waiting_len, chains, DRV_CCAP, anc3,
                                 DRV_CCAP);
            if (nc < 0) { meta[0] = -1; return; }
        }
    }
    meta[2] = n_cat;
    if (nc == 0) return;
    /* rescore + merge/filter + primary (rescorehot.c) */
    int64_t params[18];
    memcpy(params, d->rf, 18 * sizeof(int64_t));
    params[4] = (int64_t)buf;
    params[5] = 2 * len;
    params[6] = len;
    params[8] = eff;
    int64_t fin = rescore_finish(params, chains, nc, anc3);
    if (fin < 0) { meta[0] = -1; return; }
    meta[1] = fin;
    memcpy(chains_out, chains, (size_t)fin * 14 * sizeof(int64_t));
}

/* ---- SAM emitter (io/sam.py format_sam, byte-faithful) ------------- */

static char *put_s(char *p, const char *s, int64_t n) {
    memcpy(p, s, (size_t)n);
    return p + n;
}

/* uint32 chain coordinates printed with %d (reference cly_mt.c):
 * wrapped values (left extension crossed the ref start) print negative */
static int64_t drv_i32(int64_t x) {
    x &= 0xFFFFFFFFll;
    return x >= 0x80000000ll ? x - 0x100000000ll : x;
}

static char *put_i(char *p, int64_t v) {
    char tmp[24];
    int k = 0;
    if (v == 0) { *p++ = '0'; return p; }
    if (v < 0) { *p++ = '-'; v = -v; }
    while (v > 0) { tmp[k++] = (char)('0' + v % 10); v /= 10; }
    while (k > 0) *p++ = tmp[--k];
    return p;
}

/* one read's SAM record(s); returns bytes needed. Writes only while
 * the result fits in [out, out+cap). */
static int64_t sam_one(const char *name, int64_t name_l, const char *seq,
                       const char *qual, int64_t read_l, int64_t output_seq,
                       const int64_t *chains, int64_t nc,
                       const char *ref_names, const int64_t *ref_offs,
                       int64_t max_sec_n, char *out, int64_t cap) {
    /* worst case per line: name + ref + seq/qual + ~120 of numbers */
    char stack[512];
    int64_t w = 0;
    const char *seq_s = output_seq ? seq : "*";
    int64_t seq_l = output_seq ? read_l : 1;
    const char *qual_s = (output_seq && qual) ? qual : "*";
    int64_t qual_l = (output_seq && qual) ? read_l : 1;
    if (nc == 0) {
        int64_t need = name_l + seq_l + qual_l + 24;
        if (w + need <= cap) {
            char *p = out;
            p = put_s(p, name, name_l);
            p = put_s(p, "\t4\t*\t0\t0\t*\t*\t0\t0\t", 17);
            p = put_s(p, seq_s, seq_l);
            *p++ = '\t';
            p = put_s(p, qual_s, qual_l);
            *p++ = '\t'; *p++ = '\n';
            return p - out;
        }
        return need;
    }
    const int64_t *c0 = chains;
    int64_t mapq_pri;
    if (nc == 1 || (c0[1] - chains[14 + 1] > 5)) mapq_pri = 30;
    else mapq_pri = (c0[1] - chains[14 + 1]) << 2;
    for (int pass = 0; pass < 3; pass++) {
        int64_t lo = pass == 0 ? 0 : 1;
        for (int64_t i = lo; i < (pass == 0 ? 1 : nc); i++) {
            const int64_t *c = chains + 14 * i;
            int64_t flag = c[3] ? 0 : 0x10;
            int64_t mapq = 0;
            char hs = 'S';
            const char *sq = "*", *ql = "*";
            int64_t sql = 1, qll = 1;
            if (pass == 0) {
                mapq = mapq_pri;
                sq = seq_s; sql = seq_l; ql = qual_s; qll = qual_l;
            } else if (pass == 1) {
                if (c[13] != 0) continue;       /* pri_index */
                flag += 0x800;
                mapq = mapq_pri < 30 ? mapq_pri : 30;
                hs = 'H';
            } else {
                if (!(c[13] > 0 && c[13] <= max_sec_n)) continue;
                flag += 0x100;
            }
            const char *rn = ref_names + ref_offs[c[0]];
            int64_t rn_l = ref_offs[c[0] + 1] - ref_offs[c[0]];
            char *p = stack;
            *p++ = '\t';
            p = put_i(p, flag); *p++ = '\t';
            /* ref name copied outside the stack buffer (can be long) */
            char *head_end = p;
            p = stack + 64;     /* second scratch region: after-ref part */
            p = put_i(p, drv_i32(c[5])); *p++ = '\t';   /* t_st */
            p = put_i(p, mapq); *p++ = '\t';
            p = put_i(p, drv_i32(c[7])); *p++ = hs;      /* q_st */
            p = put_i(p, drv_i32(c[8] - c[7])); *p++ = 'M';
            p = put_i(p, drv_i32(read_l - c[8])); *p++ = hs;
            p = put_s(p, "\t*\t0\t0\t", 7);
            char *mid_end = p;
            int64_t need = name_l + (head_end - stack) + rn_l + 1 +
                           (mid_end - (stack + 64)) + sql + 1 + qll +
                           6 + 20 + 2;
            if (w + need <= cap) {
                char *q = out + w;
                q = put_s(q, name, name_l);
                q = put_s(q, stack, head_end - stack);
                q = put_s(q, rn, rn_l);
                *q++ = '\t';
                q = put_s(q, stack + 64, mid_end - (stack + 64));
                q = put_s(q, sq, sql);
                *q++ = '\t';
                q = put_s(q, ql, qll);
                q = put_s(q, "\tAS:i:", 6);
                q = put_i(q, c[1]);
                *q++ = '\t'; *q++ = '\n';
                w = q - out;
            } else {
                w += need;   /* overflow: keep counting bytes needed */
                cap = -1;    /* force count-only from here on */
            }
        }
    }
    return w;
}

/* Batch entry with SAM formatting fused in. names/ref_names are
 * concatenated blobs with offs[n+1]; quals may be NULL (then "*").
 * out_offs: (n+1) int64 record boundaries; meta as classify_batch.
 * Returns total bytes written, or -(bytes needed) when out_cap was too
 * small (caller re-allocates and retries), or INT64_MIN on alloc
 * failure. */
int64_t classify_batch_sam(const int64_t *dp, const char *seqs,
                           const int64_t *lens, const int64_t *effs,
                           int64_t n_reads, const char *names,
                           const int64_t *name_offs, const char *quals,
                           const char *ref_names, const int64_t *ref_offs,
                           int64_t max_sec_n, int64_t output_seq,
                           int64_t *out_meta, char *out, int64_t out_cap,
                           int64_t *out_offs) {
    int64_t rc = 0;
    Drv d;
    drv_load(&d, dp);
    int64_t max_len = 1;
    for (int64_t i = 0; i < n_reads; i++)
        if (lens[i] > max_len) max_len = lens[i];
    DrvScratch S;
    int64_t scap = max_len / 2 + 68;
    S.buf = (uint8_t *)malloc((size_t)(2 * max_len));
    S.seeds[0] = (int32_t *)malloc((size_t)scap * 3 * sizeof(int32_t));
    S.seeds[1] = (int32_t *)malloc((size_t)scap * 3 * sizeof(int32_t));
    S.rows13 = (int64_t *)malloc(DRV_ROWCAP * 13 * sizeof(int64_t));
    S.cat14 = (int64_t *)malloc(DRV_CATCAP * 14 * sizeof(int64_t));
    int64_t *chains = (int64_t *)malloc(DRV_CCAP * 14 * sizeof(int64_t));
    if (!S.buf || !S.seeds[0] || !S.seeds[1] || !S.rows13 || !S.cat14 ||
        !chains) {
        rc = INT64_MIN;
        goto done;
    }
    {
        int64_t off = 0, w = 0, short_cap = 0;
        for (int64_t i = 0; i < n_reads; i++) {
            int64_t meta[4];
            drv_classify_one(&d, seqs + off, lens[i], effs[i], meta, chains,
                             &S);
            out_meta[4 * i] = meta[0];
            out_meta[4 * i + 1] = meta[1];
            out_meta[4 * i + 2] = meta[2];
            out_meta[4 * i + 3] = meta[3];
            out_offs[i] = w;
            if (meta[0] == 0) {
                int64_t need = sam_one(
                    names + name_offs[i], name_offs[i + 1] - name_offs[i],
                    seqs + off, quals ? quals + off : 0, lens[i],
                    output_seq, chains, meta[1], ref_names, ref_offs,
                    max_sec_n, out + w, short_cap ? -1 : out_cap - w);
                if (!short_cap && w + need > out_cap) short_cap = 1;
                w += need;
            }
            off += lens[i];
        }
        out_offs[n_reads] = w;
        rc = short_cap ? -w : w;
    }
done:
    free(S.buf); free(S.seeds[0]); free(S.seeds[1]);
    free(S.rows13); free(S.cat14); free(chains);
    return rc;
}

/* Batch entry: seqs = concatenated ASCII reads, lens[n], effs[n] =
 * max(prefix max_read_l, len) per read (classify.py premax contract).
 * out_meta: (n,4) int64; out_chains: (n, chain_cap, 14) int64.
 * Returns 0, or -1 on allocation failure. */
int64_t classify_batch(const int64_t *dp, const char *seqs,
                       const int64_t *lens, const int64_t *effs,
                       int64_t n_reads, int64_t *out_meta,
                       int64_t *out_chains, int64_t chain_cap) {
    Drv d;
    drv_load(&d, dp);
    if (chain_cap < DRV_CCAP) return -1;
    int64_t max_len = 1;
    for (int64_t i = 0; i < n_reads; i++)
        if (lens[i] > max_len) max_len = lens[i];
    DrvScratch S;
    int64_t scap = max_len / 2 + 68;
    S.buf = (uint8_t *)malloc((size_t)(2 * max_len));
    S.seeds[0] = (int32_t *)malloc((size_t)scap * 3 * sizeof(int32_t));
    S.seeds[1] = (int32_t *)malloc((size_t)scap * 3 * sizeof(int32_t));
    S.rows13 = (int64_t *)malloc(DRV_ROWCAP * 13 * sizeof(int64_t));
    S.cat14 = (int64_t *)malloc(DRV_CATCAP * 14 * sizeof(int64_t));
    if (!S.buf || !S.seeds[0] || !S.seeds[1] || !S.rows13 || !S.cat14) {
        free(S.buf); free(S.seeds[0]); free(S.seeds[1]);
        free(S.rows13); free(S.cat14);
        return -1;
    }
    int64_t off = 0;
    for (int64_t i = 0; i < n_reads; i++) {
        drv_classify_one(&d, seqs + off, lens[i], effs[i], out_meta + 4 * i,
                         out_chains + chain_cap * 14 * i, &S);
        off += lens[i];
    }
    free(S.buf); free(S.seeds[0]); free(S.seeds[1]);
    free(S.rows13); free(S.cat14);
    return 0;
}
