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
static int drv_code_init = 0;

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

/* Batch entry: seqs = concatenated ASCII reads, lens[n], effs[n] =
 * max(prefix max_read_l, len) per read (classify.py premax contract).
 * out_meta: (n,4) int64; out_chains: (n, chain_cap, 14) int64.
 * Returns 0, or -1 on allocation failure. */
int64_t classify_batch(const int64_t *dp, const char *seqs,
                       const int64_t *lens, const int64_t *effs,
                       int64_t n_reads, int64_t *out_meta,
                       int64_t *out_chains, int64_t chain_cap) {
    if (!drv_code_init) {
        for (int i = 0; i < 256; i++) DRV_CODE[i] = 1;
        DRV_CODE['A'] = DRV_CODE['a'] = 0;
        DRV_CODE['C'] = DRV_CODE['c'] = 1;
        DRV_CODE['G'] = DRV_CODE['g'] = 2;
        DRV_CODE['T'] = DRV_CODE['t'] = 3;
        drv_code_init = 1;
    }
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
