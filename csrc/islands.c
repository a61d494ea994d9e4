/* Batched island segmentation + top marking from existence-probe hits.
 *
 * Native port of engine/gold/islands.py search_islands/mark_top
 * (src/cly.c:1083-1226 semantics): the per-(read,direction) phase-chained
 * walk is inherently serial per strand, so it runs here in C over the
 * whole batch instead of per-read Python (the device classifier's last
 * host hot loop). Differential-tested against the Python walk by
 * tests/test_device_engine.py (same SAM goldens) and
 * tests/test_native_islands.py.
 */
#include <stdint.h>
#include <string.h>

#define FWD 1

/* Segment one strand's hit row into seeds (offset, len, top=0). Returns
 * the seed count written (<= cap). */
static int64_t segment_one(const uint8_t *hit, int32_t n_k, int32_t dir,
                           int32_t step_ek, int32_t *out, int64_t cap) {
    int64_t n = 0;
    if (n_k <= 0) return 0;
    if (dir == FWD) {
        int64_t p = step_ek - 1;
        int64_t i = 0;
        while (i < n_k) {
            while (i < n_k && !hit[i]) i++;
            if (i >= n_k) break;
            int64_t a = i;
            while (i < n_k && hit[i]) i++;
            int64_t b = i;
            for (;;) {
                if (p < a) {
                    int64_t d = (a - p) % step_ek;
                    p = a + ((step_ek - d) % step_ek);
                }
                if (p >= b) break;
                int64_t o = p - 2 > a ? p - 2 : a;
                int64_t ln = b - o < 61 ? b - o : 61;
                if (n < cap) {
                    out[3 * n] = (int32_t)o;
                    out[3 * n + 1] = (int32_t)ln;
                    out[3 * n + 2] = 0;
                }
                n++;
                p = o + ln + step_ek;
            }
        }
        return n;
    }
    /* reverse: scan runs right-to-left */
    int64_t p = n_k - step_ek;
    int64_t i = n_k - 1;
    while (i >= 0) {
        while (i >= 0 && !hit[i]) i--;
        if (i < 0) break;
        int64_t bm1 = i; /* run end - 1 */
        while (i >= 0 && hit[i]) i--;
        int64_t a = i + 1;
        for (;;) {
            if (p > bm1) {
                int64_t d = (p - bm1) % step_ek;
                p = bm1 - ((step_ek - d) % step_ek);
            }
            if (p < a) break;
            int64_t top = p + 2 < bm1 ? p + 2 : bm1;
            int64_t ln = top - a + 1 < 61 ? top - a + 1 : 61;
            if (n < cap) {
                out[3 * n] = (int32_t)(top - ln + 1);
                out[3 * n + 1] = (int32_t)ln;
                out[3 * n + 2] = 0;
            }
            n++;
            p = top - ln - step_ek;
        }
    }
    return n;
}

/* mark_top (src/cly.c:1174-1226): sets seeds[.][2], returns total_score */
static int64_t mark_top_one(int32_t *seeds, int64_t n_seeds, int32_t n_k,
                            int32_t dir, int32_t seed_range) {
    int64_t total = 0, max_index = 0, max_len = 0, index_end = seed_range;
    for (int64_t m = 0; m < n_seeds; m++) {
        seeds[3 * m + 2] = 0;
        int64_t key = dir == FWD ? seeds[3 * m]
                                 : n_k - seeds[3 * m] - seeds[3 * m + 1];
        if (key < index_end) {
            if (max_len < seeds[3 * m + 1]) {
                max_len = seeds[3 * m + 1];
                max_index = m;
            }
            seeds[3 * max_index + 2] = 0;
        } else {
            seeds[3 * max_index + 2] = 1;
            index_end += seed_range;
            total += max_len;
            max_index = m;
            max_len = seeds[3 * m + 1];
        }
    }
    if (n_seeds > 0)
        seeds[3 * max_index + 2] = 1;
    total += max_len;
    return total;
}

/* Batch driver. hits: n_strands rows x stride bytes (0/1). dirs per
 * strand. Seeds for strand s land at out + 3*offs[s], counts in
 * counts[s], total_score in totals[s]. Returns total seeds needed
 * (> cap means the caller must grow the buffer and retry). */
int64_t islands_batch(const uint8_t *hits, int64_t stride,
                      const int32_t *n_kmers, const int32_t *dirs,
                      int64_t n_strands, int32_t step_ek,
                      int32_t seed_range, int32_t *out, int64_t cap,
                      int64_t *offs, int64_t *counts, int64_t *totals) {
    int64_t used = 0;
    for (int64_t s = 0; s < n_strands; s++) {
        int64_t room = cap - used > 0 ? cap - used : 0;
        int64_t n = segment_one(hits + s * stride, n_kmers[s], dirs[s],
                                step_ek, out + 3 * used, room);
        offs[s] = used;
        counts[s] = n;
        if (n <= room)
            totals[s] = mark_top_one(out + 3 * used, n, n_kmers[s],
                                     dirs[s], seed_range);
        else
            totals[s] = -1;
        used += n;
    }
    return used;
}
