/* Index-build hot kernel: the unitig walk.
 *
 * The array-parallel builder (index/build.py) derives each k-mer's
 * (unitig id, offset, BWT prev-char) from the dBG successor links. The
 * numpy pointer-doubling formulation costs O(n log L) random gathers
 * (~800 s at a 256 MB genome); walking each unitig serially is O(n)
 * single-dependency lookups (~20 s). Semantics mirror build.py exactly:
 * unitig ids are assigned in ascending start-kmer order, prev_char is
 * the predecessor k-mer's first base, '#' (4) for starts, '$' (5) for
 * the lowest start k-mer (src/idx.c:722-854).
 *
 * succ: int64 successor index per k-mer (self for ends);
 * is_start/is_end: uint8 flags; first_base: uint8 per k-mer.
 * Outputs: uid (int64), off (int64), prev_char (uint8).
 * Returns n_uni, or -1 when the graph has a start-less cycle /
 * uncovered k-mers (caller falls back to the numpy path).
 */
#include <stdint.h>

int64_t unitig_walk(const int64_t *succ, const uint8_t *is_start,
                    const uint8_t *is_end, const uint8_t *first_base,
                    int64_t n_kmer, int64_t *uid, int64_t *off,
                    uint8_t *prev_char) {
    int64_t n_uni = 0;
    int64_t visited = 0;
    for (int64_t s = 0; s < n_kmer; s++) {
        if (!is_start[s]) continue;
        int64_t u = n_uni++;
        int64_t cur = s;
        int64_t dist = 0;
        uid[cur] = u;
        off[cur] = 0;
        prev_char[cur] = 4; /* '#' */
        visited++;
        while (!is_end[cur]) {
            int64_t nxt = succ[cur];
            if (nxt == cur || dist > n_kmer) return -1;
            prev_char[nxt] = first_base[cur];
            dist++;
            cur = nxt;
            uid[cur] = u;
            off[cur] = dist;
            visited++;
        }
    }
    if (visited != n_kmer) return -1;
    return n_uni;
}

/* sort_unique_u64: sorted unique values + inverse map (the builder's
 * np.unique(vals, return_inverse=True) over the genome's 31-mers —
 * jellyfish + kmersort equivalent, src/idx_sort.c). 8-pass LSD radix
 * carrying the original index; one walk emits unique ranks. Returns
 * the unique count, or -1 on allocation failure. */
#include <stdlib.h>
#include <string.h>

int64_t sort_unique_u64(const uint64_t *vals, int64_t n,
                        uint64_t *uniq, int64_t *inverse) {
    if (n <= 0) return 0;
    uint64_t *va = (uint64_t *)malloc((size_t)n * 8);
    uint64_t *vb = (uint64_t *)malloc((size_t)n * 8);
    int64_t *ia = (int64_t *)malloc((size_t)n * 8);
    int64_t *ib = (int64_t *)malloc((size_t)n * 8);
    if (!va || !vb || !ia || !ib) {
        free(va); free(vb); free(ia); free(ib);
        return -1;
    }
    memcpy(va, vals, (size_t)n * 8);
    for (int64_t i = 0; i < n; i++) ia[i] = i;
    int64_t hist[256];
    for (int pass = 0; pass < 8; pass++) {
        int shift = pass * 8;
        memset(hist, 0, sizeof(hist));
        for (int64_t i = 0; i < n; i++)
            hist[(va[i] >> shift) & 255]++;
        if (hist[0] == n) continue;  /* all high bytes zero: done early */
        int64_t acc = 0;
        for (int b = 0; b < 256; b++) {
            int64_t t = hist[b];
            hist[b] = acc;
            acc += t;
        }
        for (int64_t i = 0; i < n; i++) {
            int64_t at = hist[(va[i] >> shift) & 255]++;
            vb[at] = va[i];
            ib[at] = ia[i];
        }
        uint64_t *tv = va; va = vb; vb = tv;
        int64_t *ti = ia; ia = ib; ib = ti;
    }
    int64_t nu = 0;
    for (int64_t i = 0; i < n; i++) {
        if (i == 0 || va[i] != va[i - 1])
            uniq[nu++] = va[i];
        inverse[ia[i]] = nu - 1;
    }
    free(va); free(vb); free(ia); free(ib);
    return nu;
}

/* unitig_walk_stream: the external builder's RAM-bounded walk.
 * succ is int32 (fits n_kmer < 2^31, held in RAM); outputs are emitted
 * in POSITION order (uid ascending, offset ascending — the walk's own
 * order), so the big memmapped outputs receive purely sequential
 * writes: pos2k[text_pos] = kmer index, pos_char[text_pos] = the
 * position's text char (the kmer's first base; unitig tails are filled
 * by the python side from the end kmer), prevc_pos[text_pos] = the
 * row's BWT char stash (prev kmer's first base; '#' at unitig starts).
 * uni_end_kmer_idx[uid] = index of the unitig's end kmer;
 * uni_len[uid] = kmer count + 30. Returns n_uni or -1 on a cycle. */
int64_t unitig_walk_stream(const int32_t *succ, const uint8_t *is_start,
                           const uint8_t *is_end, const uint8_t *first_base,
                           int64_t n_kmer, int32_t *pos2k,
                           uint8_t *prevc_pos, int64_t *uni_end_kmer,
                           uint32_t *uni_len_out) {
    int64_t n_uni = 0;
    int64_t visited = 0;
    int64_t pos = 0;
    for (int64_t s = 0; s < n_kmer; s++) {
        if (!is_start[s]) continue;
        int64_t u = n_uni++;
        int64_t cur = s;
        int64_t dist = 0;
        pos2k[pos] = (int32_t)cur;
        prevc_pos[pos] = 4; /* '#' */
        pos++;
        visited++;
        while (!is_end[cur]) {
            int64_t nxt = succ[cur];
            if (nxt == cur || dist > n_kmer) return -1;
            prevc_pos[pos] = first_base[cur];
            dist++;
            cur = nxt;
            pos2k[pos] = (int32_t)cur;
            pos++;
            visited++;
        }
        uni_end_kmer[u] = cur;
        uni_len_out[u] = (uint32_t)(dist + 31);
        pos += 31; /* the end kmer's remaining 30 bases + separator */
    }
    if (visited != n_kmer) return -1;
    return n_uni;
}
