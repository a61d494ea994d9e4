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
