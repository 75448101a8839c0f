/* Native host runtime for imsame_tpu.
 *
 * The TPU does the alignment math; these routines are the host side of the
 * pipeline -- index construction and candidate-stream expansion -- where the
 * reference spends its single-threaded C time (dict build src/IMSAME.c:232-281,
 * per-thread k-mer scan src/alignmentFunctions.c:91-121).  They replace the
 * multi-pass numpy formulations with single-pass C: a counting sort over the
 * 4^k key space instead of argsort, and fused rolling-key + bucket-lookup +
 * prefix-sum loops.
 *
 * Semantics are bit-compatible with the numpy paths (tests/test_native.py
 * checks exact equality); layout contracts:
 *   codes  uint8[total_len]   2-bit base codes (A=0 C=1 G=2 T=3)
 *   fresh  uint8[total_len]   1 where the k-mer window restarts (read start
 *                             or preceded by a dropped non-newline char,
 *                             reference src/IMSAME.c:229-231)
 *   bucket_start int32[4^k+1] exclusive prefix table; bucket of key b is
 *                             rows [bucket_start[b], bucket_start[b+1])
 *   index rows sorted by (key asc, pos desc) -- descending pos reproduces
 *   the reference's prepend-on-insert "newest first" hit order
 *   (src/IMSAME.c:263-276, SURVEY.md quirk 6.1).
 *
 * Build: gcc -O3 -shared -fPIC (see native/__init__.py); no dependencies.
 */

#include <stdint.h>

#define EXPORT __attribute__((visibility("default")))

static inline uint32_t key_mask(int32_t k) {
    return (k >= 16) ? 0xFFFFFFFFu : ((1u << (2 * k)) - 1u);
}

/* Pass 1 of the index build: count valid k-mers per key.
 *
 * A k-mer starting at p is valid iff its k bases were appended with no
 * window reset in between: no fresh flag at p+1..p+k-1 (fresh[p] itself is
 * where the current run *starts*).  Counts accumulate into
 * bucket_start[key+1] so pass 2 can prefix-sum in place.
 * Returns the total number of valid k-mers. */
EXPORT int64_t imsame_index_count(
    const uint8_t *codes, const uint8_t *fresh, int64_t n, int32_t k,
    int32_t *bucket_start /* [4^k+1], zeroed by caller */) {
    if (n < k) return 0;
    const uint32_t mask = key_mask(k);
    uint32_t key = 0;
    int64_t run = 0, total = 0;
    for (int64_t p = 0; p < n; p++) {
        key = ((key << 2) | codes[p]) & mask;
        run = fresh[p] ? 1 : run + 1;
        if (p >= k - 1 && run >= k) {
            bucket_start[key + 1]++;
            total++;
        }
    }
    return total;
}

/* Pass 2: in-place prefix sum of the counts, then a counting-sort scatter.
 *
 * The scatter walks positions in ascending order and fills each bucket from
 * its END downward, so entries within a bucket end up in descending pos
 * order -- the reference's newest-first iteration -- in one linear pass
 * (numpy needs a full stable radix argsort for the same result).
 *
 * out_packed additionally receives the device-payload word
 * (sid << 12) | (pos - start[sid]) per entry -- the one-word index table
 * the TPU gate gathers (pipeline.py); emitting it here saves the caller a
 * 4-million-row random gather into start[].  Only meaningful when
 * n_seqs < 2^20 and read lengths < 4096 (the caller checks before use). */
EXPORT void imsame_index_fill(
    const uint8_t *codes, const uint8_t *fresh,
    const int64_t *start, int64_t n_seqs,
    int64_t n, int32_t k, int64_t n_buckets,
    int32_t *bucket_start /* in: [b+1]=count(b); out: prefix table */,
    int32_t *fill /* [n_buckets] scratch */,
    uint32_t *out_keys, int32_t *out_pos, int32_t *out_sid,
    uint32_t *out_packed) {
    int64_t acc = 0;
    for (int64_t b = 0; b <= n_buckets; b++) {
        acc += bucket_start[b];
        bucket_start[b] = (int32_t)acc;
    }
    for (int64_t b = 0; b < n_buckets; b++) fill[b] = bucket_start[b + 1];
    if (n < k) return;
    const uint32_t mask = key_mask(k);
    uint32_t key = 0;
    int64_t run = 0, r = 0;
    for (int64_t p = 0; p < n; p++) {
        key = ((key << 2) | codes[p]) & mask;
        run = fresh[p] ? 1 : run + 1;
        if (p >= k - 1 && run >= k) {
            int64_t ps = p - k + 1; /* k-mer start; ascending across the loop */
            while (r + 1 < n_seqs && start[r + 1] <= ps) r++;
            int32_t o = --fill[key];
            out_keys[o] = key;
            out_pos[o] = (int32_t)(p + 1); /* one past the last base,
                                              reference src/IMSAME.c:247 */
            out_sid[o] = (int32_t)r;
            out_packed[o] =
                ((uint32_t)r << 12) | (uint32_t)(p + 1 - start[r]);
        }
    }
}

/* Query candidate-stream tables: fused rolling key + bucket lookup + prefix
 * sum (the numpy path needs five multi-megabyte temporaries and two random
 * gathers into the 67 MB prefix table).
 *
 * Per read rd, emits n_kmers[rd] consecutive slots starting at stream
 * position qlo[rd] (the caller bakes the reference's boundary-base quirk,
 * SURVEY.md 6.5, into qlo/n_kmers).  For global slot i:
 *   kp[i]   k-mer start position in the concatenated query array
 *   lo[i]   first index row of the k-mer's bucket
 *   cnt[i]  bucket size
 *   Ccum[i] exclusive prefix sum of cnt (Ccum[0]=0, length total+1)
 */
EXPORT void imsame_kmer_stream(
    const uint8_t *codes,
    const int64_t *qlo, const int64_t *n_kmers, int64_t n_seqs, int32_t k,
    const int32_t *bucket_start,
    int64_t *kp, int32_t *lo, int32_t *cnt, int64_t *Ccum) {
    const uint32_t mask = key_mask(k);
    int64_t i = 0, c = 0;
    Ccum[0] = 0;
    for (int64_t rd = 0; rd < n_seqs; rd++) {
        int64_t s = qlo[rd], m = n_kmers[rd];
        if (m <= 0) continue;
        uint32_t key = 0;
        for (int32_t j = 0; j < k - 1; j++) key = (key << 2) | codes[s + j];
        for (int64_t j = 0; j < m; j++) {
            key = ((key << 2) | codes[s + j + k - 1]) & mask;
            kp[i] = s + j;
            int32_t l = bucket_start[key];
            int32_t h = bucket_start[key + 1];
            lo[i] = l;
            cnt[i] = h - l;
            c += h - l;
            Ccum[i + 1] = c;
            i++;
        }
    }
}

/* Expand candidate-rank windows [from_rank[e], to_rank[e]) of the selected
 * reads into flat per-candidate arrays, in stream order (k-mer slots in scan
 * order x bucket hits newest-first -- the order the reference worker walks,
 * src/alignmentFunctions.c:107-186):
 *   out_rids[o]  query read id
 *   out_hits[o]  index row of the hit (lo[slot] + offset, so sid/pos are
 *                direct gathers for the caller)
 *   out_qoffs[o] one past the k-mer's last base, in read-row coordinates
 * Returns the number of candidates emitted; the caller sizes the outputs as
 * sum(max(0, min(to, N_r) - from)).  A binary search per read finds the
 * first slot of the window, so resuming a read mid-stream (the two-stage
 * gate) costs O(log slots), not a rescan. */
EXPORT int64_t imsame_build_flat(
    const int64_t *read_ids, const int64_t *from_rank, const int64_t *to_rank,
    int64_t m,
    const int64_t *K_off, const int64_t *C_off,
    const int64_t *kp, const int32_t *lo, const int32_t *cnt,
    const int64_t *Ccum,
    const int64_t *q_start, int32_t k,
    int32_t *out_rids, int32_t *out_hits, int32_t *out_qoffs) {
    int64_t o = 0;
    for (int64_t e = 0; e < m; e++) {
        int64_t r = read_ids[e];
        int64_t t0 = K_off[r], t1 = K_off[r + 1];
        int64_t base = Ccum[t0];
        int64_t f = from_rank[e], t = to_rank[e];
        int64_t nr = C_off[r + 1] - C_off[r];
        if (t > nr) t = nr;
        if (f >= t) continue;
        /* first slot whose candidate range extends past rank f */
        int64_t a = t0, b = t1;
        while (a < b) {
            int64_t mid = a + (b - a) / 2;
            if (Ccum[mid + 1] - base > f) b = mid;
            else a = mid + 1;
        }
        int64_t rank = Ccum[a] - base;
        int32_t rid32 = (int32_t)r;
        for (int64_t slot = a; slot < t1 && rank < t; slot++) {
            int64_t nh = cnt[slot];
            int32_t qoff = (int32_t)(kp[slot] + k - q_start[r]);
            int32_t l = lo[slot];
            for (int64_t h = 0; h < nh && rank < t; h++, rank++) {
                if (rank >= f) {
                    out_rids[o] = rid32;
                    out_hits[o] = l + (int32_t)h;
                    out_qoffs[o] = qoff;
                    o++;
                }
            }
        }
    }
    return o;
}
