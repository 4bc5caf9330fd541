/* Bit-parallel Jaro / Jaro-Winkler over raw UTF-8 bytes.
 *
 * Algorithm: the bit-parallel flag/transposition formulation used by
 * rapidfuzz-cpp (which DuckDB vendors for jaro_winkler_similarity), i.e.
 * for each T[j] the lowest unmatched P-position inside the Jaro window is
 * flagged via pattern-match bitmasks; transpositions compare flagged chars
 * in order. Byte semantics (no unicode decoding), both-empty -> 0.0,
 * Winkler boost (weight 0.1, prefix cap 4) applied only when jaro > 0.7 —
 * all verified bit-identical to DuckDB 1.0 on randomized fuzz + the bench
 * corpus (tests/test_native_jaro.py).
 *
 * Batch entry points read Arrow string-array buffers directly (data +
 * int32 offsets), one result per row — zero copies on the hot path.
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define MAXW 32 /* fast path: strings up to MAXW*64 = 2048 bytes */

typedef struct {
    uint64_t bits[256][MAXW];
    uint32_t ver[256];
    uint32_t cur;
    /* PM-reuse: the P string the table currently encodes */
    const uint8_t *built_p;
    int64_t built_len;
} pm_table;

static inline uint64_t lsb(uint64_t x) { return x & (~x + 1); }

static inline const uint64_t *pm_get(pm_table *pm, uint8_t c) {
    static const uint64_t zero[MAXW] = {0};
    return pm->ver[c] == pm->cur ? pm->bits[c] : zero;
}

/* jaro similarity for plen, tlen <= MAXW*64; general word count.
 *
 * ``min_m``: exact-below-threshold early exit. When the caller only needs
 * values >= some similarity cutoff to be exact (threshold-ladder gammas),
 * it derives the minimum match count that could reach the cutoff; once
 * m + remaining_T < min_m the true jaro is provably below the cutoff and
 * we return 0.0 (any value < cutoff is equivalent for the caller).
 * min_m = 0 disables the exit (exact values everywhere). */
static double jaro_words(pm_table *pm, const uint8_t *P, int64_t plen,
                         const uint8_t *T, int64_t tlen, int64_t min_m) {
    if (plen == 0 || tlen == 0)
        return 0.0;
    if (plen < min_m || tlen < min_m)
        return 0.0;
    int64_t maxlen = plen > tlen ? plen : tlen;
    int64_t bound = maxlen / 2 - 1;
    if (bound < 0)
        bound = 0;

    /* build PM over P with version stamping (no 16KB clear per pair);
       consecutive pairs sharing P (input sorted by left value) reuse it */
    if (!(pm->built_p != NULL && pm->built_len == plen &&
          (pm->built_p == P || memcmp(pm->built_p, P, (size_t)plen) == 0))) {
        pm->cur++;
        if (pm->cur == 0) { /* wrapped: full reset */
            memset(pm->ver, 0, sizeof(pm->ver));
            pm->cur = 1;
        }
        for (int64_t i = 0; i < plen; i++) {
            uint8_t c = P[i];
            if (pm->ver[c] != pm->cur) {
                memset(pm->bits[c], 0, ((size_t)((plen + 63) >> 6)) * 8);
                pm->ver[c] = pm->cur;
            }
            pm->bits[c][i >> 6] |= 1ULL << (i & 63);
        }
        pm->built_p = P;
        pm->built_len = plen;
    }

    uint64_t p_flag[MAXW] = {0};
    uint64_t t_flag[MAXW] = {0};
    int64_t m = 0;

    for (int64_t j = 0; j < tlen; j++) {
        if (min_m && m + (tlen - j) < min_m)
            return 0.0;
        int64_t lo = j - bound;
        if (lo < 0)
            lo = 0;
        int64_t hi = j + bound + 1;
        if (hi > plen)
            hi = plen;
        if (lo >= hi)
            continue;
        const uint64_t *pmj = pm_get(pm, T[j]);
        int64_t w0 = lo >> 6, w1 = (hi - 1) >> 6;
        /* edge masks once; interior words need none */
        uint64_t first_mask = ~0ULL << (lo & 63);
        uint64_t last_mask =
            (hi & 63) ? (~0ULL >> (64 - (hi & 63))) : ~0ULL;
        if (w0 == w1)
            first_mask &= last_mask;
        uint64_t x = pmj[w0] & ~p_flag[w0] & first_mask;
        int64_t w = w0;
        while (!x && w < w1) {
            w++;
            x = pmj[w] & ~p_flag[w];
            if (w == w1)
                x &= last_mask;
        }
        if (x) {
            p_flag[w] |= lsb(x);
            t_flag[j >> 6] |= 1ULL << (j & 63);
            m++;
        }
    }
    if (m == 0 || m < min_m)
        return 0.0;

    /* transpositions: walk matched T positions and matched P positions in
       order; count where the chars differ */
    int64_t trans = 0;
    int64_t pw = 0;
    uint64_t pbits = p_flag[0];
    int64_t tW = (tlen + 63) >> 6;
    for (int64_t w = 0; w < tW; w++) {
        uint64_t tb = t_flag[w];
        while (tb) {
            int64_t j = (w << 6) + __builtin_ctzll(tb);
            tb &= tb - 1;
            while (pbits == 0)
                pbits = p_flag[++pw];
            int64_t i = (pw << 6) + __builtin_ctzll(pbits);
            pbits &= pbits - 1;
            trans += P[i] != T[j];
        }
    }
    int64_t half = trans / 2;

    double sim = 0.0;
    sim += (double)m / (double)plen;
    sim += (double)m / (double)tlen;
    sim += ((double)m - (double)half) / (double)m;
    return sim / 3.0;
}

static double jw_one(pm_table *pm, const uint8_t *P, int64_t plen,
                     const uint8_t *T, int64_t tlen, double prefix_weight,
                     int64_t min_m) {
    double sim = jaro_words(pm, P, plen, T, tlen, min_m);
    if (sim > 0.7) {
        int64_t maxp = plen < tlen ? plen : tlen;
        if (maxp > 4)
            maxp = 4;
        int64_t prefix = 0;
        while (prefix < maxp && P[prefix] == T[prefix])
            prefix++;
        sim += (double)prefix * prefix_weight * (1.0 - sim);
    }
    return sim;
}

/* minimum match count m that could reach jaro >= jaro_min for this length
   pair: jaro <= (m/plen + m/tlen + 1)/3  =>  m >= (3*jaro_min - 1) /
   (1/plen + 1/tlen). Conservative (floor); 0 when no cutoff. */
static int64_t min_m_for(double jaro_min, int64_t plen, int64_t tlen) {
    if (jaro_min <= 0.0 || plen == 0 || tlen == 0)
        return 0;
    /* strictly conservative: shave ~1e-9 so upward rounding in the
       cutoff -> jaro_min derivation can never early-exit a row whose true
       jaro EQUALS the cutoff (the documented ">= cutoff is exact"
       contract); cost is a handful of never-exited rows. */
    jaro_min *= 1.0 - 1e-9;
    double num = 3.0 * jaro_min - 1.0;
    if (num <= 0.0)
        return 0;
    double denom = 1.0 / (double)plen + 1.0 / (double)tlen;
    double mm = num / denom;
    int64_t m = (int64_t)mm; /* floor: conservative */
    return m > 0 ? m : 0;
}

/* returns 0 on success, 1 if any string exceeds the fast-path cap (caller
   should fall back for the whole batch to keep semantics uniform) */
static int check_caps(const int32_t *o1, const int32_t *o2, int64_t n) {
    for (int64_t k = 0; k < n; k++) {
        if (o1[k + 1] - o1[k] > MAXW * 64 || o2[k + 1] - o2[k] > MAXW * 64)
            return 1;
    }
    return 0;
}

/* dictionary-indexed variant: row k compares dict1[i1[k]] vs dict2[i2[k]].
 * Negative index = null input -> NaN (caller masks). The caller sorts rows
 * by i1 so the PM table is built once per distinct left value. */
int jaro_winkler_batch_idx(const uint8_t *d1, const int32_t *o1,
                           int64_t dlen1, const int32_t *i1,
                           const uint8_t *d2, const int32_t *o2,
                           int64_t dlen2, const int32_t *i2, int64_t n,
                           double prefix_weight, double cutoff, double *out) {
    if (check_caps(o1, o1, dlen1) || check_caps(o2, o2, dlen2))
        return 1;
    pm_table *pm = calloc(1, sizeof(pm_table));
    if (!pm)
        return 2;
    double jaro_min = 0.0;
    if (cutoff >= 0.0) {
        double denom = 1.0 - 4.0 * prefix_weight;
        jaro_min = denom > 0.0 ? (cutoff - 4.0 * prefix_weight) / denom : 0.0;
        if (jaro_min < 0.0)
            jaro_min = 0.0;
    }
    for (int64_t k = 0; k < n; k++) {
        int32_t a = i1[k], b = i2[k];
        if (a < 0 || b < 0 || a >= dlen1 || b >= dlen2) {
            out[k] = 0.0 / 0.0; /* NaN: null input */
            continue;
        }
        int64_t pl = o1[a + 1] - o1[a], tl = o2[b + 1] - o2[b];
        out[k] = jw_one(pm, d1 + o1[a], pl, d2 + o2[b], tl, prefix_weight,
                        min_m_for(jaro_min, pl, tl));
    }
    free(pm);
    return 0;
}

int jaro_batch_idx(const uint8_t *d1, const int32_t *o1, int64_t dlen1,
                   const int32_t *i1, const uint8_t *d2, const int32_t *o2,
                   int64_t dlen2, const int32_t *i2, int64_t n, double cutoff,
                   double *out) {
    if (check_caps(o1, o1, dlen1) || check_caps(o2, o2, dlen2))
        return 1;
    pm_table *pm = calloc(1, sizeof(pm_table));
    if (!pm)
        return 2;
    double jaro_min = cutoff >= 0.0 ? cutoff : 0.0;
    for (int64_t k = 0; k < n; k++) {
        int32_t a = i1[k], b = i2[k];
        if (a < 0 || b < 0 || a >= dlen1 || b >= dlen2) {
            out[k] = 0.0 / 0.0;
            continue;
        }
        int64_t pl = o1[a + 1] - o1[a], tl = o2[b + 1] - o2[b];
        out[k] = jaro_words(pm, d1 + o1[a], pl, d2 + o2[b], tl,
                            min_m_for(jaro_min, pl, tl));
    }
    free(pm);
    return 0;
}

/* cutoff < 0 disables the early exit (fully exact values).
 * cutoff >= 0: out[k] is exact whenever the true value >= cutoff; rows
 * provably below the cutoff may return 0.0 instead of the exact value. */
int jaro_batch(const uint8_t *d1, const int32_t *o1, const uint8_t *d2,
               const int32_t *o2, int64_t n, double cutoff, double *out) {
    if (check_caps(o1, o2, n))
        return 1;
    pm_table *pm = calloc(1, sizeof(pm_table));
    if (!pm)
        return 2;
    double jaro_min = cutoff >= 0.0 ? cutoff : 0.0;
    for (int64_t k = 0; k < n; k++) {
        int64_t pl = o1[k + 1] - o1[k], tl = o2[k + 1] - o2[k];
        out[k] = jaro_words(pm, d1 + o1[k], pl, d2 + o2[k], tl,
                            min_m_for(jaro_min, pl, tl));
    }
    free(pm);
    return 0;
}

int jaro_winkler_batch(const uint8_t *d1, const int32_t *o1,
                       const uint8_t *d2, const int32_t *o2, int64_t n,
                       double prefix_weight, double cutoff, double *out) {
    if (check_caps(o1, o2, n))
        return 1;
    pm_table *pm = calloc(1, sizeof(pm_table));
    if (!pm)
        return 2;
    /* winkler boost adds at most 4*weight*(1-jaro): jw <= (1-4w) * jaro
       + 4w, so jw >= cutoff requires jaro >= (cutoff - 4w)/(1 - 4w) */
    double jaro_min = 0.0;
    if (cutoff >= 0.0) {
        double denom = 1.0 - 4.0 * prefix_weight;
        jaro_min = denom > 0.0 ? (cutoff - 4.0 * prefix_weight) / denom : 0.0;
        if (jaro_min < 0.0)
            jaro_min = 0.0;
    }
    for (int64_t k = 0; k < n; k++) {
        int64_t pl = o1[k + 1] - o1[k], tl = o2[k + 1] - o2[k];
        out[k] = jw_one(pm, d1 + o1[k], pl, d2 + o2[k], tl, prefix_weight,
                        min_m_for(jaro_min, pl, tl));
    }
    free(pm);
    return 0;
}
