/* Native scoring kernels: exact C counterparts of the numpy batch
 * kernels in functions/text.py (_jaro_batch_core + Winkler boost) and
 * stages/scoring.py (sketch_jaccard_batch).
 *
 * Compiled once per machine by functions/native.py (cc -O2 -shared
 * -fPIC, cached under /tmp keyed by source hash); every caller keeps a
 * numpy fallback, so a box without a C compiler still runs — just
 * slower. Values are BIT-IDENTICAL to the numpy kernels: the double
 * arithmetic below performs the same IEEE operations in the same order
 * ((m/la + m/lb + (m-t)/m) / 3, then jw = j + (pre*pw)*(1-j)), and the
 * greedy match/transposition scan is the textbook Jaro definition the
 * numpy core vectorizes (see functions/text.py:271, which documents
 * bit-identity with the scalar reference `jaro`).
 *
 * Why C here: profiling at 242k pages put pairwise title/url scoring at
 * ~85% of the scored stage (jw_title 21 us/pair, jw_url 5 us, jaccard
 * 4 us single-core) — the numpy core's masked-argmax scan costs
 * O(len1*len2) ELEMENT ops per pair, ~25k for 58-char titles, while the
 * greedy scan below touches a few hundred chars. Same work, ~30x less
 * memory traffic; called on dictionary-deduped combos only, exactly
 * like the numpy path.
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* Jaro-Winkler over dictionary-coded strings.
 *
 * flat/offs: concatenated u32 codepoints of the DISTINCT dictionary
 * strings (functions/text.py encode_flat_u32_arrow); ua/ub: per-pair
 * dictionary indices, pre-deduped and non-equal (the Python wrapper
 * short-circuits equal codes to 1.0 and np.unique's the rest).
 * maxlen: an upper bound on any referenced string's length (scratch
 * sizing). Returns 0, or -1 on allocation failure (caller falls back
 * to numpy).
 */
int jw_coded(const uint32_t *flat, const int64_t *offs,
             const int64_t *ua, const int64_t *ub, int64_t n,
             double pw, int64_t maxlen, double *out)
{
    if (maxlen < 1)
        maxlen = 1;
    unsigned char *f1 = (unsigned char *)malloc((size_t)maxlen);
    unsigned char *f2 = (unsigned char *)malloc((size_t)maxlen);
    if (!f1 || !f2) {
        free(f1);
        free(f2);
        return -1;
    }
    for (int64_t p = 0; p < n; p++) {
        const uint32_t *A = flat + offs[ua[p]];
        const uint32_t *B = flat + offs[ub[p]];
        int64_t la = offs[ua[p] + 1] - offs[ua[p]];
        int64_t lb = offs[ub[p] + 1] - offs[ub[p]];
        int64_t lmax = la > lb ? la : lb;
        int64_t md = lmax / 2 - 1; /* may be -1: empty window */
        int64_t m = 0;
        if (md >= 0 && la > 0 && lb > 0) {
            memset(f1, 0, (size_t)la);
            memset(f2, 0, (size_t)lb);
            for (int64_t i = 0; i < la; i++) {
                int64_t lo = i - md;
                if (lo < 0)
                    lo = 0;
                int64_t hi = i + md + 1;
                if (hi > lb)
                    hi = lb;
                uint32_t c = A[i];
                for (int64_t j = lo; j < hi; j++) {
                    if (!f2[j] && B[j] == c) {
                        f1[i] = 1;
                        f2[j] = 1;
                        m++;
                        break;
                    }
                }
            }
        }
        if (m == 0) {
            out[p] = 0.0;
            continue;
        }
        /* transpositions: k-th matched char of A vs k-th of B */
        int64_t t = 0, kb = 0;
        for (int64_t i = 0; i < la; i++) {
            if (!f1[i])
                continue;
            while (!f2[kb])
                kb++;
            if (A[i] != B[kb])
                t++;
            kb++;
        }
        t /= 2;
        double dm = (double)m;
        double jaro =
            (dm / (double)la + dm / (double)lb + (dm - (double)t) / dm) / 3.0;
        int64_t lim = la < lb ? la : lb;
        if (lim > 4)
            lim = 4;
        int64_t pre = 0;
        while (pre < lim && A[pre] == B[pre])
            pre++;
        out[p] = jaro + (double)pre * pw * (1.0 - jaro);
    }
    free(f1);
    free(f2);
    return 0;
}

/* Bottom-k sketch Jaccard, indexed form: rows of ONE (nf x stride)
 * uint64 matrix (each row sorted-unique, `lens` valid entries),
 * ia/ib index pairs into it. Avoids the (n x k) gather the numpy
 * kernel needs — at 160 u64 per sketch that gather is 2.6 KB/pair of
 * memory traffic, the scored stage's main bus load.
 *
 * Estimator identical to sketch_jaccard_batch: union rank r walks the
 * merged distinct values; a value present in both sides counts iff its
 * rank <= kcap; denominator min(kcap, union) (>=1). Both-empty -> 1.0.
 */
void sketch_jacc_idx(const uint64_t *mat, int64_t stride,
                     const int64_t *lens, const int64_t *ia,
                     const int64_t *ib, int64_t n, int64_t kcap,
                     double *out)
{
    for (int64_t p = 0; p < n; p++) {
        const uint64_t *A = mat + ia[p] * stride;
        const uint64_t *B = mat + ib[p] * stride;
        int64_t la = lens[ia[p]], lb = lens[ib[p]];
        if (la + lb == 0) {
            out[p] = 1.0;
            continue;
        }
        int64_t i = 0, j = 0, r = 0, both = 0;
        while (i < la && j < lb) {
            uint64_t x = A[i], y = B[j];
            if (x == y) {
                r++;
                if (r <= kcap)
                    both++;
                i++;
                j++;
            } else if (x < y) {
                r++;
                i++;
            } else {
                r++;
                j++;
            }
        }
        r += (la - i) + (lb - j); /* union = distinct count */
        int64_t kk = kcap < r ? kcap : r;
        out[p] = (double)both / (double)(kk > 0 ? kk : 1);
    }
}

/* Two-matrix indexed form: ia indexes rows of matA, ib rows of matB
 * (the feature-store scoring path probes two different bucket
 * payloads). Identical estimator; avoids the (n x k) gather of the
 * rows form entirely — rows are read in place from both matrices. */
void sketch_jacc_idx2(const uint64_t *matA, int64_t strideA,
                      const int64_t *lensA, const uint64_t *matB,
                      int64_t strideB, const int64_t *lensB,
                      const int64_t *ia, const int64_t *ib, int64_t n,
                      int64_t kcap, double *out)
{
    for (int64_t p = 0; p < n; p++) {
        const uint64_t *A = matA + ia[p] * strideA;
        const uint64_t *B = matB + ib[p] * strideB;
        int64_t la = lensA[ia[p]], lb = lensB[ib[p]];
        if (la + lb == 0) {
            out[p] = 1.0;
            continue;
        }
        int64_t i = 0, j = 0, r = 0, both = 0;
        while (i < la && j < lb) {
            uint64_t x = A[i], y = B[j];
            if (x == y) {
                r++;
                if (r <= kcap)
                    both++;
                i++;
                j++;
            } else if (x < y) {
                r++;
                i++;
            } else {
                r++;
                j++;
            }
        }
        r += (la - i) + (lb - j);
        int64_t kk = kcap < r ? kcap : r;
        out[p] = (double)both / (double)(kk > 0 ? kk : 1);
    }
}

/* Same estimator over two pre-gathered padded matrices (the shuffle-
 * join and feature-store scoring paths hand the kernel (n x ka) /
 * (n x kb) rows). Padding beyond lens is never read. */
void sketch_jacc_rows(const uint64_t *A, int64_t ka, const int64_t *la,
                      const uint64_t *B, int64_t kb, const int64_t *lb,
                      int64_t n, int64_t kcap, double *out)
{
    for (int64_t p = 0; p < n; p++) {
        const uint64_t *a = A + p * ka;
        const uint64_t *b = B + p * kb;
        int64_t na = la[p], nb = lb[p];
        if (na + nb == 0) {
            out[p] = 1.0;
            continue;
        }
        int64_t i = 0, j = 0, r = 0, both = 0;
        while (i < na && j < nb) {
            uint64_t x = a[i], y = b[j];
            if (x == y) {
                r++;
                if (r <= kcap)
                    both++;
                i++;
                j++;
            } else if (x < y) {
                r++;
                i++;
            } else {
                r++;
                j++;
            }
        }
        r += (na - i) + (nb - j);
        int64_t kk = kcap < r ? kcap : r;
        out[p] = (double)both / (double)(kk > 0 ? kk : 1);
    }
}
