// Native (C++/OpenMP) BM25 sparse-recall top-k kernel.
//
// Drop-in accelerator for evaluation/recall.py::bm25_rank's hot loop
// (reference capability: utils/utils.py:219-410 BM25 inverted-index
// recall). The scipy path materialises a dense [block, n_news] float64
// score matrix per block (~200 GB of memory traffic at MINDlarge-dev
// shape: 377k impressions x 121k docs) and then runs a per-row Python
// tie-rule loop. This kernel keeps the per-impression accumulator
// sparse: postings of the impression's *distinct* history tokens are
// scatter-added into an epoch-stamped dense accumulator, only touched
// docs are examined, and the exact tie rule (round(score, 9) —
// half-to-even like np.round — then score desc, doc id asc) is applied
// with nth_element + partial sort.
//
// Exactness: identical output to the scipy CSR formulation. Both sides
// accumulate float64 postings (the inverted index is float64) and both
// round to 9 decimals before ranking, which makes the result independent
// of summation order (see bm25_rank's docstring); the selection rule
// "sort positive-score docs by (-score, id), truncate to top_k" is
// pinned equivalent to the partition-based formulation by
// tests/test_recall.py::test_bm25_rank_equals_scalar_formulation and the
// native-vs-scipy parity test.
//
// Layout contracts (all row-major, validated by the ctypes bridge):
//   inv        [vocab, K, 2] float64 — token -> (doc, weight) postings,
//              weight 0 rows = padding (doc index n_articles)
//   news_tokens[n_articles, S] int32 — token cache, row 0 = pad article
//   his_offs   [n_impr + 1] int64, his_flat int32 — ragged histories
//   out_ids    [n_impr, top_k] int64 — ranked doc ids, -1 padded
//   out_counts [n_impr] int32 — number of retrieved docs (<= top_k)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct ScoredDoc {
  double score;
  int32_t doc;
};

inline bool better(const ScoredDoc &a, const ScoredDoc &b) {
  if (a.score != b.score) return a.score > b.score;  // score desc
  return a.doc < b.doc;                              // doc id asc
}

// np.round(x, 9): scale, round-half-to-even, unscale. nearbyint uses the
// current rounding mode (default FE_TONEAREST = half-to-even), matching
// numpy's rint-based implementation bit-for-bit on these magnitudes.
inline double round9(double x) { return std::nearbyint(x * 1e9) / 1e9; }

}  // namespace

extern "C" {

void bm25_topk(const double *inv, int64_t vocab, int64_t postings_k,
               const int32_t *news_tokens, int64_t n_articles, int64_t sl,
               const int64_t *his_offs, const int32_t *his_flat,
               int64_t n_impr, int64_t top_k, int64_t *out_ids,
               int32_t *out_counts) {
#pragma omp parallel
  {
    // Per-thread scratch: epoch stamps avoid clearing O(vocab + docs)
    // arrays per impression.
    std::vector<int32_t> tok_stamp(static_cast<size_t>(vocab), -1);
    std::vector<int32_t> doc_stamp(static_cast<size_t>(n_articles), -1);
    std::vector<double> acc(static_cast<size_t>(n_articles), 0.0);
    std::vector<int32_t> touched;
    touched.reserve(4096);
    std::vector<ScoredDoc> pos;
    pos.reserve(4096);

#pragma omp for schedule(dynamic, 64)
    for (int64_t j = 0; j < n_impr; ++j) {
      const int32_t epoch = static_cast<int32_t>(j);
      touched.clear();
      // Distinct tokens across the impression's history articles
      // (M = binarize(H @ A) in the scipy formulation).
      for (int64_t h = his_offs[j]; h < his_offs[j + 1]; ++h) {
        const int64_t art = his_flat[h];
        if (art < 0 || art >= n_articles) continue;
        const int32_t *row = news_tokens + art * sl;
        for (int64_t s = 0; s < sl; ++s) {
          const int32_t t = row[s];
          if (t <= 0 || t >= vocab) continue;  // 0 = pad token
          if (tok_stamp[t] == epoch) continue;  // distinct-set semantics
          tok_stamp[t] = epoch;
          const double *post = inv + static_cast<int64_t>(t) * postings_k * 2;
          for (int64_t k = 0; k < postings_k; ++k) {
            const double w = post[2 * k + 1];
            if (w <= 0.0) continue;  // padding posting
            const int64_t doc = static_cast<int64_t>(post[2 * k]);
            // col 0 (pad article) and the padding doc col (== n_articles)
            // never recall (scores[:, 0] = 0; scores[:, :n_news])
            if (doc <= 0 || doc >= n_articles) continue;
            if (doc_stamp[doc] == epoch) {
              acc[doc] += w;
            } else {
              doc_stamp[doc] = epoch;
              acc[doc] = w;
              touched.push_back(static_cast<int32_t>(doc));
            }
          }
        }
      }
      // Round, keep positive scores, rank by (score desc, id asc).
      pos.clear();
      for (const int32_t doc : touched) {
        const double s = round9(acc[doc]);
        if (s > 0.0) pos.push_back({s, doc});
      }
      const size_t keep =
          std::min(pos.size(), static_cast<size_t>(top_k));
      if (pos.size() > keep) {
        std::nth_element(pos.begin(), pos.begin() + keep, pos.end(), better);
        pos.resize(keep);
      }
      std::sort(pos.begin(), pos.end(), better);
      int64_t *out_row = out_ids + j * top_k;
      for (size_t i = 0; i < static_cast<size_t>(top_k); ++i)
        out_row[i] = i < keep ? pos[i].doc : -1;
      out_counts[j] = static_cast<int32_t>(keep);
    }
  }
}

}  // extern "C"
