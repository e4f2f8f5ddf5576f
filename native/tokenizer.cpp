// Native word tokenizer for the offline cache build.
//
// The reference leans on HuggingFace's Rust tokenizers for its one-time
// news.tsv tokenization pass (reference utils/MIND.py:90-91, 133); this is
// the C++ counterpart for the framework's WordTokenizer: identical
// semantics to data/tokenizer.py (ASCII lowercasing, [A-Za-z0-9]+ runs or
// single non-space symbols — UTF-8 multibyte sequences are kept as one
// symbol token, matching Python's per-codepoint regex behavior for
// non-ASCII), vocab lookup via a preloaded open-addressing hash table,
// [CLS] ... [SEP] framing with padding/truncation to max_length.
// OpenMP over articles.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC tokenizer.cpp -o libtokenizer.so
#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
  std::unordered_map<std::string, int32_t> map;
  int32_t pad_id, unk_id, cls_id, sep_id;
};

inline bool is_alnum(unsigned char c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
         (c >= '0' && c <= '9');
}

inline char lower(unsigned char c) {
  return (c >= 'A' && c <= 'Z') ? (char)(c + 32) : (char)c;
}

// UTF-8 sequence length from the lead byte (1 for ASCII/invalid)
inline int u8len(unsigned char c) {
  if (c < 0x80) return 1;
  if ((c >> 5) == 0x6) return 2;
  if ((c >> 4) == 0xe) return 3;
  if ((c >> 3) == 0x1e) return 4;
  return 1;
}

// Tokenize one article into vocab ids (without specials).
void tokenize_words(const Vocab& v, std::string_view text,
                    std::vector<int32_t>& out) {
  std::string word;
  size_t i = 0, n = text.size();
  auto flush = [&]() {
    if (!word.empty()) {
      auto it = v.map.find(word);
      out.push_back(it == v.map.end() ? v.unk_id : it->second);
      word.clear();
    }
  };
  while (i < n) {
    unsigned char c = text[i];
    if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
        c == '\v') {
      flush();
      ++i;
    } else if (is_alnum(c)) {
      word.push_back(lower(c));
      ++i;
    } else {
      flush();
      int len = u8len(c);
      if (i + len > n) len = 1;
      std::string sym(text.substr(i, len));
      auto it = v.map.find(sym);
      out.push_back(it == v.map.end() ? v.unk_id : it->second);
      i += len;
    }
  }
  flush();
}

}  // namespace

extern "C" {

// vocab blob: words separated by '\n' in id order (id = line index)
void* tokenizer_create(const char* vocab_blob, int64_t blob_len,
                       int32_t pad_id, int32_t unk_id, int32_t cls_id,
                       int32_t sep_id) {
  Vocab* v = new Vocab{{}, pad_id, unk_id, cls_id, sep_id};
  std::string_view blob(vocab_blob, (size_t)blob_len);
  int32_t id = 0;
  size_t start = 0;
  for (size_t i = 0; i <= blob.size(); ++i) {
    if (i == blob.size() || blob[i] == '\n') {
      if (i > start) v->map.emplace(std::string(blob.substr(start, i - start)), id);
      ++id;
      start = i + 1;
    }
  }
  return v;
}

void tokenizer_destroy(void* v) { delete static_cast<Vocab*>(v); }

// Encode `n_docs` articles (UTF-8, '\x1e'-separated in `texts`) into
// [n_docs, max_length] ids + attention masks.
void tokenizer_encode_batch(void* vctx, const char* texts,
                            int64_t texts_len, int64_t n_docs,
                            int64_t max_length, int32_t* out_ids,
                            uint8_t* out_attn) {
  const Vocab& v = *static_cast<Vocab*>(vctx);
  // pre-split document boundaries (single pass)
  std::vector<std::pair<size_t, size_t>> spans;
  spans.reserve(n_docs);
  std::string_view all(texts, (size_t)texts_len);
  size_t start = 0;
  for (size_t i = 0; i <= all.size() && (int64_t)spans.size() < n_docs;
       ++i) {
    if (i == all.size() || all[i] == '\x1e') {
      spans.emplace_back(start, i - start);
      start = i + 1;
    }
  }

#pragma omp parallel
  {
    std::vector<int32_t> toks;
#pragma omp for schedule(dynamic, 64)
    for (int64_t d = 0; d < (int64_t)spans.size(); ++d) {
      toks.clear();
      tokenize_words(v, all.substr(spans[d].first, spans[d].second), toks);
      int32_t* ids = out_ids + d * max_length;
      uint8_t* attn = out_attn + d * max_length;
      const int64_t body = std::min<int64_t>((int64_t)toks.size(),
                                             max_length - 2);
      int64_t k = 0;
      ids[k] = v.cls_id;
      attn[k++] = 1;
      for (int64_t j = 0; j < body; ++j) {
        ids[k] = toks[j];
        attn[k++] = 1;
      }
      ids[k] = v.sep_id;
      attn[k++] = 1;
      for (; k < max_length; ++k) {
        ids[k] = v.pad_id;
        attn[k] = 0;
      }
    }
  }
}

}  // extern "C"
