// Native WordPiece tokenizer for the offline PLM cache build.
//
// C++/OpenMP counterpart of data/wordpiece.py (the self-contained BERT
// pipeline replacing HF's Rust tokenizers, reference utils/MIND.py:90-91,
// 133). Exactness scheme: ASCII is classified inline (it matches Python's
// unicodedata classes exactly for ASCII); every non-ASCII codepoint is
// classified by a table the Python bridge precomputes from the corpus
// charset *with unicodedata itself as the oracle* — class (whitespace /
// control / CJK / punctuation / other) plus the lower+NFD-strip-accents
// replacement string. The C++ path therefore cannot drift from the Python
// pipeline on any input it is given (pinned by tests/test_wordpiece.py's
// native-parity test).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC wordpiece.cpp -o libwordpiece.so
#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

enum CharClass : uint8_t { OTHER = 0, WS = 1, CTRL = 2, CJKC = 3, PUNCT = 4 };

struct WP {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<uint32_t, uint8_t> cls_table;      // non-ASCII class
  std::unordered_map<uint32_t, std::string> repl_table; // lower+strip utf8
  int32_t pad_id, unk_id, cls_id, sep_id;
  static constexpr int kMaxChars = 100;  // max_input_chars_per_word
};

// ---- UTF-8 ----------------------------------------------------------------

inline int u8len(unsigned char c) {
  if (c < 0x80) return 1;
  if ((c >> 5) == 0x6) return 2;
  if ((c >> 4) == 0xe) return 3;
  if ((c >> 3) == 0x1e) return 4;
  return 1;
}

inline uint32_t u8decode(const char* s, int len) {
  const unsigned char* u = (const unsigned char*)s;
  switch (len) {
    case 2: return ((u[0] & 0x1Fu) << 6) | (u[1] & 0x3Fu);
    case 3: return ((u[0] & 0x0Fu) << 12) | ((u[1] & 0x3Fu) << 6) |
                   (u[2] & 0x3Fu);
    case 4: return ((u[0] & 0x07u) << 18) | ((u[1] & 0x3Fu) << 12) |
                   ((u[2] & 0x3Fu) << 6) | (u[3] & 0x3Fu);
    default: return u[0];
  }
}

inline void u8encode(uint32_t cp, std::string& out) {
  if (cp < 0x80) {
    out.push_back((char)cp);
  } else if (cp < 0x800) {
    out.push_back((char)(0xC0 | (cp >> 6)));
    out.push_back((char)(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    out.push_back((char)(0xE0 | (cp >> 12)));
    out.push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
    out.push_back((char)(0x80 | (cp & 0x3F)));
  } else {
    out.push_back((char)(0xF0 | (cp >> 18)));
    out.push_back((char)(0x80 | ((cp >> 12) & 0x3F)));
    out.push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
    out.push_back((char)(0x80 | (cp & 0x3F)));
  }
}

// ---- character classification (ASCII inline; table otherwise) -------------

inline uint8_t char_class(const WP& wp, uint32_t cp) {
  if (cp < 0x80) {
    if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r') return WS;
    if (cp < 0x20 || cp == 0x7F) return CTRL;
    if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
        (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126))
      return PUNCT;
    return OTHER;
  }
  auto it = wp.cls_table.find(cp);
  return it == wp.cls_table.end() ? OTHER : it->second;
}

// lower+strip-accents expansion of one codepoint into `out` (utf8)
inline void char_repl(const WP& wp, uint32_t cp, std::string& out) {
  if (cp < 0x80) {
    if (cp >= 'A' && cp <= 'Z') cp += 32;
    out.push_back((char)cp);
    return;
  }
  auto it = wp.repl_table.find(cp);
  if (it == wp.repl_table.end()) {
    u8encode(cp, out);  // unknown: identity (bridge tables cover corpus)
  } else {
    out += it->second;  // may be empty (combining marks) or multi-char
  }
}

// ---- pipeline --------------------------------------------------------------

// Basic-tokenize one document into punctuation-split subtokens (utf8),
// following data/wordpiece.py::basic_tokenize exactly.
void basic_tokenize(const WP& wp, std::string_view text,
                    std::vector<std::string>& words_out) {
  // 1. clean + CJK spacing + whitespace split (on original chars)
  std::vector<std::vector<uint32_t>> raw_words;
  std::vector<uint32_t> cur;
  size_t i = 0, n = text.size();
  auto flush = [&]() {
    if (!cur.empty()) {
      raw_words.push_back(cur);
      cur.clear();
    }
  };
  while (i < n) {
    int len = u8len((unsigned char)text[i]);
    if (i + len > n) len = 1;
    uint32_t cp = u8decode(text.data() + i, len);
    i += len;
    if (cp == 0 || cp == 0xFFFD) continue;
    uint8_t c = char_class(wp, cp);
    if (c == CTRL) continue;
    if (c == WS) {
      flush();
    } else if (c == CJKC) {
      flush();
      raw_words.push_back({cp});
    } else {
      cur.push_back(cp);
    }
  }
  flush();

  // 2. per word: lower+strip, then split on punctuation (post-replacement)
  std::string lowered;
  std::string piece;
  for (const auto& w : raw_words) {
    lowered.clear();
    for (uint32_t cp : w) char_repl(wp, cp, lowered);
    // iterate replacement chars, split on punct
    piece.clear();
    size_t j = 0, m = lowered.size();
    while (j < m) {
      int len = u8len((unsigned char)lowered[j]);
      if (j + len > m) len = 1;
      uint32_t cp = u8decode(lowered.data() + j, len);
      if (char_class(wp, cp) == PUNCT) {
        if (!piece.empty()) {
          words_out.push_back(piece);
          piece.clear();
        }
        words_out.emplace_back(lowered.substr(j, len));
      } else {
        piece.append(lowered, j, len);
      }
      j += len;
    }
    if (!piece.empty()) words_out.push_back(piece);
  }
}

// Greedy longest-match-first WordPiece over one basic token.
void wordpiece_match(const WP& wp, const std::string& token,
                     std::vector<int32_t>& out) {
  // codepoint boundaries
  std::vector<uint32_t> bounds;  // byte offsets, terminated by size
  for (size_t i = 0; i < token.size();) {
    bounds.push_back((uint32_t)i);
    int len = u8len((unsigned char)token[i]);
    if (i + len > token.size()) len = 1;
    i += len;
  }
  bounds.push_back((uint32_t)token.size());
  const size_t n_chars = bounds.size() - 1;
  if (n_chars > WP::kMaxChars) {
    out.push_back(wp.unk_id);
    return;
  }
  std::vector<int32_t> pieces;
  size_t start = 0;
  std::string sub;
  while (start < n_chars) {
    size_t end = n_chars;
    int32_t cur = -1;
    while (start < end) {
      sub.clear();
      if (start > 0) sub = "##";
      sub.append(token, bounds[start], bounds[end] - bounds[start]);
      auto it = wp.vocab.find(sub);
      if (it != wp.vocab.end()) {
        cur = it->second;
        break;
      }
      --end;
    }
    if (cur < 0) {
      out.push_back(wp.unk_id);
      return;
    }
    pieces.push_back(cur);
    start = end;
  }
  out.insert(out.end(), pieces.begin(), pieces.end());
}

}  // namespace

extern "C" {

// vocab blob: tokens '\n'-separated in id order.
// chartab blob: lines "cp\tclass\treplacement" (cp decimal, class digit,
// replacement utf8 possibly empty), '\n'-separated.
void* wordpiece_create(const char* vocab_blob, int64_t vlen,
                       const char* chartab_blob, int64_t clen,
                       int32_t pad_id, int32_t unk_id, int32_t cls_id,
                       int32_t sep_id) {
  WP* wp = new WP();
  wp->pad_id = pad_id;
  wp->unk_id = unk_id;
  wp->cls_id = cls_id;
  wp->sep_id = sep_id;
  {
    std::string_view blob(vocab_blob, (size_t)vlen);
    int32_t id = 0;
    size_t start = 0;
    for (size_t i = 0; i <= blob.size(); ++i) {
      if (i == blob.size() || blob[i] == '\n') {
        if (i > start)
          wp->vocab.emplace(std::string(blob.substr(start, i - start)), id);
        ++id;
        start = i + 1;
      }
    }
  }
  {
    std::string_view blob(chartab_blob, (size_t)clen);
    size_t start = 0;
    for (size_t i = 0; i <= blob.size(); ++i) {
      if (i == blob.size() || blob[i] == '\n') {
        std::string_view line = blob.substr(start, i - start);
        start = i + 1;
        if (line.empty()) continue;
        size_t t1 = line.find('\t');
        size_t t2 = line.find('\t', t1 + 1);
        if (t1 == std::string_view::npos || t2 == std::string_view::npos)
          continue;
        uint32_t cp = (uint32_t)std::stoul(std::string(line.substr(0, t1)));
        uint8_t cls = (uint8_t)(line[t1 + 1] - '0');
        wp->cls_table[cp] = cls;
        wp->repl_table[cp] = std::string(line.substr(t2 + 1));
      }
    }
  }
  return wp;
}

void wordpiece_destroy(void* p) { delete static_cast<WP*>(p); }

// Encode n_docs articles ('\x1e'-separated utf8) into [n_docs, max_length]
// ids + attention masks: [CLS] pieces... [SEP], padded/truncated.
void wordpiece_encode_batch(void* pctx, const char* texts, int64_t texts_len,
                            int64_t n_docs, int64_t max_length,
                            int32_t* out_ids, uint8_t* out_attn) {
  const WP& wp = *static_cast<WP*>(pctx);
  std::vector<std::pair<size_t, size_t>> spans;
  spans.reserve(n_docs);
  std::string_view all(texts, (size_t)texts_len);
  size_t start = 0;
  for (size_t i = 0; i <= all.size() && (int64_t)spans.size() < n_docs; ++i) {
    if (i == all.size() || all[i] == '\x1e') {
      spans.emplace_back(start, i - start);
      start = i + 1;
    }
  }

#pragma omp parallel
  {
    std::vector<std::string> words;
    std::vector<int32_t> toks;
#pragma omp for schedule(dynamic, 64)
    for (int64_t d = 0; d < (int64_t)spans.size(); ++d) {
      words.clear();
      toks.clear();
      basic_tokenize(wp, all.substr(spans[d].first, spans[d].second), words);
      for (const auto& w : words) wordpiece_match(wp, w, toks);
      int32_t* ids = out_ids + d * max_length;
      uint8_t* attn = out_attn + d * max_length;
      const int64_t body =
          std::min<int64_t>((int64_t)toks.size(), max_length - 2);
      int64_t k = 0;
      ids[k] = wp.cls_id;
      attn[k++] = 1;
      for (int64_t j = 0; j < body; ++j) {
        ids[k] = toks[j];
        attn[k++] = 1;
      }
      ids[k] = wp.sep_id;
      attn[k++] = 1;
      for (; k < max_length; ++k) {
        ids[k] = wp.pad_id;
        attn[k] = 0;
      }
    }
  }
}

}  // extern "C"
