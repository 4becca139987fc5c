// Native batch WordPiece tokenizer (round-5).
//
// The eval pipeline's wall-clock moved from padded encoder FLOPs to the
// Python tokenizer once packing landed (docs/PERF.md round-9: ~10 s of
// a 13 s DenseEncoder pass over 16k docs). This is the C++ half of the
// fix: greedy longest-match WordPiece over a shared-memory vocab hash
// map, multithreaded across texts.
//
// Unicode semantics are DATA, not code: Python passes the exact
// classification / lowercase / NFD tables its own tokenizer is built
// from (data/tokenizer.py _build_tables + the maps in
// native_tokenizer.py), so both paths agree by construction. Texts
// containing codepoints the per-char table treatment cannot reproduce
// exactly (precomposed sequences interacting under string-level NFD —
// flagged RISKY in the table) are refused with len = -1 and re-encoded
// by the Python path; the differential test pins equality on everything
// else.
//
// Reference anchor: replaces transformers BertTokenizer batch encoding
// (/root/reference/src/beir_utils.py:60-92 tokenizes every corpus
// passage through HF); the reference outsources this to the tokenizers
// Rust crate, we implement it natively.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr uint8_t kPunct = 1, kSpace = 2, kDrop = 4, kCjk = 8, kMn = 16,
                  kRisky = 32;

struct Vocab {
  std::unordered_map<std::string, int32_t> map;
  int32_t unk_id;
  int32_t max_word_chars;
};

// utf-32 codepoint -> utf-8 append
inline void cp_to_utf8(uint32_t cp, std::string* out) {
  if (cp < 0x80) {
    out->push_back(static_cast<char>(cp));
  } else if (cp < 0x800) {
    out->push_back(static_cast<char>(0xC0 | (cp >> 6)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    out->push_back(static_cast<char>(0xE0 | (cp >> 12)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    out->push_back(static_cast<char>(0xF0 | (cp >> 18)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
}

// greedy longest-match over one word's codepoints; returns false -> UNK
bool wordpiece(const Vocab& v, const std::vector<uint32_t>& word,
               std::vector<int32_t>* ids) {
  const size_t n = word.size();
  if (n > static_cast<size_t>(v.max_word_chars)) return false;
  // utf-8 prefix sums so substring probes are O(1) slices
  std::string flat;
  std::vector<size_t> off(n + 1, 0);
  for (size_t i = 0; i < n; ++i) {
    cp_to_utf8(word[i], &flat);
    off[i + 1] = flat.size();
  }
  size_t start = 0;
  std::string probe;
  const size_t before = ids->size();
  while (start < n) {
    size_t end = n;
    int32_t cur = -1;
    while (start < end) {
      probe.clear();
      if (start > 0) probe.append("##");
      probe.append(flat, off[start], off[end] - off[start]);
      auto it = v.map.find(probe);
      if (it != v.map.end()) {
        cur = it->second;
        break;
      }
      --end;
    }
    if (cur < 0) {
      ids->resize(before);
      return false;
    }
    ids->push_back(cur);
    start = end;
  }
  return true;
}

struct Tables {
  const uint8_t* cls;         // [0x110000] classification bits
  const int32_t* lower_offs;  // [0x110000 + 1] into lower_blob
  const uint32_t* lower_blob;
  const int32_t* nfd_offs;    // [0x110000 + 1] into nfd_blob
  const uint32_t* nfd_blob;
};

// one text -> ids (no special tokens); returns false when RISKY
bool encode_one(const Vocab& v, const Tables& t, const uint32_t* cps,
                int64_t n, bool lower, bool strip,
                std::vector<int32_t>* ids) {
  std::vector<uint32_t> buf;
  buf.reserve(n + 8);
  // pass 1: drop control chars, map whitespace to ' ', risky check
  for (int64_t i = 0; i < n; ++i) {
    uint32_t cp = cps[i] < 0x110000 ? cps[i] : 0xFFFD;
    uint8_t c = t.cls[cp];
    if (c & kRisky) return false;
    if (c & kDrop) continue;
    buf.push_back((c & kSpace) ? 32u : cp);
  }
  // pass 2: lowercase (table, 1->N)
  std::vector<uint32_t> buf2;
  if (lower) {
    buf2.reserve(buf.size() + 8);
    for (uint32_t cp : buf) {
      const int32_t a = t.lower_offs[cp], b = t.lower_offs[cp + 1];
      for (int32_t k = a; k < b; ++k) buf2.push_back(t.lower_blob[k]);
    }
    buf.swap(buf2);
  }
  // pass 3: NFD + drop Mn (table, per char — kRisky excluded above)
  if (strip) {
    buf2.clear();
    buf2.reserve(buf.size() + 8);
    for (uint32_t cp : buf) {
      const int32_t a = t.nfd_offs[cp], b = t.nfd_offs[cp + 1];
      for (int32_t k = a; k < b; ++k) {
        const uint32_t d = t.nfd_blob[k];
        if (!(t.cls[d] & kMn)) buf2.push_back(d);
      }
    }
    buf.swap(buf2);
  }
  // pass 4: token scan (word = run of non-space non-single; punct/CJK
  // are single-char tokens) + wordpiece per token
  std::vector<uint32_t> word;
  auto flush = [&]() {
    if (!word.empty()) {
      if (!wordpiece(v, word, ids)) ids->push_back(v.unk_id);
      word.clear();
    }
  };
  for (uint32_t cp : buf) {
    const uint8_t c = t.cls[cp];
    if (cp == 32u) {
      flush();
    } else if (c & (kPunct | kCjk)) {
      flush();
      word.push_back(cp);
      flush();
    } else {
      word.push_back(cp);
    }
  }
  flush();
  return true;
}

}  // namespace

extern "C" {

void* wp_create(const uint8_t* blob, const int64_t* offs, int64_t n_tokens,
                int32_t unk_id, int32_t max_word_chars) {
  auto* v = new Vocab();
  v->unk_id = unk_id;
  v->max_word_chars = max_word_chars;
  v->map.reserve(static_cast<size_t>(n_tokens) * 2);
  for (int64_t i = 0; i < n_tokens; ++i) {
    v->map.emplace(
        std::string(reinterpret_cast<const char*>(blob + offs[i]),
                    static_cast<size_t>(offs[i + 1] - offs[i])),
        static_cast<int32_t>(i));
  }
  return v;
}

void wp_free(void* h) { delete static_cast<Vocab*>(h); }

// out_ids: [n_texts * max_length] (pre-filled with pad by the caller);
// out_lens[i]: ids written for text i, or -1 = RISKY (Python fallback).
void wp_encode_batch(void* h, const uint32_t* text_cps,
                     const int64_t* text_offs, int64_t n_texts,
                     const uint8_t* cls_tbl, const int32_t* lower_offs,
                     const uint32_t* lower_blob, const int32_t* nfd_offs,
                     const uint32_t* nfd_blob, int lower, int strip,
                     int add_special, int32_t cls_id, int32_t sep_id,
                     int32_t max_length, int truncation, int n_threads,
                     int32_t* out_ids, int32_t* out_lens) {
  const Vocab& v = *static_cast<Vocab*>(h);
  Tables t{cls_tbl, lower_offs, lower_blob, nfd_offs, nfd_blob};
  if (n_threads < 1) n_threads = 1;

  auto work = [&](int64_t lo, int64_t hi) {
    std::vector<int32_t> ids;
    for (int64_t i = lo; i < hi; ++i) {
      ids.clear();
      const uint32_t* cps = text_cps + text_offs[i];
      const int64_t n = text_offs[i + 1] - text_offs[i];
      if (!encode_one(v, t, cps, n, lower != 0, strip != 0, &ids)) {
        out_lens[i] = -1;
        continue;
      }
      // truncation semantics of WordPieceTokenizer.encode
      size_t keep = ids.size();
      if (add_special) {
        if (truncation && keep > static_cast<size_t>(max_length - 2))
          keep = static_cast<size_t>(max_length - 2);
      } else if (truncation && keep > static_cast<size_t>(max_length)) {
        keep = static_cast<size_t>(max_length);
      }
      int32_t* row = out_ids + i * max_length;
      int32_t m = 0;
      if (add_special) row[m++] = cls_id;
      for (size_t k = 0; k < keep && m < max_length; ++k) row[m++] = ids[k];
      if (add_special && m < max_length) row[m++] = sep_id;
      out_lens[i] = m;
    }
  };

  if (n_threads == 1 || n_texts < 64) {
    work(0, n_texts);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (n_texts + n_threads - 1) / n_threads;
  for (int tid = 0; tid < n_threads; ++tid) {
    const int64_t lo = tid * chunk;
    const int64_t hi = std::min<int64_t>(n_texts, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
