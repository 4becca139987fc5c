// Native contrastive-pair batch builder.
//
// The reference delegates host-side batch prep to torch DataLoader worker
// processes (C++ under the hood, /root/reference/train.py:195-202); our
// equivalent hot path is crop -> augment -> bos/eos -> pad for every
// chunk (czechtriever_tpu/data/augment.py, mirroring
// /root/reference/src/data.py:553-652). This library performs that work
// for a whole batch in one call, multithreaded, writing directly into
// caller-provided numpy buffers — no per-example Python objects, no GIL
// in the hot loop (the ctypes call releases it).
//
// Semantics match the numpy implementation *distributionally* (same crop
// length/start laws, same per-token Bernoulli augmentations); the RNG
// stream itself is a per-example splitmix64/xoshiro-style generator
// seeded from (batch_seed, example_index), so results are deterministic
// for a given seed but not bit-identical to numpy's PCG64 stream.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread
//        pairgen.cpp -o libpairgen.so     (see native/build.py)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// splitmix64: tiny, fast, passes BigCrush as a seeder.
struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(seed) {}
  uint64_t next() {
    uint64_t z = (state += 0x9e3779b97f4a7c15ull);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
    return z ^ (z >> 31);
  }
  // uniform double in [0, 1)
  double uniform() { return (next() >> 11) * 0x1.0p-53; }
  // uniform integer in [0, n) without modulo bias (n > 0)
  uint64_t below(uint64_t n) {
    uint64_t threshold = (-n) % n;
    for (;;) {
      uint64_t r = next();
      if (r >= threshold) return r % n;
    }
  }
};

enum Aug { kNone = 0, kMask = 1, kReplace = 2, kDelete = 3, kShuffle = 4 };

struct Params {
  int64_t chunk_len, max_len;
  double ratio_min, ratio_max, prob;
  int aug;
  int64_t mask_id, start_id, vocab_size, bos_id, eos_id;  // -1 = absent
};

// one crop+augment+bos/eos -> padded row. scratch must hold chunk_len.
void make_one(const int32_t* chunk, const Params& p, Rng& rng,
              int32_t* out_ids, int32_t* out_mask, int32_t* scratch) {
  // random_crop (src/data.py:553-560): ratio ~ U[min,max],
  // length = int(n * ratio), start ~ randint(0, n - length) inclusive
  const double ratio =
      p.ratio_min + (p.ratio_max - p.ratio_min) * rng.uniform();
  int64_t length = static_cast<int64_t>(p.chunk_len * ratio);
  if (length > p.chunk_len) length = p.chunk_len;
  const int64_t start = static_cast<int64_t>(
      rng.below(static_cast<uint64_t>(p.chunk_len - length + 1)));

  int64_t n = 0;
  switch (p.aug) {
    case kDelete:  // keep tokens with u > p (src/data.py:581-585)
      for (int64_t i = 0; i < length; ++i) {
        if (rng.uniform() > p.prob) scratch[n++] = chunk[start + i];
      }
      break;
    case kReplace:  // u <= p -> uniform token (src/data.py:588-592)
      for (int64_t i = 0; i < length; ++i) {
        const bool hit = rng.uniform() <= p.prob;
        const int32_t repl = static_cast<int32_t>(
            p.start_id +
            static_cast<int64_t>(rng.below(
                static_cast<uint64_t>(p.vocab_size - p.start_id))));
        scratch[n++] = hit ? repl : chunk[start + i];
      }
      break;
    case kMask:  // u <= p -> mask_id (src/data.py:595-598)
      for (int64_t i = 0; i < length; ++i) {
        scratch[n++] = rng.uniform() <= p.prob
                           ? static_cast<int32_t>(p.mask_id)
                           : chunk[start + i];
      }
      break;
    case kShuffle: {  // permute a Binomial(n,p) subset (src/data.py:601-610)
      for (int64_t i = 0; i < length; ++i) scratch[n++] = chunk[start + i];
      int64_t count = 0;
      for (int64_t i = 0; i < length; ++i) count += rng.uniform() < p.prob;
      if (count > 1) {
        // sample `count` distinct positions (partial Fisher-Yates over an
        // index array), then cyclically permute the values at them
        std::vector<int64_t> idx(length);
        for (int64_t i = 0; i < length; ++i) idx[i] = i;
        for (int64_t i = 0; i < count; ++i) {
          const int64_t j =
              i + static_cast<int64_t>(
                      rng.below(static_cast<uint64_t>(length - i)));
          std::swap(idx[i], idx[j]);
        }
        // random permutation of the chosen slots (Fisher-Yates on values)
        for (int64_t i = count - 1; i > 0; --i) {
          const int64_t j = static_cast<int64_t>(
              rng.below(static_cast<uint64_t>(i + 1)));
          std::swap(scratch[idx[i]], scratch[idx[j]]);
        }
      }
      break;
    }
    default:
      for (int64_t i = 0; i < length; ++i) scratch[n++] = chunk[start + i];
  }

  // add_bos_eos (src/data.py:635-652) + pad to max_len
  int64_t w = 0;
  if (p.bos_id >= 0 && w < p.max_len)
    out_ids[w++] = static_cast<int32_t>(p.bos_id);
  for (int64_t i = 0; i < n && w < p.max_len; ++i) out_ids[w++] = scratch[i];
  if (p.eos_id >= 0 && w < p.max_len)
    out_ids[w++] = static_cast<int32_t>(p.eos_id);
  for (int64_t i = 0; i < w; ++i) out_mask[i] = 1;
  // caller provides zeroed buffers; ids/mask beyond w stay 0
}

}  // namespace

extern "C" {

// chunks: [n, chunk_len] int32. q_ids/q_mask/k_ids/k_mask: [n, max_len]
// int32, ZEROED by the caller. Returns 0 on success.
int build_pair_batch(const int32_t* chunks, int64_t n, int64_t chunk_len,
                     double ratio_min, double ratio_max, int aug,
                     double prob, int64_t mask_id, int64_t start_id,
                     int64_t vocab_size, int64_t bos_id, int64_t eos_id,
                     uint64_t seed, int64_t max_len, int32_t* q_ids,
                     int32_t* q_mask, int32_t* k_ids, int32_t* k_mask,
                     int num_threads) {
  if (n <= 0 || chunk_len <= 0 || max_len <= 0) return 1;
  if (aug == kReplace && vocab_size <= start_id) return 2;
  Params p{chunk_len, max_len, ratio_min, ratio_max, prob, aug,
           mask_id,   start_id, vocab_size, bos_id,  eos_id};

  const int nt = std::max(
      1, std::min<int>(num_threads, std::thread::hardware_concurrency()));
  auto worker = [&](int t) {
    std::vector<int32_t> scratch(static_cast<size_t>(chunk_len));
    for (int64_t i = t; i < n; i += nt) {
      // per-example stream: deterministic in (seed, i), independent
      // across examples -> any thread count gives identical batches
      Rng rng(seed * 0x9e3779b97f4a7c15ull + static_cast<uint64_t>(i) + 1);
      const int32_t* chunk = chunks + i * chunk_len;
      make_one(chunk, p, rng, q_ids + i * max_len, q_mask + i * max_len,
               scratch.data());
      make_one(chunk, p, rng, k_ids + i * max_len, k_mask + i * max_len,
               scratch.data());
    }
  };
  if (nt == 1) {
    worker(0);
  } else {
    std::vector<std::thread> threads;
    threads.reserve(nt);
    for (int t = 0; t < nt; ++t) threads.emplace_back(worker, t);
    for (auto& th : threads) th.join();
  }
  return 0;
}

}  // extern "C"
