// Native threefry2x32 bit generator + fused uniform tail, bit-identical to
// jax.random under jax_threefry_partitionable=True (see utils/hostrng.py for
// the semantics pinned against jax/_src/prng.py:1092,1156,1184 and
// jax/_src/random.py:435). hostrng.py is the reference implementation; this
// library only accelerates it (one pass, multithreaded, hardware FMA for the
// affine tail exactly as XLA CPU emits it). Exactness vs both the numpy path
// and jax.random is pinned in tests/test_hostrng.py.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Threefry-2x32-20 of the position counter (hi32(idx), lo32(idx)); returns
// the xor of the output pair == jax's 32-bit random_bits. Fully unrolled
// with constant rotation amounts so the compiler auto-vectorizes the
// per-position loops below (the hosts this runs on are single-core; SIMD is
// the only parallelism available).
#define ASYRP_TF_ROUND(r)                  \
  x0 += x1;                                \
  x1 = (x1 << (r)) | (x1 >> (32 - (r)));   \
  x1 ^= x0;

inline uint32_t tf_bits(uint32_t k1, uint32_t k2, uint64_t idx) {
  const uint32_t k3 = k1 ^ k2 ^ 0x1BD11BDAu;
  uint32_t x0 = static_cast<uint32_t>(idx >> 32) + k1;
  uint32_t x1 = static_cast<uint32_t>(idx) + k2;
  ASYRP_TF_ROUND(13) ASYRP_TF_ROUND(15) ASYRP_TF_ROUND(26) ASYRP_TF_ROUND(6)
  x0 += k2; x1 += k3 + 1u;
  ASYRP_TF_ROUND(17) ASYRP_TF_ROUND(29) ASYRP_TF_ROUND(16) ASYRP_TF_ROUND(24)
  x0 += k3; x1 += k1 + 2u;
  ASYRP_TF_ROUND(13) ASYRP_TF_ROUND(15) ASYRP_TF_ROUND(26) ASYRP_TF_ROUND(6)
  x0 += k1; x1 += k2 + 3u;
  ASYRP_TF_ROUND(17) ASYRP_TF_ROUND(29) ASYRP_TF_ROUND(16) ASYRP_TF_ROUND(24)
  x0 += k2; x1 += k3 + 4u;
  ASYRP_TF_ROUND(13) ASYRP_TF_ROUND(15) ASYRP_TF_ROUND(26) ASYRP_TF_ROUND(6)
  x0 += k3; x1 += k1 + 5u;
  return x0 ^ x1;
}
#undef ASYRP_TF_ROUND

void bits_block(uint32_t k1, uint32_t k2, uint64_t start, int64_t n,
                uint32_t* out) {
  for (int64_t i = 0; i < n; ++i)
    out[i] = tf_bits(k1, k2, start + static_cast<uint64_t>(i));
}

void uniform_block(uint32_t k1, uint32_t k2, uint64_t start, int64_t n,
                   float minval, float maxval, float* out) {
  const float range = maxval - minval;
  for (int64_t i = 0; i < n; ++i) {
    uint32_t u = (tf_bits(k1, k2, start + static_cast<uint64_t>(i)) >> 9)
                 | 0x3F800000u;  // exponent 1, random 23-bit mantissa
    float f;
    std::memcpy(&f, &u, sizeof(f));
    f -= 1.0f;
    // single fused multiply-add, matching XLA CPU's lowering of
    // floats * (maxval - minval) + minval
    out[i] = std::max(minval, fmaf(f, range, minval));
  }
}

template <typename Fn>
void parallel_for(int64_t n, int n_threads, Fn fn) {
  if (n_threads <= 1 || n < (1 << 16)) {
    fn(0, n);
    return;
  }
  const int nt = std::min<int64_t>(n_threads, (n + (1 << 14)) >> 14);
  const int64_t per = (n + nt - 1) / nt;
  std::vector<std::thread> ts;
  ts.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    const int64_t s = t * per, e = std::min<int64_t>(n, s + per);
    if (s >= e) break;
    ts.emplace_back([=] { fn(s, e - s); });
  }
  for (auto& th : ts) th.join();
}

}  // namespace

extern "C" {

int asyrp_threefry_bits(uint32_t k1, uint32_t k2, uint64_t offset, int64_t n,
                        uint32_t* out, int n_threads) {
  if (n < 0 || !out) return 1;
  parallel_for(n, n_threads, [&](int64_t s, int64_t len) {
    bits_block(k1, k2, offset + static_cast<uint64_t>(s), len, out + s);
  });
  return 0;
}

int asyrp_threefry_uniform(uint32_t k1, uint32_t k2, uint64_t offset,
                           int64_t n, float minval, float maxval, float* out,
                           int n_threads) {
  if (n < 0 || !out) return 1;
  parallel_for(n, n_threads, [&](int64_t s, int64_t len) {
    uniform_block(k1, k2, offset + static_cast<uint64_t>(s), len, minval,
                  maxval, out + s);
  });
  return 0;
}

}  // extern "C"
