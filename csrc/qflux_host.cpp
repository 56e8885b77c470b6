// qflux_tpu native host runtime: fast content hashing + threaded pixel prep.
//
// The reference framework leans on third-party native code for its host path
// (blake3 for cache content-addressing, torch DataLoader C++ workers, OpenCV)
// — see SURVEY.md §2.9.  This library provides the first-party equivalents
// this environment lacks:
//
//   * xxh64        — XXH64 content hash (public domain algorithm), used for
//                    fast cache addressing of multi-GB safetensors shards
//                    where Python md5 becomes the cache-build bottleneck;
//   * xxh64_file   — streaming file variant;
//   * u8_to_f32    — multithreaded uint8 → float32 scale/shift conversion
//                    (image → [-1,1] model range) for the host preprocessing
//                    path feeding jax.device_put.
//
// Built with `make -C csrc` (plain g++, no deps); loaded via ctypes from
// qflux_tpu/runtime/native.py with a pure-Python fallback.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// XXH64 (Yann Collet's xxHash, public-domain reference algorithm)

static const uint64_t P1 = 11400714785074694791ULL;
static const uint64_t P2 = 14029467366897019727ULL;
static const uint64_t P3 = 1609587929392839161ULL;
static const uint64_t P4 = 9650029242287828579ULL;
static const uint64_t P5 = 2870177450012600261ULL;

static inline uint64_t rotl(uint64_t x, int r) { return (x << r) | (x >> (64 - r)); }

static inline uint64_t read64(const uint8_t* p) {
  uint64_t v;
  memcpy(&v, p, 8);
  return v;
}

static inline uint32_t read32(const uint8_t* p) {
  uint32_t v;
  memcpy(&v, p, 4);
  return v;
}

static inline uint64_t round_(uint64_t acc, uint64_t input) {
  acc += input * P2;
  acc = rotl(acc, 31);
  return acc * P1;
}

static inline uint64_t merge_round(uint64_t acc, uint64_t val) {
  acc ^= round_(0, val);
  return acc * P1 + P4;
}

uint64_t xxh64(const uint8_t* data, uint64_t len, uint64_t seed) {
  const uint8_t* p = data;
  const uint8_t* end = data + len;
  uint64_t h;
  if (len >= 32) {
    uint64_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    const uint8_t* limit = end - 32;
    do {
      v1 = round_(v1, read64(p)); p += 8;
      v2 = round_(v2, read64(p)); p += 8;
      v3 = round_(v3, read64(p)); p += 8;
      v4 = round_(v4, read64(p)); p += 8;
    } while (p <= limit);
    h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
    h = merge_round(h, v1);
    h = merge_round(h, v2);
    h = merge_round(h, v3);
    h = merge_round(h, v4);
  } else {
    h = seed + P5;
  }
  h += len;
  while (p + 8 <= end) {
    h ^= round_(0, read64(p));
    h = rotl(h, 27) * P1 + P4;
    p += 8;
  }
  if (p + 4 <= end) {
    h ^= (uint64_t)read32(p) * P1;
    h = rotl(h, 23) * P2 + P3;
    p += 4;
  }
  while (p < end) {
    h ^= (*p) * P5;
    h = rotl(h, 11) * P1;
    p++;
  }
  h ^= h >> 33;
  h *= P2;
  h ^= h >> 29;
  h *= P3;
  h ^= h >> 32;
  return h;
}

// streaming whole-file hash; returns 0 on IO error (caller falls back).
// TRUE incremental XXH64: the 4-lane stripe state and the <32-byte tail are
// carried across chunks, so the digest equals xxh64(whole_file) bit-exactly
// (and therefore matches the pure-python fallback) regardless of chunk size.
uint64_t xxh64_file(const char* path, uint64_t seed) {
  FILE* f = fopen(path, "rb");
  if (!f) return 0;
  const size_t CHUNK = 1 << 22;
  std::vector<uint8_t> buf(CHUNK + 32);
  uint64_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
  uint64_t total = 0;
  bool striped = false;
  size_t carry = 0;  // <32-byte tail carried in buf[0:carry]
  size_t n;
  while ((n = fread(buf.data() + carry, 1, CHUNK, f)) > 0) {
    total += n;
    size_t avail = carry + n;
    const uint8_t* p = buf.data();
    size_t usable = avail - (avail % 32);
    const uint8_t* end32 = buf.data() + usable;
    while (p < end32) {
      v1 = round_(v1, read64(p)); p += 8;
      v2 = round_(v2, read64(p)); p += 8;
      v3 = round_(v3, read64(p)); p += 8;
      v4 = round_(v4, read64(p)); p += 8;
      striped = true;
    }
    carry = avail - usable;
    if (carry) memmove(buf.data(), end32, carry);
  }
  fclose(f);
  uint64_t h;
  if (striped) {
    h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
    h = merge_round(h, v1);
    h = merge_round(h, v2);
    h = merge_round(h, v3);
    h = merge_round(h, v4);
  } else {
    h = seed + P5;
  }
  h += total;
  const uint8_t* p = buf.data();
  const uint8_t* end = buf.data() + carry;
  while (p + 8 <= end) {
    h ^= round_(0, read64(p));
    h = rotl(h, 27) * P1 + P4;
    p += 8;
  }
  if (p + 4 <= end) {
    h ^= (uint64_t)read32(p) * P1;
    h = rotl(h, 23) * P2 + P3;
    p += 4;
  }
  while (p < end) {
    h ^= (*p) * P5;
    h = rotl(h, 11) * P1;
    p++;
  }
  h ^= h >> 33;
  h *= P2;
  h ^= h >> 29;
  h *= P3;
  h ^= h >> 32;
  return h ? h : 1;  // avoid the 0 IO-error sentinel
}

// ---------------------------------------------------------------------------
// threaded uint8 → float32 scale/shift (x * scale + shift)

void u8_to_f32(const uint8_t* src, float* dst, uint64_t n, float scale,
               float shift, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if ((uint64_t)n_threads > n / (1 << 16) + 1)
    n_threads = (int)(n / (1 << 16) + 1);
  std::vector<std::thread> threads;
  uint64_t per = n / n_threads;
  for (int t = 0; t < n_threads; t++) {
    uint64_t lo = t * per;
    uint64_t hi = (t == n_threads - 1) ? n : lo + per;
    threads.emplace_back([=]() {
      for (uint64_t i = lo; i < hi; i++) dst[i] = src[i] * scale + shift;
    });
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
