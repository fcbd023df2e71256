// Native data loader for the enwik8 char-LM training pipeline.
//
// C++ replacement for the reference's TextSamplerDataset (reference:
// train.py:75-92): keeps the (optionally gzip'd) byte corpus in native
// memory, samples random crops with a xorshift64* PRNG, and widens bytes
// to the int32 token ids the model consumes — all off the Python heap,
// with a double-buffered prefetch thread driven from the Python side
// (flash_cosine_sim_attention_tpu/data/loader.py).
//
// Exposed C ABI:
//   dl_open(path)                      -> handle (nullptr on error)
//   dl_size(handle)                    -> corpus size in bytes
//   dl_sample(handle, start, end, batch, width, seed, out_int32)
//   dl_close(handle)
//
// Build: g++ -O2 -shared -fPIC dataloader.cc -o libfcsa_data.so -lz

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

struct Corpus {
  std::vector<uint8_t> data;
};

bool has_suffix(const std::string& s, const std::string& suf) {
  return s.size() >= suf.size() &&
         s.compare(s.size() - suf.size(), suf.size(), suf) == 0;
}

// xorshift64* — deterministic, fast, good enough for crop sampling
inline uint64_t next_rand(uint64_t* state) {
  uint64_t x = *state;
  x ^= x >> 12;
  x ^= x << 25;
  x ^= x >> 27;
  *state = x;
  return x * 0x2545F4914F6CDD1DULL;
}

bool read_plain(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(n));
  size_t got = std::fread(out->data(), 1, out->size(), f);
  std::fclose(f);
  return got == out->size();
}

bool read_gzip(const char* path, std::vector<uint8_t>* out) {
  gzFile f = gzopen(path, "rb");
  if (!f) return false;
  constexpr size_t kChunk = 1 << 22;  // 4 MiB
  out->clear();
  std::vector<uint8_t> buf(kChunk);
  int n;
  while ((n = gzread(f, buf.data(), kChunk)) > 0) {
    out->insert(out->end(), buf.data(), buf.data() + n);
  }
  gzclose(f);
  return n == 0 && !out->empty();
}

}  // namespace

extern "C" {

void* dl_open(const char* path) {
  auto* c = new Corpus();
  bool ok = has_suffix(path, ".gz") ? read_gzip(path, &c->data)
                                    : read_plain(path, &c->data);
  if (!ok) {
    delete c;
    return nullptr;
  }
  return c;
}

long dl_size(void* handle) {
  return static_cast<long>(static_cast<Corpus*>(handle)->data.size());
}

// Fill out[batch][width] with random crops from data[start:end).
// width = seq_len + 1 (shifted-label training). Returns 0 on success.
int dl_sample(void* handle, long start, long end, int batch, int width,
              uint64_t seed, int32_t* out) {
  auto* c = static_cast<Corpus*>(handle);
  const long size = static_cast<long>(c->data.size());
  if (start < 0 || end > size || end - start <= width) return 1;
  uint64_t state = seed ^ 0x9E3779B97F4A7C15ULL;
  next_rand(&state);
  const uint64_t range = static_cast<uint64_t>(end - start - width);
  for (int b = 0; b < batch; ++b) {
    const long off = start + static_cast<long>(next_rand(&state) % range);
    const uint8_t* src = c->data.data() + off;
    int32_t* dst = out + static_cast<long>(b) * width;
    for (int i = 0; i < width; ++i) dst[i] = static_cast<int32_t>(src[i]);
  }
  return 0;
}

void dl_close(void* handle) { delete static_cast<Corpus*>(handle); }

}  // extern "C"
