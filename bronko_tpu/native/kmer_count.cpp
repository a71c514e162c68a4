// Host-side streaming k-mer counter (KMC3-equivalent semantics).
//
// Counts non-canonical k-mers (KMC -b) from FASTQ, skipping windows that
// contain non-ACGT bases, flooring at ci and capping at cs
// (reference invocation: call.rs:1166-1181). Open-addressing hash table
// with linear probing and power-of-two growth; single pass over the file
// via the same zlib reader as fastq_reader.cpp.
//
// This is the IO-optimal front end when host<->device bandwidth is scarce:
// only the unique (k-mer, count) pairs ship to the device mapper. The
// device-side sort-based counter (ops/count.py) remains the TPU-native
// path when reads are already device-resident.

#include <zlib.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Counter {
  int k = 21;
  std::vector<uint64_t> keys;
  std::vector<uint32_t> vals;
  size_t mask = 0;
  size_t used = 0;
  int64_t total_reads = 0;
  int64_t total_kmers = 0;
  unsigned char code[256];

  static constexpr uint64_t kEmpty = ~0ull;

  explicit Counter(int k_) : k(k_) {
    memset(code, 4, sizeof(code));
    code[(unsigned char)'A'] = 0; code[(unsigned char)'a'] = 0;
    code[(unsigned char)'C'] = 1; code[(unsigned char)'c'] = 1;
    code[(unsigned char)'G'] = 2; code[(unsigned char)'g'] = 2;
    code[(unsigned char)'T'] = 3; code[(unsigned char)'t'] = 3;
    resize(1ull << 22);
  }

  void resize(size_t n) {
    std::vector<uint64_t> old_keys = std::move(keys);
    std::vector<uint32_t> old_vals = std::move(vals);
    keys.assign(n, kEmpty);
    vals.assign(n, 0);
    mask = n - 1;
    if (!old_keys.empty()) {
      for (size_t i = 0; i < old_keys.size(); ++i) {
        if (old_keys[i] != kEmpty) insert_raw(old_keys[i], old_vals[i]);
      }
    }
  }

  static inline uint64_t mix(uint64_t z) {
    z ^= z >> 30; z *= 0xbf58476d1ce4e5b9ull;
    z ^= z >> 27; z *= 0x94d049bb133111ebull;
    return z ^ (z >> 31);
  }

  inline void insert_raw(uint64_t key, uint32_t add) {
    size_t i = mix(key) & mask;
    while (true) {
      if (keys[i] == key) { vals[i] += add; return; }
      if (keys[i] == kEmpty) { keys[i] = key; vals[i] = add; ++used; return; }
      i = (i + 1) & mask;
    }
  }

  inline void add(uint64_t key) {
    insert_raw(key, 1);
    ++total_kmers;
    if (used * 5 > keys.size() * 3) resize(keys.size() * 2);  // load > 0.6
  }

  void count_seq(const char* s, int64_t len) {
    const uint64_t kmask = (k < 32) ? ((1ull << (2 * k)) - 1) : ~0ull;
    uint64_t cur = 0;
    int valid = 0;
    for (int64_t i = 0; i < len; ++i) {
      unsigned char b = code[(unsigned char)s[i]];
      if (b >= 4) { valid = 0; cur = 0; continue; }
      cur = ((cur << 2) | b) & kmask;
      if (++valid >= k) add(cur);
    }
  }
};

constexpr size_t kReadBlock = 8 << 20;

}  // namespace

extern "C" {

void* bronko_counter_create(int k) { return new Counter(k); }
void bronko_counter_destroy(void* h) { delete static_cast<Counter*>(h); }

// Stream one FASTQ file (gz or plain) through the counter.
// Returns 0 on success, -1 on open failure, -2 on malformed input.
int bronko_counter_count_fastq(void* h, const char* path) {
  auto* c = static_cast<Counter*>(h);
  gzFile gz = gzopen(path, "rb");
  if (!gz) return -1;
  gzbuffer(gz, 1 << 20);

  std::vector<char> buf;
  size_t pos = 0;
  bool eof = false;
  int rc = 0;

  auto refill = [&]() {
    if (pos > 0) { buf.erase(buf.begin(), buf.begin() + pos); pos = 0; }
    if (eof) return !buf.empty();
    size_t old = buf.size();
    buf.resize(old + kReadBlock);
    int n = gzread(gz, buf.data() + old, (unsigned)kReadBlock);
    if (n <= 0) { eof = true; buf.resize(old); }
    else { buf.resize(old + (size_t)n); if ((size_t)n < kReadBlock) eof = true; }
    return !buf.empty();
  };

  while (true) {
    const char* data = buf.data() + pos;
    size_t avail = buf.size() - pos;
    const char* nl[4];
    size_t scanned = 0;
    int found = 0;
    for (; found < 4; ++found) {
      const char* p = static_cast<const char*>(
          memchr(data + scanned, '\n', avail - scanned));
      if (!p) break;
      nl[found] = p;
      scanned = (size_t)(p - data) + 1;
    }
    if (found < 4) {
      if (eof) {
        if (avail > 0 && found == 3) { nl[3] = data + avail - 1; found = 4; scanned = avail; }
        else break;
      } else {
        if (!refill()) break;
        continue;
      }
    }
    if (data[0] != '@') { rc = -2; break; }
    const char* seq_start = nl[0] + 1;
    const char* seq_end = nl[1];
    while (seq_end > seq_start && seq_end[-1] == '\r') --seq_end;
    c->count_seq(seq_start, seq_end - seq_start);
    ++c->total_reads;
    pos += scanned;
  }
  gzclose(gz);
  return rc;
}

int64_t bronko_counter_total_reads(void* h) { return static_cast<Counter*>(h)->total_reads; }
int64_t bronko_counter_total_kmers(void* h) { return static_cast<Counter*>(h)->total_kmers; }
int64_t bronko_counter_unique(void* h) { return (int64_t)static_cast<Counter*>(h)->used; }

// Number of unique k-mers with count >= ci.
int64_t bronko_counter_unique_counted(void* h, uint32_t ci) {
  auto* c = static_cast<Counter*>(h);
  int64_t n = 0;
  for (size_t i = 0; i < c->keys.size(); ++i)
    if (c->keys[i] != Counter::kEmpty && c->vals[i] >= ci) ++n;
  return n;
}

// Extract (kmer, min(count, cs)) pairs with count >= ci, sorted by k-mer.
// out_kmers/out_counts must hold bronko_counter_unique_counted() entries.
void bronko_counter_extract(void* h, uint32_t ci, uint32_t cs,
                            uint64_t* out_kmers, uint32_t* out_counts) {
  auto* c = static_cast<Counter*>(h);
  std::vector<std::pair<uint64_t, uint32_t>> items;
  items.reserve(c->used);
  for (size_t i = 0; i < c->keys.size(); ++i) {
    if (c->keys[i] != Counter::kEmpty && c->vals[i] >= ci)
      items.emplace_back(c->keys[i], std::min(c->vals[i], cs));
  }
  std::sort(items.begin(), items.end());
  for (size_t i = 0; i < items.size(); ++i) {
    out_kmers[i] = items[i].first;
    out_counts[i] = items[i].second;
  }
}

}  // extern "C"
