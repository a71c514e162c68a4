// Host-side streaming k-mer counter (KMC3-equivalent semantics).
//
// Counts non-canonical k-mers (KMC -b) from FASTQ, skipping windows that
// contain non-ACGT bases, flooring at ci and capping at cs
// (reference invocation: call.rs:1166-1181).
//
// Parallel pipeline: one reader thread decompresses and splits records into
// sequence batches; N counter threads consume whole batches into private
// open-addressing tables; finalize() merges tables by sort. This is the
// IO-optimal front end when host<->device bandwidth is scarce: only the
// unique (k-mer, count) pairs ship to the device mapper.

#include <zlib.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Table {
  std::vector<uint64_t> keys;
  std::vector<uint32_t> vals;
  size_t mask = 0;
  size_t used = 0;

  static constexpr uint64_t kEmpty = ~0ull;

  Table() { reset(1ull << 20); }

  void reset(size_t n) {
    keys.assign(n, kEmpty);
    vals.assign(n, 0);
    mask = n - 1;
    used = 0;
  }

  static inline uint64_t mix(uint64_t z) {
    z ^= z >> 30; z *= 0xbf58476d1ce4e5b9ull;
    z ^= z >> 27; z *= 0x94d049bb133111ebull;
    return z ^ (z >> 31);
  }

  void grow() {
    std::vector<uint64_t> ok = std::move(keys);
    std::vector<uint32_t> ov = std::move(vals);
    keys.assign(ok.size() * 2, kEmpty);
    vals.assign(ok.size() * 2, 0);
    mask = keys.size() - 1;
    used = 0;
    for (size_t i = 0; i < ok.size(); ++i)
      if (ok[i] != kEmpty) insert(ok[i], ov[i]);
  }

  inline void insert(uint64_t key, uint32_t add) {
    size_t i = mix(key) & mask;
    while (true) {
      if (keys[i] == key) { vals[i] += add; return; }
      if (keys[i] == kEmpty) {
        keys[i] = key; vals[i] = add;
        if (++used * 5 > keys.size() * 3) grow();
        return;
      }
      i = (i + 1) & mask;
    }
  }
};

struct Batch {
  std::vector<char> seq;       // concatenated sequences
  std::vector<int32_t> lens;   // per-read lengths
};

struct Counter {
  int k = 21;
  int n_threads = 1;
  std::vector<Table> tables;
  std::vector<int64_t> thread_kmers;
  int64_t total_reads = 0;
  unsigned char code[256];

  // merged output
  std::vector<uint64_t> out_keys;
  std::vector<uint32_t> out_vals;
  int64_t n_unique = 0;
  bool finalized = false;

  // pipeline state
  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  std::deque<Batch> queue;
  bool done = false;
  static constexpr size_t kMaxQueue = 8;

  explicit Counter(int k_, int threads) : k(k_), n_threads(threads) {
    memset(code, 4, sizeof(code));
    code[(unsigned char)'A'] = 0; code[(unsigned char)'a'] = 0;
    code[(unsigned char)'C'] = 1; code[(unsigned char)'c'] = 1;
    code[(unsigned char)'G'] = 2; code[(unsigned char)'g'] = 2;
    code[(unsigned char)'T'] = 3; code[(unsigned char)'t'] = 3;
    tables.resize(n_threads);
    thread_kmers.assign(n_threads, 0);
  }

  void count_seq(Table& t, int64_t& nk, const char* s, int64_t len) {
    const uint64_t kmask = (k < 32) ? ((1ull << (2 * k)) - 1) : ~0ull;
    uint64_t cur = 0;
    int valid = 0;
    for (int64_t i = 0; i < len; ++i) {
      unsigned char b = code[(unsigned char)s[i]];
      if (b >= 4) { valid = 0; cur = 0; continue; }
      cur = ((cur << 2) | b) & kmask;
      if (++valid >= k) { t.insert(cur, 1); ++nk; }
    }
  }

  void worker(int tid) {
    Table& t = tables[tid];
    int64_t& nk = thread_kmers[tid];
    while (true) {
      Batch batch;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_get.wait(lk, [&] { return !queue.empty() || done; });
        if (queue.empty()) return;
        batch = std::move(queue.front());
        queue.pop_front();
      }
      cv_put.notify_one();
      const char* p = batch.seq.data();
      for (int32_t len : batch.lens) {
        count_seq(t, nk, p, len);
        p += len;
      }
    }
  }
};

constexpr size_t kReadBlock = 8 << 20;
constexpr size_t kBatchBases = 4 << 20;

}  // namespace

extern "C" {

void* bronko_counter_create(int k, int threads) {
  if (threads < 1) threads = 1;
  if (threads > 16) threads = 16;
  return new Counter(k, threads);
}

void bronko_counter_destroy(void* h) { delete static_cast<Counter*>(h); }

// Stream one FASTQ file (gz or plain) through the counter.
// Returns 0 on success, -1 on open failure, -2 on malformed input.
int bronko_counter_count_fastq(void* h, const char* path) {
  auto* c = static_cast<Counter*>(h);
  gzFile gz = gzopen(path, "rb");
  if (!gz) return -1;
  gzbuffer(gz, 1 << 20);

  c->done = false;
  std::vector<std::thread> workers;
  for (int t = 0; t < c->n_threads; ++t)
    workers.emplace_back([c, t] { c->worker(t); });

  std::vector<char> buf;
  size_t pos = 0;
  bool eof = false;
  int rc = 0;
  Batch cur;

  auto flush_batch = [&]() {
    if (cur.lens.empty()) return;
    {
      std::unique_lock<std::mutex> lk(c->mu);
      c->cv_put.wait(lk, [&] { return c->queue.size() < Counter::kMaxQueue; });
      c->queue.push_back(std::move(cur));
    }
    c->cv_get.notify_one();
    cur = Batch();
  };

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
    cur.seq.insert(cur.seq.end(), seq_start, seq_end);
    cur.lens.push_back((int32_t)(seq_end - seq_start));
    ++c->total_reads;
    pos += scanned;
    if (cur.seq.size() >= kBatchBases) flush_batch();
  }
  flush_batch();
  {
    std::lock_guard<std::mutex> lk(c->mu);
    c->done = true;
  }
  c->cv_get.notify_all();
  for (auto& w : workers) w.join();
  gzclose(gz);
  return rc;
}

// Merge per-thread tables; apply ci floor and cs cap. Returns kept count.
// Parallelized by key-range partition: partition p owns keys whose top
// bits equal p, so per-partition sort+merge is independent and the
// concatenation in partition order IS the globally sorted output (the
// device path and oracle tests depend on sorted extraction order).
int64_t bronko_counter_finalize(void* h, uint32_t ci, uint32_t cs) {
  auto* c = static_cast<Counter*>(h);
  if (!c->finalized) {
    const int P = 8;  // power of two; partition id = top 3 USED bits of
    // the 2k-bit k-mer (keys < 2^(2k), so a fixed 64-bit shift would put
    // everything in partition 0)
    const int shift = 2 * c->k - 3;
    struct Part {
      std::vector<uint64_t> keys;
      std::vector<uint32_t> vals;
      int64_t unique = 0;
    };
    std::vector<Part> parts(P);
    std::vector<std::thread> workers;
    for (int p = 0; p < P; ++p) {
      workers.emplace_back([&, p]() {
        std::vector<std::pair<uint64_t, uint32_t>> items;
        for (auto& t : c->tables)
          for (size_t i = 0; i < t.keys.size(); ++i) {
            uint64_t key = t.keys[i];
            if (key != Table::kEmpty && (int)(key >> shift) == p)
              items.emplace_back(key, t.vals[i]);
          }
        std::sort(items.begin(), items.end());
        Part& out = parts[p];
        size_t i = 0;
        while (i < items.size()) {
          uint64_t key = items[i].first;
          uint64_t sum = 0;
          while (i < items.size() && items[i].first == key) { sum += items[i].second; ++i; }
          ++out.unique;
          if (sum >= ci) {
            out.keys.push_back(key);
            out.vals.push_back((uint32_t)std::min<uint64_t>(sum, cs));
          }
        }
      });
    }
    for (auto& w : workers) w.join();
    c->out_keys.clear();
    c->out_vals.clear();
    c->n_unique = 0;
    size_t total = 0;
    for (auto& p : parts) total += p.keys.size();
    c->out_keys.reserve(total);
    c->out_vals.reserve(total);
    for (auto& p : parts) {
      c->n_unique += p.unique;
      c->out_keys.insert(c->out_keys.end(), p.keys.begin(), p.keys.end());
      c->out_vals.insert(c->out_vals.end(), p.vals.begin(), p.vals.end());
    }
    c->finalized = true;
  }
  return (int64_t)c->out_keys.size();
}

// Streaming variant: finalize ONE key-range partition (same partition
// function as the parallel full finalize: top 3 used bits). The caller
// extracts partition p and dispatches device work on it while partition
// p+1 sorts on the host — count->map overlap for single-sample latency.
// Partitions concatenated in order 0..7 equal the full finalize output.
int64_t bronko_counter_finalize_part(void* h, int part, uint32_t ci, uint32_t cs) {
  auto* c = static_cast<Counter*>(h);
  const int shift = 2 * c->k - 3;
  std::vector<std::pair<uint64_t, uint32_t>> items;
  for (auto& t : c->tables)
    for (size_t i = 0; i < t.keys.size(); ++i) {
      uint64_t key = t.keys[i];
      if (key != Table::kEmpty && (int)(key >> shift) == part)
        items.emplace_back(key, t.vals[i]);
    }
  std::sort(items.begin(), items.end());
  c->out_keys.clear();
  c->out_vals.clear();
  size_t i = 0;
  while (i < items.size()) {
    uint64_t key = items[i].first;
    uint64_t sum = 0;
    while (i < items.size() && items[i].first == key) { sum += items[i].second; ++i; }
    ++c->n_unique;  // accumulates across partitions (reset-free single use)
    if (sum >= ci) {
      c->out_keys.push_back(key);
      c->out_vals.push_back((uint32_t)std::min<uint64_t>(sum, cs));
    }
  }
  return (int64_t)c->out_keys.size();
}

int64_t bronko_counter_total_reads(void* h) { return static_cast<Counter*>(h)->total_reads; }

int64_t bronko_counter_total_kmers(void* h) {
  auto* c = static_cast<Counter*>(h);
  int64_t n = 0;
  for (auto v : c->thread_kmers) n += v;
  return n;
}

int64_t bronko_counter_unique(void* h) { return static_cast<Counter*>(h)->n_unique; }

void bronko_counter_extract(void* h, uint64_t* out_kmers, uint32_t* out_counts) {
  auto* c = static_cast<Counter*>(h);
  memcpy(out_kmers, c->out_keys.data(), c->out_keys.size() * sizeof(uint64_t));
  memcpy(out_counts, c->out_vals.data(), c->out_vals.size() * sizeof(uint32_t));
}

}  // extern "C"
