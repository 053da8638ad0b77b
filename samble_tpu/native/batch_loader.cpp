// Native batch producer: shuffling + per-cloud point subsampling off the
// Python thread, double-buffered ahead of the accelerator step.
//
// The reference delegates this to torch DataLoader worker *processes*
// (train_modelnet.py:208-229).  On this framework's single-host TPU runtime
// the datasets are RAM-resident arrays, so the loader is a single C++
// producer thread over borrowed numpy buffers: per epoch it draws a
// shuffled sample order and, per cloud, an n_sel-of-N0 subset without
// replacement (partial Fisher-Yates — the semantics of
// numpy.random.choice(replace=False) in data/pipeline.py), filling a
// bounded ring of preallocated batch buffers.  Python pops batches via
// ctypes (samble_tpu/native/__init__.py) and falls back to the numpy
// BatchLoader when this library is unavailable.
//
// Build: g++ -O3 -shared -fPIC -pthread (no external dependencies).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// SplitMix64 — deterministic, seedable, fast; independent of libc rand.
struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(seed) {}
  uint64_t next() {
    uint64_t z = (state += 0x9e3779b97f4a7c15ull);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
    return z ^ (z >> 31);
  }
  // unbiased bounded draw (Lemire)
  uint64_t below(uint64_t n) {
    uint64_t x = next();
    __uint128_t m = (__uint128_t)x * n;
    uint64_t l = (uint64_t)m;
    if (l < n) {
      uint64_t t = -n % n;
      while (l < t) {
        x = next();
        m = (__uint128_t)x * n;
        l = (uint64_t)m;
      }
    }
    return (uint64_t)(m >> 64);
  }
};

struct Batch {
  std::vector<float> points;     // (bs, n_sel, C)
  std::vector<int32_t> label;    // (bs,)
  std::vector<int32_t> seg;      // (bs, n_sel) when seg data present
  std::vector<uint8_t> valid;    // (bs,)
};

struct Loader {
  const float* pcd;     // (S, N0, C) borrowed
  const int32_t* label; // (S,)
  const int32_t* seg;   // (S, N0) or nullptr
  int64_t S, N0, C, bs, n_sel;
  bool shuffle, drop_last;
  uint64_t seed;
  int64_t epoch = 0;

  int queue_depth;
  std::thread producer;
  std::mutex mu;
  std::condition_variable cv_pop, cv_push;
  std::queue<Batch> ready;
  bool epoch_done = false;   // producer finished pushing this epoch
  std::atomic<bool> stop{false};

  // scratch reused across batches by the producer
  std::vector<int64_t> order;
  std::vector<int32_t> perm;

  int64_t num_batches() const {
    return drop_last ? S / bs : (S + bs - 1) / bs;
  }

  void fill_batch(Rng& rng, int64_t b, Batch& out) {
    out.points.resize((size_t)bs * n_sel * C);
    out.label.resize(bs);
    out.valid.resize(bs);
    if (seg) out.seg.resize((size_t)bs * n_sel);

    for (int64_t i = 0; i < bs; ++i) {
      int64_t pos = b * bs + i;
      bool ok = pos < S;
      int64_t s = ok ? order[pos] : order[S - 1];  // pad tail with the last
      out.valid[i] = ok ? 1 : 0;
      out.label[i] = label[s];

      const float* src = pcd + (size_t)s * N0 * C;
      const int32_t* seg_src = seg ? seg + (size_t)s * N0 : nullptr;
      float* dst = out.points.data() + (size_t)i * n_sel * C;
      int32_t* seg_dst = seg ? out.seg.data() + (size_t)i * n_sel : nullptr;

      if (n_sel >= N0) {
        std::memcpy(dst, src, sizeof(float) * N0 * C);
        if (seg_src) std::memcpy(seg_dst, seg_src, sizeof(int32_t) * N0);
      } else {
        // partial Fisher–Yates: first n_sel entries of a shuffled 0..N0-1
        for (int64_t j = 0; j < N0; ++j) perm[j] = (int32_t)j;
        for (int64_t j = 0; j < n_sel; ++j) {
          int64_t r = j + (int64_t)rng.below((uint64_t)(N0 - j));
          std::swap(perm[j], perm[r]);
          int32_t p = perm[j];
          std::memcpy(dst + j * C, src + (size_t)p * C, sizeof(float) * C);
          if (seg_src) seg_dst[j] = seg_src[p];
        }
      }
    }
  }

  void produce_epoch() {
    Rng rng(seed * 0x9e3779b97f4a7c15ull + (uint64_t)epoch + 1);
    order.resize(S);
    perm.resize(N0);
    for (int64_t i = 0; i < S; ++i) order[i] = i;
    if (shuffle) {
      for (int64_t i = S - 1; i > 0; --i) {
        int64_t j = (int64_t)rng.below((uint64_t)(i + 1));
        std::swap(order[i], order[j]);
      }
    }
    int64_t nb = num_batches();
    for (int64_t b = 0; b < nb && !stop.load(); ++b) {
      Batch out;
      fill_batch(rng, b, out);
      std::unique_lock<std::mutex> lk(mu);
      cv_push.wait(lk, [&] {
        return stop.load() || (int)ready.size() < queue_depth;
      });
      if (stop.load()) return;
      ready.push(std::move(out));
      cv_pop.notify_one();
    }
    std::unique_lock<std::mutex> lk(mu);
    epoch_done = true;
    cv_pop.notify_all();
  }
};

}  // namespace

extern "C" {

void* samble_loader_create(const float* pcd, const int32_t* label,
                           const int32_t* seg, int64_t S, int64_t N0,
                           int64_t C, int64_t bs, int64_t n_sel, int shuffle,
                           int drop_last, uint64_t seed, int queue_depth) {
  auto* l = new Loader();
  l->pcd = pcd;
  l->label = label;
  l->seg = seg;
  l->S = S;
  l->N0 = N0;
  l->C = C;
  l->bs = bs;
  l->n_sel = n_sel < N0 ? n_sel : N0;
  l->shuffle = shuffle != 0;
  l->drop_last = drop_last != 0;
  l->seed = seed;
  l->queue_depth = queue_depth < 1 ? 2 : queue_depth;
  return l;
}

int64_t samble_loader_num_batches(void* h) {
  return static_cast<Loader*>(h)->num_batches();
}

void samble_loader_start_epoch(void* h) {
  auto* l = static_cast<Loader*>(h);
  if (l->producer.joinable()) l->producer.join();
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->epoch_done = false;
    std::queue<Batch>().swap(l->ready);
  }
  l->epoch += 1;
  l->producer = std::thread([l] { l->produce_epoch(); });
}

// returns 1 when a batch was written, 0 at epoch end
int samble_loader_next(void* h, float* points_out, int32_t* label_out,
                       int32_t* seg_out, uint8_t* valid_out) {
  auto* l = static_cast<Loader*>(h);
  Batch out;
  {
    std::unique_lock<std::mutex> lk(l->mu);
    l->cv_pop.wait(lk, [&] { return !l->ready.empty() || l->epoch_done; });
    if (l->ready.empty()) return 0;
    out = std::move(l->ready.front());
    l->ready.pop();
    l->cv_push.notify_one();
  }
  std::memcpy(points_out, out.points.data(),
              out.points.size() * sizeof(float));
  std::memcpy(label_out, out.label.data(), out.label.size() * sizeof(int32_t));
  if (seg_out && !out.seg.empty())
    std::memcpy(seg_out, out.seg.data(), out.seg.size() * sizeof(int32_t));
  std::memcpy(valid_out, out.valid.data(), out.valid.size());
  return 1;
}

void samble_loader_destroy(void* h) {
  auto* l = static_cast<Loader*>(h);
  l->stop.store(true);
  l->cv_push.notify_all();
  l->cv_pop.notify_all();
  if (l->producer.joinable()) l->producer.join();
  delete l;
}

}  // extern "C"
