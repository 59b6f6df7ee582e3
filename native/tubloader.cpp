// tubloader — native data loader for the TUB (tpu-unsup-binary) shard
// format (SURVEY.md §2 "Dataset": the host-side data path is the one
// component where the runtime benefits from native code; the TPU compute
// path is jax/XLA/Pallas).
//
// Design: the dataset is one mmap'd flat file of fixed-size records, so
// "loading" a model is pointer arithmetic — no zip/npy parsing, no
// syscalls per sample, and the page cache is the only copy of the raw
// bytes. Batch assembly (uint8 -> float32 image normalization, 0/1 mask
// expansion, gather by index) runs across a persistent thread pool and
// writes straight into caller-provided (numpy) buffers, overlapping with
// device compute via the Python-side prefetch queue.
//
// File layout (little-endian):
//   header: magic "TUPC" | u32 version | u32 M | u32 V | u32 H | u32 W
//   record m (fixed size):
//     v1: f32 azimuth[V] | f32 elevation[V] | u8 mask[V*H*W]
//         | u8 image[V*H*W*3]
//     v2: f32 azimuth[V] | f32 elevation[V] | f32 distance[V]
//         | u8 mask[V*H*W] | u8 image[V*H*W*3]
// v2 adds the per-view camera distance so the native loader can serve the
// jittered-distance configs (synth_dist_jitter / predict_translation);
// v1 files stay readable (no distance field).
//
// C ABI (ctypes-friendly), see tpu_unsup_pc/data/native_loader.py.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <functional>
#include <mutex>
#include <queue>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Header {
  char magic[4];
  uint32_t version;
  uint32_t m, v, h, w;
};

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false), pending_(0) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { Run(); });
  }
  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void Submit(std::function<void()> fn) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      jobs_.push(std::move(fn));
      ++pending_;
    }
    cv_.notify_one();
  }
  void Wait() {
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return pending_ == 0; });
  }

 private:
  void Run() {
    for (;;) {
      std::function<void()> job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
        if (stop_ && jobs_.empty()) return;
        job = std::move(jobs_.front());
        jobs_.pop();
      }
      job();
      {
        std::unique_lock<std::mutex> lk(mu_);
        if (--pending_ == 0) done_cv_.notify_all();
      }
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  bool stop_;
  int pending_;
};

struct Loader {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  Header hdr{};
  size_t record_size = 0;
  const uint8_t* records = nullptr;
  ThreadPool* pool = nullptr;
};

inline const uint8_t* record_ptr(const Loader* L, int64_t m) {
  return L->records + static_cast<size_t>(m) * L->record_size;
}

}  // namespace

extern "C" {

// Returns nullptr on any failure (missing file, bad magic, short file).
void* tub_open(const char* path, int n_threads) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < (off_t)sizeof(Header)) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* L = new Loader;
  L->fd = fd;
  L->base = static_cast<const uint8_t*>(base);
  L->size = st.st_size;
  std::memcpy(&L->hdr, base, sizeof(Header));
  if (std::memcmp(L->hdr.magic, "TUPC", 4) != 0 ||
      (L->hdr.version != 1 && L->hdr.version != 2)) {
    munmap(base, st.st_size);
    ::close(fd);
    delete L;
    return nullptr;
  }
  const size_t vhw = (size_t)L->hdr.v * L->hdr.h * L->hdr.w;
  const size_t scalars = L->hdr.version >= 2 ? 3 : 2;  // az, el[, dist]
  L->record_size = (size_t)L->hdr.v * 4 * scalars + vhw + vhw * 3;
  L->records = L->base + sizeof(Header);
  if (sizeof(Header) + L->record_size * L->hdr.m > L->size) {
    munmap(base, st.st_size);
    ::close(fd);
    delete L;
    return nullptr;
  }
  L->pool = new ThreadPool(n_threads > 0 ? n_threads : 4);
  // advise the kernel we'll fault pages in random batch order
  madvise(base, st.st_size, MADV_RANDOM);
  return L;
}

void tub_close(void* h) {
  auto* L = static_cast<Loader*>(h);
  if (!L) return;
  delete L->pool;
  munmap(const_cast<uint8_t*>(L->base), L->size);
  ::close(L->fd);
  delete L;
}

int64_t tub_num_models(void* h) {
  return static_cast<Loader*>(h)->hdr.m;
}

void tub_dims(void* h, int64_t* v, int64_t* hh, int64_t* w) {
  auto* L = static_cast<Loader*>(h);
  *v = L->hdr.v;
  *hh = L->hdr.h;
  *w = L->hdr.w;
}

// 1 when the file carries a per-view camera-distance field (version >= 2).
int64_t tub_has_distance(void* h) {
  return static_cast<Loader*>(h)->hdr.version >= 2 ? 1 : 0;
}

// Gather batch `idx[0..B)` into caller buffers:
//   img  f32[B, V, H, W, 3]  (uint8/255)
//   mask f32[B, V, H, W]     (0.0/1.0)
//   az, el f32[B, V]
//   dist f32[B, V] or nullptr — filled only for version>=2 files
// One pool task per batch element; returns after all elements are written.
// Returns the (0-based) position of the first out-of-range index, or -1 on
// success — indices are validated against hdr.m BEFORE any task is
// submitted, so a bad index can never read past the mmap.
int64_t tub_fill_batch(void* h, const int64_t* idx, int64_t B, float* img,
                       float* mask, float* az, float* el, float* dist) {
  auto* L = static_cast<Loader*>(h);
  const size_t V = L->hdr.v, vhw = (size_t)L->hdr.v * L->hdr.h * L->hdr.w;
  const bool has_dist = L->hdr.version >= 2;
  const size_t scalar_bytes = V * 4 * (has_dist ? 3 : 2);
  for (int64_t b = 0; b < B; ++b)
    if (idx[b] < 0 || idx[b] >= (int64_t)L->hdr.m) return b;
  for (int64_t b = 0; b < B; ++b) {
    const int64_t m = idx[b];
    L->pool->Submit([=] {
      const uint8_t* rec = record_ptr(L, m);
      const float* f = reinterpret_cast<const float*>(rec);
      std::memcpy(az + b * V, f, V * sizeof(float));
      std::memcpy(el + b * V, f + V, V * sizeof(float));
      if (has_dist && dist != nullptr)
        std::memcpy(dist + b * V, f + 2 * V, V * sizeof(float));
      const uint8_t* mk = rec + scalar_bytes;
      const uint8_t* im = mk + vhw;
      float* mask_out = mask + b * vhw;
      for (size_t i = 0; i < vhw; ++i) mask_out[i] = mk[i] ? 1.0f : 0.0f;
      float* img_out = img + b * vhw * 3;
      constexpr float kInv = 1.0f / 255.0f;
      for (size_t i = 0; i < vhw * 3; ++i) img_out[i] = im[i] * kInv;
    });
  }
  L->pool->Wait();
  return -1;
}

}  // extern "C"
