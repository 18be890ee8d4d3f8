// packloader — threaded gather/prefetch for packed uint8 image shards.
//
// The reference feeds training through PIL decodes in DataLoader worker
// processes (reference: dataset/all_dataset.py:23-41, num_workers=4 at
// utils/local_training.py:48). fedmlp_tpu packs datasets into dense
// uint8 arrays; when the array exceeds device HBM the host must gather
// random batches out of a memory-mapped file each step. numpy fancy
// indexing is single-threaded and synchronous; this loader does the
// gather with a thread pool and double-buffered async prefetch so the
// copy overlaps device compute.
//
// C ABI (ctypes):
//   pl_open(path, row_bytes, n_rows) -> handle      (mmap, read-only)
//   pl_close(handle)
//   pl_gather(handle, idx*, n, out*, n_threads)     (synchronous gather)
//   pl_submit(handle, idx*, n, n_threads)           (async into internal buf)
//   pl_wait(handle, out*)                           (wait + copy out)
//
// Build: g++ -O3 -shared -fPIC -pthread -o libpackloader.so packloader.cpp

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Dataset {
  const uint8_t* base = nullptr;
  size_t map_len = 0;
  size_t row_bytes = 0;
  int64_t n_rows = 0;
  int fd = -1;

  // async prefetch state
  std::vector<uint8_t> staging;
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;
  bool job_ready = false;
  bool job_done = true;
  std::vector<int64_t> job_idx;
  int job_threads = 4;
  std::atomic<bool> stop{false};
};

void gather_range(const Dataset* ds, const int64_t* idx, int64_t lo,
                  int64_t hi, uint8_t* out) {
  const size_t rb = ds->row_bytes;
  for (int64_t i = lo; i < hi; ++i) {
    const int64_t row = idx[i];
    std::memcpy(out + size_t(i) * rb, ds->base + size_t(row) * rb, rb);
  }
}

void gather_mt(const Dataset* ds, const int64_t* idx, int64_t n, uint8_t* out,
               int n_threads) {
  if (n_threads <= 1 || n < 2 * n_threads) {
    gather_range(ds, idx, 0, n, out);
    return;
  }
  std::vector<std::thread> ts;
  int64_t per = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * per;
    int64_t hi = std::min<int64_t>(n, lo + per);
    if (lo >= hi) break;
    ts.emplace_back(gather_range, ds, idx, lo, hi, out);
  }
  for (auto& t : ts) t.join();
}

void worker_loop(Dataset* ds) {
  for (;;) {
    std::unique_lock<std::mutex> lk(ds->mu);
    ds->cv.wait(lk, [&] { return ds->job_ready || ds->stop.load(); });
    if (ds->stop.load()) return;
    ds->job_ready = false;
    std::vector<int64_t> idx = std::move(ds->job_idx);
    int nt = ds->job_threads;
    lk.unlock();

    ds->staging.resize(idx.size() * ds->row_bytes);
    gather_mt(ds, idx.data(), int64_t(idx.size()), ds->staging.data(), nt);

    lk.lock();
    ds->job_done = true;
    ds->cv.notify_all();
  }
}

}  // namespace

extern "C" {

void* pl_open(const char* path, uint64_t row_bytes, int64_t n_rows,
              uint64_t header_bytes) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  size_t need = header_bytes + size_t(row_bytes) * size_t(n_rows);
  if (size_t(st.st_size) < need) {
    ::close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  madvise(map, st.st_size, MADV_RANDOM);
  auto* ds = new Dataset();
  ds->base = static_cast<const uint8_t*>(map) + header_bytes;
  ds->map_len = st.st_size;
  ds->row_bytes = row_bytes;
  ds->n_rows = n_rows;
  ds->fd = fd;
  ds->worker = std::thread(worker_loop, ds);
  return ds;
}

void pl_close(void* handle) {
  auto* ds = static_cast<Dataset*>(handle);
  if (!ds) return;
  {
    std::lock_guard<std::mutex> lk(ds->mu);
    ds->stop.store(true);
    ds->cv.notify_all();
  }
  ds->worker.join();
  munmap(const_cast<uint8_t*>(ds->base) -
             (ds->map_len - size_t(ds->row_bytes) * size_t(ds->n_rows)),
         ds->map_len);
  ::close(ds->fd);
  delete ds;
}

int pl_gather(void* handle, const int64_t* idx, int64_t n, uint8_t* out,
              int n_threads) {
  auto* ds = static_cast<Dataset*>(handle);
  for (int64_t i = 0; i < n; ++i)
    if (idx[i] < 0 || idx[i] >= ds->n_rows) return -1;
  gather_mt(ds, idx, n, out, n_threads);
  return 0;
}

int pl_submit(void* handle, const int64_t* idx, int64_t n, int n_threads) {
  auto* ds = static_cast<Dataset*>(handle);
  for (int64_t i = 0; i < n; ++i)
    if (idx[i] < 0 || idx[i] >= ds->n_rows) return -1;
  std::lock_guard<std::mutex> lk(ds->mu);
  if (!ds->job_done) return -2;  // previous job still running
  ds->job_idx.assign(idx, idx + n);
  ds->job_threads = n_threads;
  ds->job_ready = true;
  ds->job_done = false;
  ds->cv.notify_all();
  return 0;
}

int64_t pl_wait(void* handle, uint8_t* out) {
  auto* ds = static_cast<Dataset*>(handle);
  std::unique_lock<std::mutex> lk(ds->mu);
  ds->cv.wait(lk, [&] { return ds->job_done; });
  std::memcpy(out, ds->staging.data(), ds->staging.size());
  return int64_t(ds->staging.size());
}

}  // extern "C"
