// packloader — io_uring gather/prefetch for packed uint8 image shards.
//
// The reference feeds training through PIL decodes in DataLoader worker
// processes (reference: dataset/all_dataset.py:23-41, num_workers=4 at
// utils/local_training.py:48). fedmlp_tpu packs datasets into dense
// uint8 arrays; when the array exceeds device HBM the host must gather
// random batches out of a file each step.
//
// Read engine (measured on the target host, 147 KB rows, 26 GB shard):
//   mmap faults (old path)            1.5 MB/s   (single-core sandbox
//   pread per row                      16 MB/s     with ~100% system-time
//   O_DIRECT pread per row             89 MB/s     syscall overhead)
//   io_uring QD=64 O_DIRECT         2,056 MB/s
// io_uring amortizes the syscall tax: one io_uring_enter submits/reaps a
// whole queue of reads. Rows land in per-slot aligned bounce buffers and
// are memcpy'd into the caller's output (warm-buffer copy ~4.9 GB/s).
// Fallback ladder: io_uring+O_DIRECT -> buffered pread -> mmap.
//
// C ABI (ctypes):
//   pl_open(path, row_bytes, n_rows, header) -> handle
//   pl_close(handle)
//   pl_gather(handle, idx*, n, out*, n_threads)     (synchronous gather)
//   pl_submit(handle, idx*, n, n_threads)           (async into internal buf)
//   pl_wait(handle, out*)                           (wait + copy out)
//
// Build: g++ -O3 -shared -fPIC -pthread -o libpackloader.so packloader.cpp

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <linux/io_uring.h>
#include <mutex>
#include <sys/mman.h>
#include <sys/stat.h>
#include <sys/syscall.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

constexpr size_t kAlign = 4096;
constexpr unsigned kQD = 64;

// ---------------------------------------------------------------- io_uring
// Raw-syscall ring (no liburing in this image). Single submitter under the
// owner's lock; used only from one thread at a time.
struct Ring {
  int fd = -1;
  unsigned* sq_head = nullptr;
  unsigned* sq_tail = nullptr;
  unsigned* sq_mask = nullptr;
  unsigned* sq_array = nullptr;
  unsigned* cq_head = nullptr;
  unsigned* cq_tail = nullptr;
  unsigned* cq_mask = nullptr;
  io_uring_sqe* sqes = nullptr;
  io_uring_cqe* cqes = nullptr;
  void* sq_map = nullptr;
  void* cq_map = nullptr;
  size_t sq_len = 0, cq_len = 0, sqe_len = 0;

  bool init(unsigned entries) {
    io_uring_params p;
    std::memset(&p, 0, sizeof p);
    fd = int(syscall(__NR_io_uring_setup, entries, &p));
    if (fd < 0) return false;
    sq_len = p.sq_off.array + p.sq_entries * sizeof(unsigned);
    cq_len = p.cq_off.cqes + p.cq_entries * sizeof(io_uring_cqe);
    sqe_len = p.sq_entries * sizeof(io_uring_sqe);
    sq_map = mmap(nullptr, sq_len, PROT_READ | PROT_WRITE,
                  MAP_SHARED | MAP_POPULATE, fd, IORING_OFF_SQ_RING);
    cq_map = mmap(nullptr, cq_len, PROT_READ | PROT_WRITE,
                  MAP_SHARED | MAP_POPULATE, fd, IORING_OFF_CQ_RING);
    sqes = static_cast<io_uring_sqe*>(
        mmap(nullptr, sqe_len, PROT_READ | PROT_WRITE,
             MAP_SHARED | MAP_POPULATE, fd, IORING_OFF_SQES));
    if (sq_map == MAP_FAILED || cq_map == MAP_FAILED ||
        sqes == MAP_FAILED) {
      destroy();
      return false;
    }
    auto* sq = static_cast<char*>(sq_map);
    auto* cq = static_cast<char*>(cq_map);
    sq_head = reinterpret_cast<unsigned*>(sq + p.sq_off.head);
    sq_tail = reinterpret_cast<unsigned*>(sq + p.sq_off.tail);
    sq_mask = reinterpret_cast<unsigned*>(sq + p.sq_off.ring_mask);
    sq_array = reinterpret_cast<unsigned*>(sq + p.sq_off.array);
    cq_head = reinterpret_cast<unsigned*>(cq + p.cq_off.head);
    cq_tail = reinterpret_cast<unsigned*>(cq + p.cq_off.tail);
    cq_mask = reinterpret_cast<unsigned*>(cq + p.cq_off.ring_mask);
    cqes = reinterpret_cast<io_uring_cqe*>(cq + p.cq_off.cqes);
    return true;
  }

  void destroy() {
    if (sq_map && sq_map != MAP_FAILED) munmap(sq_map, sq_len);
    if (cq_map && cq_map != MAP_FAILED) munmap(cq_map, cq_len);
    if (sqes && sqes != reinterpret_cast<io_uring_sqe*>(MAP_FAILED))
      munmap(sqes, sqe_len);
    if (fd >= 0) ::close(fd);
    sq_map = cq_map = nullptr;
    sqes = nullptr;
    fd = -1;
  }
};

struct Dataset {
  size_t row_bytes = 0;
  int64_t n_rows = 0;
  size_t header = 0;
  int fd_direct = -1;   // O_DIRECT fd for the ring
  int fd_buffered = -1; // plain fd for pread fallback / short-read repair
  size_t span = 0;      // aligned byte span covering one row

  // io_uring engine (guarded by ring_mu; only one gather at a time)
  Ring ring;
  bool ring_ok = false;
  uint8_t* bounce = nullptr; // kQD aligned slots of `span` bytes
  std::mutex ring_mu;

  // mmap fallback
  const uint8_t* base = nullptr;
  size_t map_len = 0;
  void* map = nullptr;

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

// Buffered-pread repair path for one row (always correct, never fast).
bool pread_row(const Dataset* ds, int64_t row, uint8_t* dst) {
  size_t off = ds->header + size_t(row) * ds->row_bytes;
  size_t got = 0;
  while (got < ds->row_bytes) {
    ssize_t r = ::pread(ds->fd_buffered, dst + got, ds->row_bytes - got,
                        off + got);
    if (r <= 0) return false;
    got += size_t(r);
  }
  return true;
}

// Gather `n` rows through the ring: QD reads in flight, each into its own
// bounce slot, memcpy'd to the output as completions drain. Completions
// are out of order; user_data carries (slot | dest_index).
int gather_uring(Dataset* ds, const int64_t* idx, int64_t n, uint8_t* out) {
  std::lock_guard<std::mutex> lk(ds->ring_mu);
  Ring& r = ds->ring;
  int64_t submitted = 0, done = 0;
  unsigned inflight = 0;
  int64_t slot_dest[kQD];   // dest row index occupying each slot
  unsigned free_slots[kQD];
  unsigned n_free = kQD;
  for (unsigned i = 0; i < kQD; ++i) free_slots[i] = i;

  unsigned tail = __atomic_load_n(r.sq_tail, __ATOMIC_RELAXED);
  while (done < n) {
    while (n_free > 0 && submitted < n) {
      unsigned slot = free_slots[--n_free];
      int64_t row = idx[submitted];
      size_t off = ds->header + size_t(row) * ds->row_bytes;
      size_t a0 = off / kAlign * kAlign;
      size_t a1 = (off + ds->row_bytes + kAlign - 1) / kAlign * kAlign;
      unsigned sqi = tail & *r.sq_mask;
      io_uring_sqe* sqe = &r.sqes[sqi];
      std::memset(sqe, 0, sizeof *sqe);
      sqe->opcode = IORING_OP_READ;
      sqe->fd = ds->fd_direct;
      sqe->addr = reinterpret_cast<uint64_t>(ds->bounce + size_t(slot) * ds->span);
      sqe->len = unsigned(a1 - a0);
      sqe->off = a0;
      sqe->user_data = (uint64_t(slot) << 48) | uint64_t(submitted);
      r.sq_array[sqi] = sqi;
      ++tail;
      slot_dest[slot] = submitted;
      ++submitted;
      ++inflight;
    }
    __atomic_store_n(r.sq_tail, tail, __ATOMIC_RELEASE);
    unsigned to_submit = tail - __atomic_load_n(r.sq_head, __ATOMIC_ACQUIRE);
    int ret = int(syscall(__NR_io_uring_enter, r.fd, to_submit, 1u,
                          IORING_ENTER_GETEVENTS, nullptr, 0));
    if (ret < 0) return -3;
    unsigned chead = __atomic_load_n(r.cq_head, __ATOMIC_ACQUIRE);
    unsigned ctail = __atomic_load_n(r.cq_tail, __ATOMIC_ACQUIRE);
    while (chead != ctail) {
      io_uring_cqe* cqe = &r.cqes[chead & *r.cq_mask];
      unsigned slot = unsigned(cqe->user_data >> 48);
      int64_t dest = int64_t(cqe->user_data & 0xffffffffffffULL);
      int64_t row = idx[dest];
      size_t off = ds->header + size_t(row) * ds->row_bytes;
      size_t a0 = off / kAlign * kAlign;
      size_t need = (off - a0) + ds->row_bytes;
      uint8_t* dst = out + size_t(dest) * ds->row_bytes;
      if (cqe->res >= 0 && size_t(cqe->res) >= need) {
        std::memcpy(dst, ds->bounce + size_t(slot) * ds->span + (off - a0),
                    ds->row_bytes);
      } else if (!pread_row(ds, row, dst)) {
        return -4; // short read the buffered path couldn't repair either
      }
      (void)slot_dest;
      free_slots[n_free++] = slot;
      ++chead;
      ++done;
      --inflight;
    }
    __atomic_store_n(r.cq_head, chead, __ATOMIC_RELEASE);
  }
  (void)inflight;
  return 0;
}

void gather_range(const Dataset* ds, const int64_t* idx, int64_t lo,
                  int64_t hi, uint8_t* out) {
  const size_t rb = ds->row_bytes;
  if (ds->base != nullptr) {
    for (int64_t i = lo; i < hi; ++i)
      std::memcpy(out + size_t(i) * rb,
                  ds->base + size_t(idx[i]) * rb, rb);
  } else {
    for (int64_t i = lo; i < hi; ++i)
      pread_row(ds, idx[i], out + size_t(i) * rb);
  }
}

void gather_mt(Dataset* ds, const int64_t* idx, int64_t n, uint8_t* out,
               int n_threads) {
  if (ds->ring_ok) {
    if (gather_uring(ds, idx, n, out) == 0) return;
    // ring failed mid-flight (e.g. seccomp change): disable and fall back
    ds->ring_ok = false;
  }
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
  int fdb = ::open(path, O_RDONLY);
  if (fdb < 0) return nullptr;
  struct stat st;
  if (fstat(fdb, &st) != 0) {
    ::close(fdb);
    return nullptr;
  }
  size_t need = header_bytes + size_t(row_bytes) * size_t(n_rows);
  if (size_t(st.st_size) < need) {
    ::close(fdb);
    return nullptr;
  }
  auto* ds = new Dataset();
  ds->row_bytes = row_bytes;
  ds->n_rows = n_rows;
  ds->header = header_bytes;
  ds->fd_buffered = fdb;
  ds->span = (row_bytes / kAlign + 2) * kAlign;

  ds->fd_direct = ::open(path, O_RDONLY | O_DIRECT);
  if (ds->fd_direct >= 0 && ds->ring.init(kQD)) {
    void* b = nullptr;
    if (posix_memalign(&b, kAlign, ds->span * kQD) == 0) {
      ds->bounce = static_cast<uint8_t*>(b);
      ds->ring_ok = true;
    }
  }
  if (!ds->ring_ok) {
    // mmap fallback (the only option when io_uring/O_DIRECT are blocked)
    if (ds->fd_direct >= 0) { ::close(ds->fd_direct); ds->fd_direct = -1; }
    ds->ring.destroy();
    void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fdb, 0);
    if (map == MAP_FAILED) {
      ::close(fdb);
      delete ds;
      return nullptr;
    }
    madvise(map, st.st_size, MADV_RANDOM);
    ds->map = map;
    ds->map_len = st.st_size;
    ds->base = static_cast<const uint8_t*>(map) + header_bytes;
  }
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
  if (ds->map) munmap(ds->map, ds->map_len);
  ds->ring.destroy();
  std::free(ds->bounce);
  if (ds->fd_direct >= 0) ::close(ds->fd_direct);
  ::close(ds->fd_buffered);
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
