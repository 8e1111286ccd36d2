// Memory-mapped windowed dataset gather — the host-side data-loader core.
//
// Role equivalent of the reference's FFCV cache + Loader
// (ssar/supervised/data.py:262-368): preprocessed per-track arrays live on
// disk; training consumes shuffled overlapping windows.  The numpy fallback
// materialises every window in RAM; this loader mmaps the raw float32 array
// and gathers requested windows into a caller-provided batch buffer with a
// small thread pool, so corpora far larger than RAM stream at memcpy speed.
//
// Layout contract: a raw little-endian float32 array of shape (rows, cols),
// row-major (exactly numpy .npy data after the header; the Python wrapper
// passes the header offset).
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Mapped {
    int fd = -1;
    void* base = nullptr;
    size_t bytes = 0;
    const float* data = nullptr;  // after header offset
    int64_t rows = 0;
    int64_t cols = 0;
};

}  // namespace

extern "C" {

// Open a file containing (rows, cols) float32 at byte `offset`.  Returns an
// opaque handle (heap pointer) or 0 on failure.
void* wl_open(const char* path, int64_t rows, int64_t cols, int64_t offset) {
    int fd = ::open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    struct stat st;
    if (fstat(fd, &st) != 0) { ::close(fd); return nullptr; }
    size_t need = static_cast<size_t>(offset) + sizeof(float) * rows * cols;
    if (static_cast<size_t>(st.st_size) < need) { ::close(fd); return nullptr; }
    void* base = mmap(nullptr, need, PROT_READ, MAP_PRIVATE, fd, 0);
    if (base == MAP_FAILED) { ::close(fd); return nullptr; }
    madvise(base, need, MADV_WILLNEED);
    auto* m = new Mapped;
    m->fd = fd;
    m->base = base;
    m->bytes = need;
    m->data = reinterpret_cast<const float*>(static_cast<const char*>(base) + offset);
    m->rows = rows;
    m->cols = cols;
    return m;
}

void wl_close(void* handle) {
    auto* m = static_cast<Mapped*>(handle);
    if (!m) return;
    munmap(m->base, m->bytes);
    ::close(m->fd);
    delete m;
}

// Gather n windows of `window` rows each, starting at starts[i], into
// out (n, window, cols).  Rows are contiguous, so each window is one
// memcpy; batches are split across a small thread pool.
// Returns 0 on success, -1 on out-of-range start.
int wl_gather(void* handle, const int64_t* starts, int64_t n, int64_t window,
              float* out, int n_threads) {
    auto* m = static_cast<Mapped*>(handle);
    const int64_t cols = m->cols;
    for (int64_t i = 0; i < n; ++i)
        if (starts[i] < 0 || starts[i] + window > m->rows) return -1;

    const size_t win_bytes = sizeof(float) * window * cols;
    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i)
            std::memcpy(out + i * window * cols, m->data + starts[i] * cols, win_bytes);
    };
    if (n_threads <= 1 || n < 4) {
        work(0, n);
        return 0;
    }
    int nt = n_threads < 8 ? n_threads : 8;
    std::vector<std::thread> threads;
    int64_t chunk = (n + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int64_t lo = t * chunk, hi = lo + chunk < n ? lo + chunk : n;
        if (lo >= hi) break;
        threads.emplace_back(work, lo, hi);
    }
    for (auto& th : threads) th.join();
    return 0;
}

int64_t wl_rows(void* handle) { return static_cast<Mapped*>(handle)->rows; }
int64_t wl_cols(void* handle) { return static_cast<Mapped*>(handle)->cols; }

}  // extern "C"
