// FTRJ native loader: mmap + threaded padded-gather into contiguous banks.
//
// Host-side data runtime for the TPU framework (the counterpart of the
// reference's h5py/Reverb C IO path, flybody/tasks/trajectory_loaders.py).
// The hot host operation when a training job starts is turning a packed
// trajectory dataset into device-uploadable padded banks of shape
// (n_traj, t_max, width), padding short trajectories with their final
// frame. This does that with one mmap, a worker pool of memcpys, and no
// intermediate allocations; exported with a plain C ABI for ctypes.
//
// Build: see build.py (g++ -O3 -shared -fPIC -pthread).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x4a525446;  // 'FTRJ' little-endian
constexpr uint32_t kVersion = 1;

struct Field {
  std::string name;
  int64_t width;                 // per-frame flat element count
  std::vector<int64_t> offsets;  // byte offset per trajectory
};

struct Dataset {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  uint32_t n_traj = 0;
  uint32_t dtype_id = 0;  // 0 = f32, 1 = f64
  size_t itemsize = 4;
  std::vector<int64_t> lengths;
  std::vector<Field> fields;
  std::string json_meta;
};

int FieldIndex(const Dataset* ds, const char* name) {
  for (size_t i = 0; i < ds->fields.size(); ++i) {
    if (ds->fields[i].name == name) return static_cast<int>(i);
  }
  return -1;
}

// Parallel-for over trajectories with a small worker pool.
template <typename Fn>
void ParallelFor(int64_t n, int n_threads, Fn fn) {
  if (n_threads <= 1 || n <= 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  auto worker = [&] {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n) return;
      fn(i);
    }
  };
  std::vector<std::thread> pool;
  int nt = std::min<int64_t>(n_threads, n);
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Opens the dataset; returns an opaque handle (nullptr on failure).
void* ftrj_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 32) {
    ::close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* ds = new Dataset;
  ds->fd = fd;
  ds->base = static_cast<const uint8_t*>(map);
  ds->size = st.st_size;

  const uint8_t* p = ds->base;
  uint32_t magic, version, n_traj, n_field, dtype_id;
  memcpy(&magic, p, 4);
  memcpy(&version, p + 4, 4);
  memcpy(&n_traj, p + 8, 4);
  memcpy(&n_field, p + 12, 4);
  memcpy(&dtype_id, p + 16, 4);
  if (magic != kMagic || version != kVersion || dtype_id > 1) {
    munmap(map, st.st_size);
    ::close(fd);
    delete ds;
    return nullptr;
  }
  ds->n_traj = n_traj;
  ds->dtype_id = dtype_id;
  ds->itemsize = dtype_id == 0 ? 4 : 8;
  // Validate the declared header extent against the mapped size before
  // dereferencing anything: a truncated/corrupt file must fail cleanly,
  // not read out of bounds of the mmap.
  uint64_t header_bytes = 32ull + 8ull * n_traj + 40ull * n_field +
                          8ull * n_traj * n_field + 8ull;
  if (n_traj == 0 || n_field == 0 || n_traj > (1u << 24) ||
      n_field > (1u << 16) ||
      header_bytes > static_cast<uint64_t>(st.st_size)) {
    munmap(map, st.st_size);
    ::close(fd);
    delete ds;
    return nullptr;
  }
  p += 32;
  ds->lengths.resize(n_traj);
  memcpy(ds->lengths.data(), p, 8 * n_traj);
  p += 8 * n_traj;
  ds->fields.resize(n_field);
  for (uint32_t i = 0; i < n_field; ++i) {
    char name[33] = {0};
    memcpy(name, p, 32);
    ds->fields[i].name = name;
    memcpy(&ds->fields[i].width, p + 32, 8);
    p += 40;
  }
  for (uint32_t i = 0; i < n_field; ++i) {
    ds->fields[i].offsets.resize(n_traj);
    memcpy(ds->fields[i].offsets.data(), p, 8 * n_traj);
    p += 8 * n_traj;
  }
  // Validate every trajectory block lies inside the file.
  for (uint32_t i = 0; i < n_field; ++i) {
    const Field& f = ds->fields[i];
    if (f.width <= 0) {
      munmap(map, st.st_size);
      ::close(fd);
      delete ds;
      return nullptr;
    }
    for (uint32_t t = 0; t < n_traj; ++t) {
      int64_t len = ds->lengths[t];
      int64_t off = f.offsets[t];
      uint64_t bytes = static_cast<uint64_t>(len) * f.width * ds->itemsize;
      if (len < 0 || off < 0 ||
          static_cast<uint64_t>(off) + bytes >
              static_cast<uint64_t>(st.st_size)) {
        munmap(map, st.st_size);
        ::close(fd);
        delete ds;
        return nullptr;
      }
    }
  }
  int64_t json_len;
  memcpy(&json_len, ds->base + ds->size - 8, 8);
  if (json_len >= 0 &&
      static_cast<size_t>(json_len) + 8 <= ds->size) {
    ds->json_meta.assign(
        reinterpret_cast<const char*>(ds->base + ds->size - 8 - json_len),
        json_len);
  }
  return ds;
}

void ftrj_close(void* handle) {
  auto* ds = static_cast<Dataset*>(handle);
  if (!ds) return;
  munmap(const_cast<uint8_t*>(ds->base), ds->size);
  ::close(ds->fd);
  delete ds;
}

int64_t ftrj_num_traj(void* handle) {
  return static_cast<Dataset*>(handle)->n_traj;
}

int64_t ftrj_dtype(void* handle) {
  return static_cast<Dataset*>(handle)->dtype_id;
}

int64_t ftrj_num_fields(void* handle) {
  return static_cast<Dataset*>(handle)->fields.size();
}

// Copies the field name at index `i` into `out` (cap bytes incl NUL).
void ftrj_field_name(void* handle, int64_t i, char* out, int64_t cap) {
  auto* ds = static_cast<Dataset*>(handle);
  strncpy(out, ds->fields[i].name.c_str(), cap - 1);
  out[cap - 1] = '\0';
}

int64_t ftrj_field_width(void* handle, const char* name) {
  auto* ds = static_cast<Dataset*>(handle);
  int fi = FieldIndex(ds, name);
  return fi < 0 ? -1 : ds->fields[fi].width;
}

void ftrj_lengths(void* handle, int64_t* out) {
  auto* ds = static_cast<Dataset*>(handle);
  memcpy(out, ds->lengths.data(), 8 * ds->n_traj);
}

int64_t ftrj_json_len(void* handle) {
  return static_cast<Dataset*>(handle)->json_meta.size();
}

void ftrj_json(void* handle, char* out) {
  auto* ds = static_cast<Dataset*>(handle);
  memcpy(out, ds->json_meta.data(), ds->json_meta.size());
}

// Zero-copy pointer to one trajectory's block (frame-major), or nullptr.
const void* ftrj_raw(void* handle, const char* name, int64_t traj) {
  auto* ds = static_cast<Dataset*>(handle);
  int fi = FieldIndex(ds, name);
  if (fi < 0 || traj < 0 || traj >= ds->n_traj) return nullptr;
  return ds->base + ds->fields[fi].offsets[traj];
}

// Fills out[n_sel, t_max, width] with final-frame padding. `sel` picks
// trajectories (host-side train/test splits); threaded over trajectories.
// Returns 0 on success.
int ftrj_gather_padded(void* handle, const char* name, const int64_t* sel,
                       int64_t n_sel, int64_t t_max, void* out,
                       int n_threads) {
  auto* ds = static_cast<Dataset*>(handle);
  int fi = FieldIndex(ds, name);
  if (fi < 0) return -1;
  const Field& f = ds->fields[fi];
  const size_t row = f.width * ds->itemsize;
  auto* dst_base = static_cast<uint8_t*>(out);

  std::atomic<int> err(0);
  ParallelFor(n_sel, n_threads, [&](int64_t i) {
    int64_t t = sel[i];
    if (t < 0 || t >= ds->n_traj) {
      err.store(-2);
      return;
    }
    int64_t len = ds->lengths[t];
    int64_t copy = len < t_max ? len : t_max;
    uint8_t* dst = dst_base + i * t_max * row;
    if (copy <= 0) {
      // Zero-length trajectory: there is no final frame to pad with —
      // zero-fill instead of reading before the output buffer.
      memset(dst, 0, t_max * row);
      return;
    }
    // pread into the destination: one syscall per block beats faulting
    // the mmap in page by page (cold files, sandboxed kernels).
    size_t want = copy * row;
    size_t got = 0;
    while (got < want) {
      ssize_t r = pread(ds->fd, dst + got, want - got,
                        f.offsets[t] + got);
      if (r <= 0) {
        err.store(-3);
        return;
      }
      got += r;
    }
    // Pad with the final frame (store_from_arrays semantics).
    const uint8_t* last = dst + (copy - 1) * row;
    for (int64_t k = copy; k < t_max; ++k) {
      memcpy(dst + k * row, last, row);
    }
  });
  return err.load();
}

// Advises the kernel to fault in a field's blocks ahead of use.
void ftrj_prefetch(void* handle, const char* name) {
  auto* ds = static_cast<Dataset*>(handle);
  int fi = FieldIndex(ds, name);
  if (fi < 0) return;
  const Field& f = ds->fields[fi];
  for (uint32_t t = 0; t < ds->n_traj; ++t) {
    size_t bytes = ds->lengths[t] * f.width * ds->itemsize;
    const uint8_t* p = ds->base + f.offsets[t];
    uintptr_t page = reinterpret_cast<uintptr_t>(p) & ~uintptr_t(4095);
    size_t span = bytes + (reinterpret_cast<uintptr_t>(p) - page);
    madvise(reinterpret_cast<void*>(page), span, MADV_WILLNEED);
  }
}

}  // extern "C"
