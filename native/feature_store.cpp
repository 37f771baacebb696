// Memory-mapped region-feature store — the production data-path backend.
//
// Replaces the reference's feature plumbing (unpickling a whole
// {img_id: tensor[N, 2054]} dict into RAM at dataset construction,
// Data/VCRChunkAlign.py:778-781, and the UNITER LMDB reader it inherited,
// Data/data.py:49-129) with an indexed binary pack:
//
//   header   : magic 'MCRF' | version u32 | n u64 | dim u32 | pad u32
//   index    : n × { key_hash u64, key_off u64, key_len u32,
//                    n_regions u32, data_off u64 }   (sorted by key_hash)
//   keys blob, then fp32 feature blobs (64-byte aligned)
//
// Reads are mmap + binary search: O(log n) lookups, zero copies, zero
// deserialization, shared pages across data-loader processes.  The writer
// lives in Python (data/feature_store.py) — packing is a one-time offline
// step; this is the hot read path.
//
// C API only (ctypes-friendly; no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x4652434Du;  // 'MCRF' little-endian
constexpr uint32_t kVersion = 1;

#pragma pack(push, 1)
struct Header {
  uint32_t magic;
  uint32_t version;
  uint64_t n_entries;
  uint32_t dim;
  uint32_t pad;
};

struct IndexEntry {
  uint64_t key_hash;
  uint64_t key_off;
  uint32_t key_len;
  uint32_t n_regions;
  uint64_t data_off;
};
#pragma pack(pop)

struct Store {
  const uint8_t* base = nullptr;
  size_t size = 0;
  const Header* header = nullptr;
  const IndexEntry* index = nullptr;
  int fd = -1;
};

uint64_t fnv1a(const char* s, uint32_t len) {
  uint64_t h = 1469598103934665603ull;
  for (uint32_t i = 0; i < len; ++i) {
    h ^= static_cast<uint8_t>(s[i]);
    h *= 1099511628211ull;
  }
  return h;
}

}  // namespace

extern "C" {

// Returns an opaque handle, or nullptr on failure.
void* mcr_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < (off_t)sizeof(Header)) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  madvise(base, st.st_size, MADV_RANDOM);
  auto* s = new Store();
  s->base = static_cast<const uint8_t*>(base);
  s->size = st.st_size;
  s->fd = fd;
  s->header = reinterpret_cast<const Header*>(s->base);
  if (s->header->magic != kMagic || s->header->version != kVersion) {
    munmap(base, st.st_size);
    ::close(fd);
    delete s;
    return nullptr;
  }
  s->index = reinterpret_cast<const IndexEntry*>(s->base + sizeof(Header));
  return s;
}

void mcr_close(void* handle) {
  if (!handle) return;
  auto* s = static_cast<Store*>(handle);
  munmap(const_cast<uint8_t*>(s->base), s->size);
  ::close(s->fd);
  delete s;
}

uint64_t mcr_count(const void* handle) {
  return static_cast<const Store*>(handle)->header->n_entries;
}

uint32_t mcr_dim(const void* handle) {
  return static_cast<const Store*>(handle)->header->dim;
}

// Looks up `key`; on hit fills *n_regions and returns a pointer to the
// [n_regions, dim] fp32 block inside the mapping (valid until mcr_close).
// Returns nullptr on miss.
const float* mcr_lookup(const void* handle, const char* key,
                        uint32_t key_len, uint32_t* n_regions) {
  const auto* s = static_cast<const Store*>(handle);
  const uint64_t h = fnv1a(key, key_len);
  const IndexEntry* idx = s->index;
  uint64_t lo = 0, hi = s->header->n_entries;
  while (lo < hi) {
    uint64_t mid = lo + (hi - lo) / 2;
    if (idx[mid].key_hash < h) {
      lo = mid + 1;
    } else {
      hi = mid;
    }
  }
  // walk hash-equal run, verify exact key bytes (collision safety)
  for (uint64_t i = lo; i < s->header->n_entries && idx[i].key_hash == h; ++i) {
    const IndexEntry& e = idx[i];
    if (e.key_len == key_len &&
        std::memcmp(s->base + e.key_off, key, key_len) == 0) {
      if (n_regions) *n_regions = e.n_regions;
      return reinterpret_cast<const float*>(s->base + e.data_off);
    }
  }
  return nullptr;
}

// Key of entry `i` (index order); fills len, returns pointer into the map.
const char* mcr_key_at(const void* handle, uint64_t i, uint32_t* len) {
  const auto* s = static_cast<const Store*>(handle);
  if (i >= s->header->n_entries) return nullptr;
  const IndexEntry& e = s->index[i];
  if (len) *len = e.key_len;
  return reinterpret_cast<const char*>(s->base + e.key_off);
}

}  // extern "C"
