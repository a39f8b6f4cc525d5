// seqio: a minimal binary container for recorded camera sequences — the
// engine's rosbag-replay analogue (the reference replays UAVvsVicon*.bag
// through launch files, pf_mpe/launch/UAV_Target.launch:63-64; here a
// recorded sequence is a single mmap-able file the CLI can record and
// replay deterministically).
//
// Format PFSQv1 (little-endian):
//   offset  0: char  magic[8] = "PFSQv1\0\0"
//   offset  8: u32   height
//   offset 12: u32   width
//   offset 16: u32   dtype        (0 = uint8 grayscale)
//   offset 20: u32   reserved
//   offset 24: u64   n_frames     (back-patched on writer close)
//   offset 32: u8[32] reserved    -> header is 64 bytes
//   then per frame: f64 timestamp, u8 pixels[height*width]
//
// The reader memory-maps the file: frame access is a pointer offset, no
// copies, no allocation — suitable for feeding the framepipe ring or the
// tracker directly.  The writer streams append-only with buffered stdio.

#include <cstdint>
#include <cstdio>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[8] = {'P', 'F', 'S', 'Q', 'v', '1', '\0', '\0'};
constexpr int64_t kHeaderBytes = 64;

struct Header {
  char magic[8];
  uint32_t height;
  uint32_t width;
  uint32_t dtype;
  uint32_t reserved0;
  uint64_t n_frames;
  uint8_t reserved[32];
};
static_assert(sizeof(Header) == kHeaderBytes, "header layout");

struct Writer {
  FILE* f;
  Header hdr;
};

struct Reader {
  int fd;
  const uint8_t* map;
  int64_t map_bytes;
  Header hdr;
  int64_t frame_bytes;  // 8 (timestamp) + h*w
};

}  // namespace

extern "C" {

void* sq_create(const char* path, int height, int width) {
  if (height <= 0 || width <= 0) return nullptr;
  FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  Writer* w = new Writer();
  w->f = f;
  std::memset(&w->hdr, 0, sizeof(Header));
  std::memcpy(w->hdr.magic, kMagic, 8);
  w->hdr.height = static_cast<uint32_t>(height);
  w->hdr.width = static_cast<uint32_t>(width);
  w->hdr.dtype = 0;
  w->hdr.n_frames = 0;
  if (std::fwrite(&w->hdr, sizeof(Header), 1, f) != 1) {
    std::fclose(f);
    delete w;
    return nullptr;
  }
  return w;
}

// Appends one uint8 frame (height*width pixels, row-major) with its
// timestamp.  Returns the new frame count, or -1 on error.
long long sq_append(void* handle, const unsigned char* pixels, double t) {
  Writer* w = static_cast<Writer*>(handle);
  if (!w || !w->f) return -1;
  const size_t px = static_cast<size_t>(w->hdr.height) * w->hdr.width;
  if (std::fwrite(&t, sizeof(double), 1, w->f) != 1) return -1;
  if (std::fwrite(pixels, 1, px, w->f) != px) return -1;
  w->hdr.n_frames += 1;
  return static_cast<long long>(w->hdr.n_frames);
}

// Back-patches the frame count and closes.  Returns 0 on success.
int sq_close_writer(void* handle) {
  Writer* w = static_cast<Writer*>(handle);
  if (!w) return -1;
  int rc = 0;
  if (w->f) {
    if (std::fseek(w->f, 0, SEEK_SET) != 0 ||
        std::fwrite(&w->hdr, sizeof(Header), 1, w->f) != 1) {
      rc = -1;
    }
    if (std::fclose(w->f) != 0) rc = -1;
  }
  delete w;
  return rc;
}

void* sq_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (::fstat(fd, &st) != 0 || st.st_size < kHeaderBytes) {
    ::close(fd);
    return nullptr;
  }
  const uint8_t* map = static_cast<const uint8_t*>(
      ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0));
  if (map == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  Reader* r = new Reader();
  r->fd = fd;
  r->map = map;
  r->map_bytes = st.st_size;
  std::memcpy(&r->hdr, map, sizeof(Header));
  if (std::memcmp(r->hdr.magic, kMagic, 8) != 0 || r->hdr.dtype != 0) {
    ::munmap(const_cast<uint8_t*>(map), st.st_size);
    ::close(fd);
    delete r;
    return nullptr;
  }
  r->frame_bytes =
      8 + static_cast<int64_t>(r->hdr.height) * r->hdr.width;
  // clamp a corrupt/truncated count to what the file actually holds
  const uint64_t fit =
      static_cast<uint64_t>((r->map_bytes - kHeaderBytes) / r->frame_bytes);
  if (r->hdr.n_frames > fit) r->hdr.n_frames = fit;
  return r;
}

long long sq_frames(void* handle) {
  Reader* r = static_cast<Reader*>(handle);
  return r ? static_cast<long long>(r->hdr.n_frames) : -1;
}

int sq_height(void* handle) {
  Reader* r = static_cast<Reader*>(handle);
  return r ? static_cast<int>(r->hdr.height) : -1;
}

int sq_width(void* handle) {
  Reader* r = static_cast<Reader*>(handle);
  return r ? static_cast<int>(r->hdr.width) : -1;
}

// Zero-copy access: returns a pointer into the mapping for frame i's
// pixels and writes its timestamp to *t.  NULL if out of range.
const unsigned char* sq_frame(void* handle, long long i, double* t) {
  Reader* r = static_cast<Reader*>(handle);
  if (!r || i < 0 || static_cast<uint64_t>(i) >= r->hdr.n_frames) return nullptr;
  const uint8_t* p = r->map + kHeaderBytes + i * r->frame_bytes;
  if (t) std::memcpy(t, p, sizeof(double));
  return p + 8;
}

void sq_close(void* handle) {
  Reader* r = static_cast<Reader*>(handle);
  if (!r) return;
  if (r->map) ::munmap(const_cast<uint8_t*>(r->map), r->map_bytes);
  if (r->fd >= 0) ::close(r->fd);
  delete r;
}

}  // extern "C"
