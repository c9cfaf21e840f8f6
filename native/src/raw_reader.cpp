// Fast SLAMBench .raw sequence reader with asynchronous prefetch.
//
// Native-runtime equivalent of the reference's RawDepthReader
// (se_apps/include/interface.h:286-500): same on-disk layout
//   [u32 w][u32 h][u16 depth * w*h][u32 w][u32 h][u8 rgb * 3*w*h]
// but mmap-based with a background prefetch thread so the accelerator
// never waits on disk (the data-loader role of the runtime).
//
// C ABI for ctypes binding (no pybind11 in this image).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct RawFile {
  int fd = -1;
  const uint8_t* data = nullptr;
  size_t bytes = 0;
  uint32_t width = 0, height = 0;
  size_t frame_bytes = 0;
  int num_frames = 0;

  // prefetch state
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<int> want{-1};
  bool stop = false;

  ~RawFile() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv.notify_all();
    if (worker.joinable()) worker.join();
    if (data) munmap(const_cast<uint8_t*>(data), bytes);
    if (fd >= 0) close(fd);
  }

  const uint8_t* frame_ptr(int frame) const {
    return data + static_cast<size_t>(frame) * frame_bytes;
  }

  void prefetch_loop() {
    for (;;) {
      int frame;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop || want.load() >= 0; });
        if (stop) return;
        frame = want.exchange(-1);
      }
      if (frame < 0 || frame >= num_frames) continue;
      // touch every page of the frame to pull it into the page cache
      const uint8_t* p = frame_ptr(frame);
      volatile uint8_t sink = 0;
      for (size_t off = 0; off < frame_bytes; off += 4096) sink ^= p[off];
      (void)sink;
    }
  }
};

}  // namespace

extern "C" {

void* se_raw_open(const char* path) {
  auto* f = new RawFile();
  f->fd = open(path, O_RDONLY);
  if (f->fd < 0) {
    delete f;
    return nullptr;
  }
  struct stat st;
  if (fstat(f->fd, &st) != 0 || st.st_size < 8) {
    delete f;
    return nullptr;
  }
  f->bytes = static_cast<size_t>(st.st_size);
  void* m = mmap(nullptr, f->bytes, PROT_READ, MAP_PRIVATE, f->fd, 0);
  if (m == MAP_FAILED) {
    delete f;
    return nullptr;
  }
  f->data = static_cast<const uint8_t*>(m);
  std::memcpy(&f->width, f->data, 4);
  std::memcpy(&f->height, f->data + 4, 4);
  const size_t npix = static_cast<size_t>(f->width) * f->height;
  f->frame_bytes = 16 + 2 * npix + 3 * npix;
  f->num_frames = static_cast<int>(f->bytes / f->frame_bytes);
  f->worker = std::thread(&RawFile::prefetch_loop, f);
  return f;
}

void se_raw_close(void* h) { delete static_cast<RawFile*>(h); }

int se_raw_width(void* h) { return static_cast<RawFile*>(h)->width; }
int se_raw_height(void* h) { return static_cast<RawFile*>(h)->height; }
int se_raw_num_frames(void* h) {
  return static_cast<RawFile*>(h)->num_frames;
}

// copy the u16 depth image of `frame` into out (w*h entries); 0 on success
int se_raw_read_depth(void* h, int frame, uint16_t* out) {
  auto* f = static_cast<RawFile*>(h);
  if (frame < 0 || frame >= f->num_frames) return -1;
  const size_t npix = static_cast<size_t>(f->width) * f->height;
  std::memcpy(out, f->frame_ptr(frame) + 8, 2 * npix);
  return 0;
}

// copy the rgb image of `frame` into out (3*w*h bytes); 0 on success
int se_raw_read_rgb(void* h, int frame, uint8_t* out) {
  auto* f = static_cast<RawFile*>(h);
  if (frame < 0 || frame >= f->num_frames) return -1;
  const size_t npix = static_cast<size_t>(f->width) * f->height;
  std::memcpy(out, f->frame_ptr(frame) + 16 + 2 * npix, 3 * npix);
  return 0;
}

// hint: warm frame into the page cache from the background thread
void se_raw_prefetch(void* h, int frame) {
  auto* f = static_cast<RawFile*>(h);
  f->want.store(frame);
  f->cv.notify_all();
}

}  // extern "C"
