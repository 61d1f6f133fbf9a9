// framepipe: multithreaded ordered JPEG frame decoder with a bounded ring.
//
// Role reference: the GStreamer capture pipelines of FastMOT's videoio
// (videoio.py:156-238) which push hardware-decoded frames into a bounded
// deque from a capture thread (videoio.py:240-254). On a TPU host there is
// no NVDEC; the throughput path for MOT image sequences is parallel JPEG
// decode. N worker threads decode frames round-robin into a slot ring;
// the consumer pops frames strictly in order (file sources block, like the
// reference's file semantics).
//
// C ABI (ctypes-consumed by fastmot_tpu/utils/framepipe.py):
//   void* fp_open(const char* pattern, int start_idx, int end_idx,
//                 int n_threads, int ring_cap, int out_w, int out_h);
//   int   fp_frame_size(void* h);           // bytes per BGR frame
//   int   fp_read(void* h, unsigned char* out);  // 1 ok, 0 end-of-seq
//   void  fp_close(void* h);
//
// Frames are emitted as BGR8 HxWx3 (matching cv2.imread), resized to
// (out_w, out_h) with bilinear sampling when the source size differs.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <setjmp.h>

namespace {

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode one JPEG file into BGR8; returns true on success.
bool decode_jpeg_bgr(const std::string& path, std::vector<uint8_t>& out,
                     int& w, int& h) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_EXT_BGR;  // libjpeg-turbo extension
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  out.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Bilinear resize BGR8 (half-pixel centers, matches cv2.resize INTER_LINEAR
// closely enough for tracking).
void resize_bgr(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
                int dh) {
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    if (fy > sh - 1) fy = static_cast<float>(sh - 1);
    int y0 = static_cast<int>(fy);
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      if (fx > sw - 1) fx = static_cast<float>(sw - 1);
      int x0 = static_cast<int>(fx);
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        float a = src[(y0 * sw + x0) * 3 + c];
        float b = src[(y0 * sw + x1) * 3 + c];
        float cc = src[(y1 * sw + x0) * 3 + c];
        float d = src[(y1 * sw + x1) * 3 + c];
        float v = a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx +
                  cc * wy * (1 - wx) + d * wy * wx;
        dst[(y * dw + x) * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

struct Slot {
  std::vector<uint8_t> data;
  long seq = -1;        // which frame occupies this slot
  bool ok = false;      // decode success
};

struct Pipe {
  std::string pattern;
  int start_idx;
  long end_idx;         // exclusive; LONG_MAX if open-ended
  int out_w, out_h;
  int ring_cap;

  std::vector<Slot> ring;
  std::mutex mu;
  std::condition_variable cv_produced;
  std::condition_variable cv_consumed;
  long next_to_read = 0;          // consumer cursor (0-based frame counter)
  std::atomic<long> next_job{0};  // producer work counter
  std::atomic<bool> stop{false};
  long first_missing = -1;        // sequence end discovered by a worker
  std::vector<std::thread> workers;

  std::string path_for(long i) const {
    char buf[1024];
    snprintf(buf, sizeof(buf), pattern.c_str(),
             static_cast<long>(start_idx) + i);
    return std::string(buf);
  }

  void worker() {
    std::vector<uint8_t> raw;
    std::vector<uint8_t> resized(static_cast<size_t>(out_w) * out_h * 3);
    while (!stop.load()) {
      long job = next_job.fetch_add(1);
      if (job >= end_idx - start_idx) break;
      {
        // don't decode far ahead of the consumer
        std::unique_lock<std::mutex> lk(mu);
        cv_consumed.wait(lk, [&] {
          return stop.load() || job < next_to_read + ring_cap;
        });
        if (stop.load()) break;
        if (first_missing >= 0 && job >= first_missing) break;
      }
      int w = 0, h = 0;
      bool ok = decode_jpeg_bgr(path_for(job), raw, w, h);
      Slot local;
      local.ok = ok;
      if (ok) {
        if (w == out_w && h == out_h) {
          local.data = raw;
        } else {
          resize_bgr(raw.data(), w, h, resized.data(), out_w, out_h);
          local.data = resized;
        }
      }
      {
        std::unique_lock<std::mutex> lk(mu);
        if (!ok && (first_missing < 0 || job < first_missing))
          first_missing = job;
        Slot& s = ring[job % ring_cap];
        s.data.swap(local.data);
        s.seq = job;
        s.ok = ok;
        cv_produced.notify_all();
      }
    }
    std::unique_lock<std::mutex> lk(mu);
    cv_produced.notify_all();
  }
};

}  // namespace

extern "C" {

void* fp_open(const char* pattern, int start_idx, long end_idx,
              int n_threads, int ring_cap, int out_w, int out_h) {
  Pipe* p = new Pipe();
  p->pattern = pattern;
  p->start_idx = start_idx;
  p->end_idx = end_idx > 0 ? end_idx : (1L << 60);
  p->out_w = out_w;
  p->out_h = out_h;
  p->ring_cap = ring_cap > 0 ? ring_cap : 16;
  p->ring.resize(p->ring_cap);
  if (n_threads < 1) n_threads = 1;
  for (int i = 0; i < n_threads; ++i)
    p->workers.emplace_back([p] { p->worker(); });
  return p;
}

long fp_frame_size(void* h) {
  Pipe* p = static_cast<Pipe*>(h);
  return static_cast<long>(p->out_w) * p->out_h * 3;
}

int fp_read(void* h, unsigned char* out) {
  Pipe* p = static_cast<Pipe*>(h);
  std::unique_lock<std::mutex> lk(p->mu);
  long want = p->next_to_read;
  p->cv_produced.wait(lk, [&] {
    if (p->stop.load()) return true;
    if (p->first_missing >= 0 && want >= p->first_missing) return true;
    Slot& s = p->ring[want % p->ring_cap];
    return s.seq == want;
  });
  if (p->stop.load()) return 0;
  if (p->first_missing >= 0 && want >= p->first_missing) return 0;
  Slot& s = p->ring[want % p->ring_cap];
  if (!s.ok) return 0;
  memcpy(out, s.data.data(), s.data.size());
  s.seq = -1;
  p->next_to_read = want + 1;
  p->cv_consumed.notify_all();
  return 1;
}

void fp_close(void* h) {
  Pipe* p = static_cast<Pipe*>(h);
  {
    std::unique_lock<std::mutex> lk(p->mu);
    p->stop.store(true);
    p->cv_consumed.notify_all();
    p->cv_produced.notify_all();
  }
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
