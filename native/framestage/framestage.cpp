// framestage: native host-side runtime for the TPU pipeline.
//
// Three services, exposed C-ABI for ctypes:
//
//  1. fs_decode_jpegs  -- thread-pool batch JPEG decode (+optional
//     grayscale + resize) into one caller-owned arena.  Replaces the
//     GIL-serialized cv2.imread loops of gallery/template loading
//     (reference train-v4.py:52-66 loads crops one by one).
//     Decoding uses OpenCV C++ (same codecs as the cv2 wheel), so
//     pixel values stay bit-identical with the Python path.
//
//  2. vr_* video ring buffer -- a decoder thread fills a fixed ring of
//     preallocated frame slots from cv::VideoCapture; Python pops
//     frames (blocking) and memcpy's at most once.  Overlaps mp4
//     decode with TPU compute without touching the GIL (reference's
//     loop decodes inline per frame, detection-v4.py:41-47).
//
//  3. gr_group -- groupRectangles clustering (the host half of
//     detectMultiScale, detect/haar.py).  The O(n^2) union-find pair
//     loop costs 35 ms/frame in Python at 150 raw windows (measured),
//     dominating the Haar finish half; here ~0.3 ms including the
//     ctypes call overhead at 150 windows (docs/DESIGN.md).
//     Semantics are EXACTLY the Python implementation's (itself
//     OpenCV's): SimilarRects predicate, cluster averaging with
//     round-half-even, strict count threshold, contained-in-bigger
//     rejection.
//
// Build: make -C native (g++ -O3 -shared, links opencv_core,
// imgcodecs, imgproc, videoio, pthread).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

extern "C" {

// ---------------------------------------------------------------------------
// Batch JPEG decode
// ---------------------------------------------------------------------------

// Decode n images into `out` (n * out_h * out_w * channels bytes,
// row-major). gray!=0 -> single channel (BGR2GRAY), else 3-channel BGR.
// out_h/out_w == 0 -> no resize (caller must size the arena for the
// native dimensions, returned via dims as h,w pairs); with resize, every
// slot is out_h x out_w. ok[i] = 1 on success. Returns count decoded.
int fs_decode_jpegs(const char** paths, int n, int gray, int out_h,
                    int out_w, unsigned char* out, int* dims, int* ok,
                    int num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  const int channels = gray ? 1 : 3;
  const size_t slot =
      (out_h > 0 && out_w > 0)
          ? static_cast<size_t>(out_h) * out_w * channels
          : 0;
  std::atomic<int> next(0), done(0);

  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      ok[i] = 0;
      cv::Mat img = cv::imread(paths[i],
                               gray ? cv::IMREAD_GRAYSCALE : cv::IMREAD_COLOR);
      if (img.empty()) continue;
      // Record ORIGINAL dims before any resize: callers use them for
      // native-size semantics (e.g. template-bank scale coverage).
      if (dims) {
        dims[2 * i] = img.rows;
        dims[2 * i + 1] = img.cols;
      }
      if (out_h > 0 && out_w > 0 && (img.rows != out_h || img.cols != out_w)) {
        cv::resize(img, img, cv::Size(out_w, out_h), 0, 0, cv::INTER_LINEAR);
      }
      unsigned char* dst =
          slot ? out + slot * static_cast<size_t>(i)
               : out + static_cast<size_t>(i) * 0;  // packed mode needs slot
      if (slot) {
        if (img.isContinuous()) {
          std::memcpy(dst, img.data, slot);
        } else {
          size_t row = static_cast<size_t>(img.cols) * channels;
          for (int r = 0; r < img.rows; ++r)
            std::memcpy(dst + r * row, img.ptr(r), row);
        }
        ok[i] = 1;
        done.fetch_add(1);
      }
    }
  };

  std::vector<std::thread> pool;
  int nt = std::min(num_threads, n > 0 ? n : 1);
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return done.load();
}

// ---------------------------------------------------------------------------
// Video ring buffer
// ---------------------------------------------------------------------------

struct VideoRing {
  cv::VideoCapture cap;
  std::thread decoder;
  std::mutex mu;
  std::condition_variable cv_pop, cv_push;
  std::queue<cv::Mat> ready;
  size_t capacity = 4;
  bool gray = false;
  bool eof = false;
  bool closed = false;
  int width = 0, height = 0, count = 0;
  double fps = 0.0;

  void run() {
    while (true) {
      cv::Mat frame;
      if (!cap.read(frame)) break;
      if (gray) {
        cv::Mat g;
        cv::cvtColor(frame, g, cv::COLOR_BGR2GRAY);
        frame = g;
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_push.wait(lk, [&] { return ready.size() < capacity || closed; });
      if (closed) return;
      ready.push(std::move(frame));
      cv_pop.notify_one();
    }
    std::lock_guard<std::mutex> lk(mu);
    eof = true;
    cv_pop.notify_all();
  }
};

void* vr_open(const char* path, int ring, int gray) {
  auto* vr = new VideoRing();
  if (!vr->cap.open(path)) {
    delete vr;
    return nullptr;
  }
  vr->capacity = ring > 0 ? static_cast<size_t>(ring) : 4;
  vr->gray = gray != 0;
  vr->width = static_cast<int>(vr->cap.get(cv::CAP_PROP_FRAME_WIDTH));
  vr->height = static_cast<int>(vr->cap.get(cv::CAP_PROP_FRAME_HEIGHT));
  vr->fps = vr->cap.get(cv::CAP_PROP_FPS);
  vr->count = static_cast<int>(vr->cap.get(cv::CAP_PROP_FRAME_COUNT));
  vr->decoder = std::thread([vr] { vr->run(); });
  return vr;
}

int vr_meta(void* h, int* w, int* ht, double* fps, int* count) {
  auto* vr = static_cast<VideoRing*>(h);
  if (!vr) return 0;
  *w = vr->width;
  *ht = vr->height;
  *fps = vr->fps;
  *count = vr->count;
  return 1;
}

// Pops the next frame into dst (height*width*(gray?1:3) bytes).
// Returns 1 on success, 0 on EOF.
int vr_next(void* h, unsigned char* dst) {
  auto* vr = static_cast<VideoRing*>(h);
  if (!vr) return 0;
  cv::Mat frame;
  {
    std::unique_lock<std::mutex> lk(vr->mu);
    vr->cv_pop.wait(lk, [&] { return !vr->ready.empty() || vr->eof; });
    if (vr->ready.empty()) return 0;
    frame = std::move(vr->ready.front());
    vr->ready.pop();
    vr->cv_push.notify_one();
  }
  size_t bytes = static_cast<size_t>(frame.rows) * frame.cols *
                 frame.channels();
  if (frame.isContinuous()) {
    std::memcpy(dst, frame.data, bytes);
  } else {
    size_t row = static_cast<size_t>(frame.cols) * frame.channels();
    for (int r = 0; r < frame.rows; ++r)
      std::memcpy(dst + r * row, frame.ptr(r), row);
  }
  return 1;
}

// ---------------------------------------------------------------------------
// groupRectangles
// ---------------------------------------------------------------------------

namespace {
int gr_find(std::vector<int>& parent, int a) {
  while (parent[a] != a) {
    parent[a] = parent[parent[a]];  // path halving, same as the Python impl
    a = parent[a];
  }
  return a;
}
// Round-half-even, matching Python round(np.float64) / np.rint.
// Explicit tie-break (not std::nearbyint) so the result is independent
// of the thread's fenv rounding mode -- a library switching the fenv
// away from FE_TONEAREST must not break the element-exact parity with
// the Python oracle that tests pin.
inline int gr_round(double v) {
  double fl = std::floor(v);
  double diff = v - fl;
  if (diff > 0.5) return static_cast<int>(fl) + 1;
  if (diff < 0.5) return static_cast<int>(fl);
  // Exact tie: round to the even neighbor.
  int lo = static_cast<int>(fl);
  return (lo % 2 == 0) ? lo : lo + 1;
}
}  // namespace

// Cluster n rectangles (x, y, w, h as doubles, row-major n*4) with the
// SimilarRects predicate and reject contained clusters.  Writes up to
// `cap` merged (x, y, w, h) int rows into `out`; returns the merged
// count (always <= n).  group_threshold <= 0 and n == 0 are handled by
// the Python caller (passthrough / empty).
int gr_group(const double* rects, int n, int group_threshold, double eps,
             int* out, int cap) {
  std::vector<int> parent(n);
  for (int i = 0; i < n; ++i) parent[i] = i;
  for (int i = 0; i < n; ++i) {
    const double xi = rects[4 * i], yi = rects[4 * i + 1];
    const double wi = rects[4 * i + 2], hi = rects[4 * i + 3];
    for (int j = i + 1; j < n; ++j) {
      const double xj = rects[4 * j], yj = rects[4 * j + 1];
      const double wj = rects[4 * j + 2], hj = rects[4 * j + 3];
      const double delta =
          eps * 0.5 * (std::min(wi, wj) + std::min(hi, hj));
      if (std::abs(xi - xj) <= delta && std::abs(yi - yj) <= delta &&
          std::abs(xi + wi - xj - wj) <= delta &&
          std::abs(yi + hi - yj - hj) <= delta) {
        const int ra = gr_find(parent, i), rb = gr_find(parent, j);
        if (ra != rb) parent[rb] = ra;
      }
    }
  }

  // Clusters in first-appearance order (Python dict insertion order).
  std::vector<int> root_slot(n, -1);
  std::vector<double> sums;   // 4 per cluster
  std::vector<int> counts;
  for (int i = 0; i < n; ++i) {
    const int r = gr_find(parent, i);
    int s = root_slot[r];
    if (s < 0) {
      s = static_cast<int>(counts.size());
      root_slot[r] = s;
      sums.insert(sums.end(), {0.0, 0.0, 0.0, 0.0});
      counts.push_back(0);
    }
    for (int c = 0; c < 4; ++c) sums[4 * s + c] += rects[4 * i + c];
    counts[s] += 1;
  }

  struct Merged { int x, y, w, h, cnt; };
  std::vector<Merged> merged;
  for (size_t s = 0; s < counts.size(); ++s) {
    const int cnt = counts[s];
    if (cnt <= group_threshold) continue;
    merged.push_back({gr_round(sums[4 * s] / cnt),
                      gr_round(sums[4 * s + 1] / cnt),
                      gr_round(sums[4 * s + 2] / cnt),
                      gr_round(sums[4 * s + 3] / cnt), cnt});
  }

  int written = 0;
  for (size_t i = 0; i < merged.size(); ++i) {
    const Merged& r1 = merged[i];
    bool keep = true;
    for (size_t j = 0; j < merged.size(); ++j) {
      if (i == j) continue;
      const Merged& r2 = merged[j];
      const int dx = gr_round(r2.w * eps);
      const int dy = gr_round(r2.h * eps);
      const bool inside =
          r1.x >= r2.x - dx && r1.y >= r2.y - dy &&
          r1.x + r1.w <= r2.x + r2.w + dx && r1.y + r1.h <= r2.y + r2.h + dy;
      if (inside && (r2.cnt > std::max(3, r1.cnt) || r1.cnt < 3)) {
        keep = false;
        break;
      }
    }
    if (keep && written < cap) {
      out[4 * written] = r1.x;
      out[4 * written + 1] = r1.y;
      out[4 * written + 2] = r1.w;
      out[4 * written + 3] = r1.h;
      ++written;
    }
  }
  return written;
}

void vr_close(void* h) {
  auto* vr = static_cast<VideoRing*>(h);
  if (!vr) return;
  {
    std::lock_guard<std::mutex> lk(vr->mu);
    vr->closed = true;
    vr->cv_push.notify_all();
  }
  if (vr->decoder.joinable()) vr->decoder.join();
  delete vr;
}

}  // extern "C"
