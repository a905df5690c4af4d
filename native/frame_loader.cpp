// velocity_tpu native host runtime: threaded video frame staging pipeline.
//
// Decode (ffmpeg via OpenCV C++), BGR->gray, and 1/4-scale INTER_NEAREST
// decimation run on a background thread into a fixed ring of preallocated
// frame slots; the consumer (Python via ctypes, or any C caller) pops frames
// with zero per-frame allocation. This is the host half of the host->HBM
// feed pipeline (SURVEY.md §7.3 item 6): it keeps the accelerator from
// starving on single-stream decode and removes per-frame Python overhead.
//
// C API (stable, ctypes-friendly): vh_open / vh_start / vh_next / vh_close.

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct FrameSlot {
  std::vector<uint8_t> gray;   // H*W
  std::vector<uint8_t> small;  // (H/4)*(W/4)
  double time_s = 0.0;
  int64_t index = -1;
  bool end_of_stream = false;
};

struct Loader {
  cv::VideoCapture cap;
  int width = 0, height = 0, sw = 0, sh = 0;
  double fps = 0.0;
  int64_t frame_count = 0;

  // ring buffer
  std::vector<FrameSlot> ring;
  size_t head = 0, tail = 0, count = 0;  // producer appends at head
  std::mutex mu;
  std::condition_variable cv_can_produce, cv_can_consume;
  std::thread worker;
  std::atomic<bool> stop{false};
  int64_t start_frame = 0, max_frames = -1, step = 1;

  ~Loader() { shutdown(); }

  void shutdown() {
    stop.store(true);
    cv_can_produce.notify_all();
    cv_can_consume.notify_all();
    if (worker.joinable()) worker.join();
    if (cap.isOpened()) cap.release();
  }

  void produce_loop() {
    if (start_frame != 0) cap.set(cv::CAP_PROP_POS_FRAMES, (double)start_frame);
    cv::Mat bgr, gray, small;
    int64_t produced = 0;
    while (!stop.load()) {
      if (max_frames >= 0 && produced >= max_frames) break;
      if (produced > 0 && step > 1) {
        for (int64_t s = 0; s < step - 1; ++s) cap.grab();
      }
      // Timing: POS_MSEC semantics differ across OpenCV/ffmpeg versions
      // (pre-read vs post-read frame attribution), so synthesize the
      // timestamp from the reliable post-read frame counter at the container
      // frame rate — identical to the reference's probe-before-read
      // (vidExample.py:88-90) on constant-rate streams, which all targets are.
      bool ok = cap.read(bgr);
      int64_t idx = (int64_t)cap.get(cv::CAP_PROP_POS_FRAMES) - 1;
      double t = fps > 0 ? (double)idx / fps : 0.0;
      FrameSlot* slot = nullptr;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_can_produce.wait(lk, [&] { return stop.load() || count < ring.size(); });
        if (stop.load()) return;
        slot = &ring[head];
      }
      if (!ok) {
        slot->end_of_stream = true;
      } else {
        cv::cvtColor(bgr, gray, cv::COLOR_BGR2GRAY);
        cv::resize(gray, small, cv::Size(sw, sh), 0, 0, cv::INTER_NEAREST);
        std::memcpy(slot->gray.data(), gray.data, (size_t)width * height);
        std::memcpy(slot->small.data(), small.data, (size_t)sw * sh);
        slot->time_s = t;
        slot->index = idx;
        slot->end_of_stream = false;
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        head = (head + 1) % ring.size();
        ++count;
      }
      cv_can_consume.notify_one();
      if (!ok) return;
      ++produced;
    }
    // signal end after max_frames
    FrameSlot* slot = nullptr;
    {
      std::unique_lock<std::mutex> lk(mu);
      cv_can_produce.wait(lk, [&] { return stop.load() || count < ring.size(); });
      if (stop.load()) return;
      slot = &ring[head];
      slot->end_of_stream = true;
      head = (head + 1) % ring.size();
      ++count;
    }
    cv_can_consume.notify_one();
  }
};

}  // namespace

extern "C" {

// Returns an opaque handle or nullptr. Fills dims/fps/frame_count.
void* vh_open(const char* path, int* width, int* height, double* fps,
              int64_t* frame_count) {
  auto* L = new Loader();
  if (!L->cap.open(path)) {
    delete L;
    return nullptr;
  }
  L->width = (int)L->cap.get(cv::CAP_PROP_FRAME_WIDTH);
  L->height = (int)L->cap.get(cv::CAP_PROP_FRAME_HEIGHT);
  L->fps = L->cap.get(cv::CAP_PROP_FPS);
  L->frame_count = (int64_t)L->cap.get(cv::CAP_PROP_FRAME_COUNT);
  L->sw = (int)std::lround(L->width * 0.25);
  L->sh = (int)std::lround(L->height * 0.25);
  if (width) *width = L->width;
  if (height) *height = L->height;
  if (fps) *fps = L->fps;
  if (frame_count) *frame_count = L->frame_count;
  return L;
}

// Start background decode of `max_frames` (-1 = all) from `start`, every
// `step`th frame, with a ring of `depth` slots.
int vh_start(void* handle, int64_t start, int64_t max_frames, int64_t step,
             int depth) {
  auto* L = static_cast<Loader*>(handle);
  if (!L || depth < 2) return -1;
  L->start_frame = start;
  L->max_frames = max_frames;
  L->step = step < 1 ? 1 : step;
  L->ring.resize(depth);
  for (auto& s : L->ring) {
    s.gray.resize((size_t)L->width * L->height);
    s.small.resize((size_t)L->sw * L->sh);
  }
  L->worker = std::thread([L] { L->produce_loop(); });
  return 0;
}

// Pop the next frame into caller buffers. Returns 1 on frame, 0 on end of
// stream, -1 on error. small_out may be nullptr.
int vh_next(void* handle, uint8_t* gray_out, uint8_t* small_out,
            double* time_s, int64_t* index) {
  auto* L = static_cast<Loader*>(handle);
  if (!L) return -1;
  FrameSlot* slot = nullptr;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_can_consume.wait(lk, [&] { return L->stop.load() || L->count > 0; });
    if (L->stop.load() && L->count == 0) return -1;
    slot = &L->ring[L->tail];
  }
  int rc;
  if (slot->end_of_stream) {
    rc = 0;
  } else {
    if (gray_out)
      std::memcpy(gray_out, slot->gray.data(), slot->gray.size());
    if (small_out)
      std::memcpy(small_out, slot->small.data(), slot->small.size());
    if (time_s) *time_s = slot->time_s;
    if (index) *index = slot->index;
    rc = 1;
  }
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->tail = (L->tail + 1) % L->ring.size();
    --L->count;
  }
  L->cv_can_produce.notify_one();
  return rc;
}

void vh_close(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  delete L;
}

int vh_small_dims(void* handle, int* sw, int* sh) {
  auto* L = static_cast<Loader*>(handle);
  if (!L) return -1;
  if (sw) *sw = L->sw;
  if (sh) *sh = L->sh;
  return 0;
}

}  // extern "C"
