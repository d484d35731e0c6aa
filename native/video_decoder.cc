// Native video decode service: the host-side frame feeder of the framework.
//
// The reference decodes videos frame-by-frame in Python (cv2.VideoCapture
// loops at ref extract_mesh.py:47-101 and modifications/process_video.py:10-21,
// plus a frames->JPEG-on-disk cache at extract_mesh.py:200-209). On a TPU host
// the decode must keep up with fully batched device inference, so this library
// provides the native equivalent: libavformat/libavcodec demux+decode straight
// to packed RGB24 frame stacks, and a pthread pool that decodes many videos
// concurrently (prefetching the next videos while the TPU processes the
// current one).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// API (all functions thread-safe for distinct handles):
//   vd_load(path, max_frames)       -> handle with a fully decoded RGB stack
//   vd_shape(handle, int64[3])      -> {T, H, W}
//   vd_copy(handle, dst)            -> memcpy the [T,H,W,3] uint8 payload
//   vd_error(handle)                -> error string ("" if ok)
//   vd_free(handle)
//   vd_load_many(paths, n, max_frames, handles_out, n_threads)
//   vd_probe(path, int64[3])        -> {nb_frames_estimate, H, W} w/o decode

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <pthread.h>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

struct VideoStack {
  uint8_t* data = nullptr;  // [T, H, W, 3] packed RGB24
  int64_t t = 0, h = 0, w = 0;
  size_t cap_frames = 0;
  std::string error;
};

constexpr size_t kFrameAlign = 64;

bool grow(VideoStack* v, size_t need_frames) {
  if (need_frames <= v->cap_frames) return true;
  size_t frame_bytes = (size_t)v->h * v->w * 3;
  size_t new_cap = v->cap_frames ? v->cap_frames * 2 : 64;
  if (new_cap < need_frames) new_cap = need_frames;
  uint8_t* p = static_cast<uint8_t*>(realloc(v->data, new_cap * frame_bytes));
  if (!p) {
    v->error = "out of memory growing frame stack";
    return false;
  }
  v->data = p;
  v->cap_frames = new_cap;
  return true;
}

// Decode every frame of `path` into a packed RGB24 stack. max_frames <= 0
// means unlimited.
void decode_file(const char* path, int64_t max_frames, VideoStack* out) {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* frame = av_frame_alloc();
  AVPacket* pkt = av_packet_alloc();
  int stream_idx = -1;
  // sws context cache key: recreate on any in-stream parameter change
  int sws_fmt = AV_PIX_FMT_NONE, sws_w = 0, sws_h = 0;

  auto fail = [&](const std::string& msg) { out->error = msg; };

  do {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) {
      fail(std::string("could not open ") + path);
      break;
    }
    if (avformat_find_stream_info(fmt, nullptr) < 0) {
      fail("no stream info");
      break;
    }
    const AVCodec* codec = nullptr;
    stream_idx =
        av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
    if (stream_idx < 0 || !codec) {
      fail("no video stream / decoder");
      break;
    }
    AVStream* st = fmt->streams[stream_idx];
    dec = avcodec_alloc_context3(codec);
    if (!dec || avcodec_parameters_to_context(dec, st->codecpar) < 0) {
      fail("codec context setup failed");
      break;
    }
    dec->thread_count = 0;  // auto intra-frame threading
    if (avcodec_open2(dec, codec, nullptr) < 0) {
      fail("could not open codec");
      break;
    }
    out->h = dec->height;
    out->w = dec->width;
    if (out->h <= 0 || out->w <= 0) {
      fail("bad frame dimensions");
      break;
    }
    size_t frame_bytes = (size_t)out->h * out->w * 3;

    auto emit = [&](AVFrame* f) -> bool {
      if (max_frames > 0 && out->t >= max_frames) return true;
      if (!grow(out, (size_t)out->t + 1)) return false;
      // In-stream parameter changes (pixel format or resolution) invalidate
      // the cached sws context; convert from the frame's OWN geometry into
      // the fixed output geometry so the stack shape stays [T, H, W, 3].
      if (!sws || f->format != sws_fmt || f->width != sws_w ||
          f->height != sws_h) {
        if (sws) sws_freeContext(sws);
        sws = sws_getContext(f->width, f->height, (AVPixelFormat)f->format,
                             (int)out->w, (int)out->h, AV_PIX_FMT_RGB24,
                             SWS_BILINEAR, nullptr, nullptr, nullptr);
        if (!sws) {
          out->error = "sws_getContext failed";
          return false;
        }
        sws_fmt = f->format;
        sws_w = f->width;
        sws_h = f->height;
      }
      uint8_t* dst_data[4] = {out->data + (size_t)out->t * frame_bytes, nullptr,
                              nullptr, nullptr};
      int dst_linesize[4] = {(int)(out->w * 3), 0, 0, 0};
      sws_scale(sws, f->data, f->linesize, 0, f->height, dst_data,
                dst_linesize);
      out->t++;
      return true;
    };

    bool ok = true;
    while (ok && av_read_frame(fmt, pkt) >= 0) {
      if (pkt->stream_index == stream_idx) {
        if (avcodec_send_packet(dec, pkt) == 0) {
          while (avcodec_receive_frame(dec, frame) == 0) {
            if (!emit(frame)) {
              ok = false;
              break;
            }
          }
        }
      }
      av_packet_unref(pkt);
      if (max_frames > 0 && out->t >= max_frames) break;
    }
    // flush the decoder
    if (ok && (max_frames <= 0 || out->t < max_frames)) {
      avcodec_send_packet(dec, nullptr);
      while (avcodec_receive_frame(dec, frame) == 0) {
        if (!emit(frame)) break;
        if (max_frames > 0 && out->t >= max_frames) break;
      }
    }
    if (out->t == 0 && out->error.empty()) fail("no frames decoded");
  } while (false);

  if (sws) sws_freeContext(sws);
  av_packet_free(&pkt);
  av_frame_free(&frame);
  if (dec) avcodec_free_context(&dec);
  if (fmt) avformat_close_input(&fmt);
}

}  // namespace

extern "C" {

void* vd_load(const char* path, int64_t max_frames) {
  VideoStack* v = new VideoStack();
  decode_file(path, max_frames, v);
  return v;
}

int vd_shape(void* h, int64_t* out_thw) {
  VideoStack* v = static_cast<VideoStack*>(h);
  if (!v) return -1;
  out_thw[0] = v->t;
  out_thw[1] = v->h;
  out_thw[2] = v->w;
  return v->error.empty() ? 0 : -2;
}

const char* vd_error(void* h) {
  VideoStack* v = static_cast<VideoStack*>(h);
  return v ? v->error.c_str() : "null handle";
}

int vd_copy(void* h, void* dst) {
  VideoStack* v = static_cast<VideoStack*>(h);
  if (!v || !v->data) return -1;
  memcpy(dst, v->data, (size_t)v->t * v->h * v->w * 3);
  return 0;
}

void vd_free(void* h) {
  VideoStack* v = static_cast<VideoStack*>(h);
  if (!v) return;
  free(v->data);
  delete v;
}

// Container-level probe (no decode): {nb_frames estimate (-1 unknown), H, W}.
int vd_probe(const char* path, int64_t* out) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return -2;
  }
  int idx = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (idx < 0) {
    avformat_close_input(&fmt);
    return -3;
  }
  AVStream* st = fmt->streams[idx];
  out[0] = st->nb_frames > 0 ? st->nb_frames : -1;
  out[1] = st->codecpar->height;
  out[2] = st->codecpar->width;
  avformat_close_input(&fmt);
  return 0;
}

// ---------------- threaded multi-file decode pool -----------------------

struct VdJob {
  const char* path;
  int64_t max_frames;
  void* handle;
};

struct VdPool {
  VdJob* jobs;
  int n_jobs;
  int next;
  pthread_mutex_t mu;
};

static void* vd_pool_worker(void* arg) {
  VdPool* pool = static_cast<VdPool*>(arg);
  for (;;) {
    pthread_mutex_lock(&pool->mu);
    int i = pool->next++;
    pthread_mutex_unlock(&pool->mu);
    if (i >= pool->n_jobs) break;
    pool->jobs[i].handle = vd_load(pool->jobs[i].path, pool->jobs[i].max_frames);
  }
  return nullptr;
}

// Decode many videos in parallel; handles_out[i] always valid (check
// vd_shape/vd_error per handle). Returns the number decoded cleanly.
int vd_load_many(const char** paths, int n, int64_t max_frames,
                 void** handles_out, int n_threads) {
  std::vector<VdJob> jobs(n);
  for (int i = 0; i < n; ++i) jobs[i] = {paths[i], max_frames, nullptr};
  VdPool pool{jobs.data(), n, 0, PTHREAD_MUTEX_INITIALIZER};
  int nt = n_threads < 1 ? 1 : n_threads;
  if (nt > n) nt = n;
  std::vector<pthread_t> threads(nt);
  for (int t = 0; t < nt; ++t)
    pthread_create(&threads[t], nullptr, vd_pool_worker, &pool);
  for (int t = 0; t < nt; ++t) pthread_join(threads[t], nullptr);
  int ok = 0;
  for (int i = 0; i < n; ++i) {
    handles_out[i] = jobs[i].handle;
    VideoStack* v = static_cast<VideoStack*>(jobs[i].handle);
    if (v && v->error.empty() && v->t > 0) ok++;
  }
  return ok;
}

}  // extern "C"
