// Native multi-threaded audio segment loader.
//
// TPU-native replacement for the reference's torch DataLoader worker pool +
// libsndfile IO (reference: utils/setup.py:10-34 builds a DataLoader with
// num_workers subprocesses and prefetch_factor=20 over soundfile reads;
// datasets/maestro_dataset.py:59-100 picks a random file and yields 8 random
// crops per opened file).  Here the same pipeline is a C++ thread pool inside
// the process: worker threads parse RIFF/WAVE files (PCM16/24/32, float32),
// downmix to mono, draw 8 random crops per opened file, and push fixed-shape
// [batch, seg_len] float32 batches (+ per-item native sample rates) into a
// bounded ring, so the host side of the input pipeline never blocks training.
//
// C ABI (used from Python via ctypes — no pybind11 in this environment):
//   loader_create(paths, n, seg_len, batch, n_threads, depth, seed) -> handle
//   loader_next(handle, float* out, int* fs_out) -> 0 on success
//   loader_destroy(handle)
//   wav_read_info(path, &n_samples, &fs, &channels) -> 0 on success
//   wav_read_mono(path, float* out, long max_samples) -> samples written

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct WavData {
  std::vector<float> samples;  // mono
  int fs = 0;
};

// Minimal RIFF/WAVE parser: PCM 16/24/32-bit and IEEE float32, any channels.
bool parse_wav(const std::string& path, WavData* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  auto read_u32 = [&](uint32_t* v) { return std::fread(v, 4, 1, f) == 1; };
  auto read_u16 = [&](uint16_t* v) { return std::fread(v, 2, 1, f) == 1; };

  char magic[4];
  uint32_t riff_size;
  if (std::fread(magic, 1, 4, f) != 4 || std::memcmp(magic, "RIFF", 4) ||
      !read_u32(&riff_size) || std::fread(magic, 1, 4, f) != 4 ||
      std::memcmp(magic, "WAVE", 4)) {
    std::fclose(f);
    return false;
  }

  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t fs = 0;
  bool have_fmt = false;
  bool ok = false;

  while (std::fread(magic, 1, 4, f) == 4) {
    uint32_t chunk_size;
    if (!read_u32(&chunk_size)) break;
    if (!std::memcmp(magic, "fmt ", 4)) {
      uint16_t block_align;
      uint32_t byte_rate;
      if (!read_u16(&fmt) || !read_u16(&channels) || !read_u32(&fs) ||
          !read_u32(&byte_rate) || !read_u16(&block_align) || !read_u16(&bits))
        break;
      if (chunk_size > 16) std::fseek(f, chunk_size - 16, SEEK_CUR);
      if (fmt == 0xFFFE) fmt = 1;  // WAVE_FORMAT_EXTENSIBLE: assume PCM layout
      have_fmt = true;
    } else if (!std::memcmp(magic, "data", 4)) {
      if (!have_fmt || channels == 0) break;
      const size_t bytes_per = bits / 8;
      const size_t n_frames = chunk_size / (bytes_per * channels);
      std::vector<uint8_t> raw(chunk_size);
      if (std::fread(raw.data(), 1, chunk_size, f) != chunk_size) break;
      out->samples.assign(n_frames, 0.0f);
      out->fs = static_cast<int>(fs);
      const float inv_ch = 1.0f / channels;
      for (size_t i = 0; i < n_frames; ++i) {
        float acc = 0.0f;
        for (int c = 0; c < channels; ++c) {
          const uint8_t* p = raw.data() + (i * channels + c) * bytes_per;
          float v = 0.0f;
          if (fmt == 3 && bits == 32) {  // IEEE float
            std::memcpy(&v, p, 4);
          } else if (bits == 16) {
            int16_t s;
            std::memcpy(&s, p, 2);
            v = s / 32768.0f;
          } else if (bits == 24) {
            int32_t s = (p[0] << 8) | (p[1] << 16) | (p[2] << 24);
            v = (s >> 8) / 8388608.0f;
          } else if (bits == 32) {
            int32_t s;
            std::memcpy(&s, p, 4);
            v = s / 2147483648.0f;
          }
          acc += v;
        }
        out->samples[i] = acc * inv_ch;
      }
      ok = true;
      break;
    } else {
      std::fseek(f, chunk_size + (chunk_size & 1), SEEK_CUR);
    }
  }
  std::fclose(f);
  return ok && !out->samples.empty();
}

struct Batch {
  std::vector<float> data;  // [batch, seg_len]
  std::vector<int> fs;      // [batch]
};

struct Loader {
  std::vector<std::string> files;
  long seg_len = 0;
  int batch = 0;
  size_t depth = 4;

  std::deque<Batch> queue;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;

  void worker(uint64_t seed) {
    std::mt19937_64 rng(seed);
    Batch cur;
    cur.data.reserve(static_cast<size_t>(batch) * seg_len);
    int filled = 0;
    cur.data.assign(static_cast<size_t>(batch) * seg_len, 0.0f);
    cur.fs.assign(batch, 0);
    while (!stop.load()) {
      const auto& path = files[rng() % files.size()];
      WavData wav;
      if (!parse_wav(path, &wav)) continue;
      const long n = static_cast<long>(wav.samples.size());
      if (n <= seg_len + 1) continue;
      // 8 random crops per opened file (datasets/maestro_dataset.py:82-100)
      for (int k = 0; k < 8 && !stop.load(); ++k) {
        const long idx = static_cast<long>(rng() % (n - seg_len));
        std::memcpy(cur.data.data() + static_cast<size_t>(filled) * seg_len,
                    wav.samples.data() + idx, seg_len * sizeof(float));
        cur.fs[filled] = wav.fs;
        if (++filled == batch) {
          std::unique_lock<std::mutex> lk(mu);
          cv_push.wait(lk, [&] { return queue.size() < depth || stop.load(); });
          if (stop.load()) return;
          queue.push_back(std::move(cur));
          cv_pop.notify_one();
          lk.unlock();
          cur.data.assign(static_cast<size_t>(batch) * seg_len, 0.0f);
          cur.fs.assign(batch, 0);
          filled = 0;
        }
      }
    }
  }
};

}  // namespace

extern "C" {

void* loader_create(const char** paths, int n_paths, long seg_len, int batch,
                    int n_threads, int depth, uint64_t seed) {
  if (n_paths <= 0 || seg_len <= 0 || batch <= 0) return nullptr;
  auto* L = new Loader();
  L->files.reserve(n_paths);
  for (int i = 0; i < n_paths; ++i) L->files.emplace_back(paths[i]);
  L->seg_len = seg_len;
  L->batch = batch;
  L->depth = depth > 0 ? depth : 4;
  const int nt = n_threads > 0 ? n_threads : 2;
  for (int t = 0; t < nt; ++t)
    L->workers.emplace_back(&Loader::worker, L, seed + 0x9E3779B97F4A7C15ull * t);
  return L;
}

int loader_next(void* handle, float* out, int* fs_out) {
  auto* L = static_cast<Loader*>(handle);
  if (!L) return -1;
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_pop.wait(lk, [&] { return !L->queue.empty() || L->stop.load(); });
  if (L->queue.empty()) return -1;
  Batch b = std::move(L->queue.front());
  L->queue.pop_front();
  L->cv_push.notify_one();
  lk.unlock();
  std::memcpy(out, b.data.data(), b.data.size() * sizeof(float));
  if (fs_out) std::memcpy(fs_out, b.fs.data(), b.fs.size() * sizeof(int));
  return 0;
}

void loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  if (!L) return;
  L->stop.store(true);
  L->cv_push.notify_all();
  L->cv_pop.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

int wav_read_info(const char* path, long* n_samples, int* fs, int* channels) {
  WavData w;
  if (!parse_wav(path, &w)) return -1;
  if (n_samples) *n_samples = static_cast<long>(w.samples.size());
  if (fs) *fs = w.fs;
  if (channels) *channels = 1;  // parser downmixes
  return 0;
}

long wav_read_mono(const char* path, float* out, long max_samples) {
  WavData w;
  if (!parse_wav(path, &w)) return -1;
  const long n = std::min<long>(max_samples, static_cast<long>(w.samples.size()));
  std::memcpy(out, w.samples.data(), n * sizeof(float));
  return n;
}

}  // extern "C"
