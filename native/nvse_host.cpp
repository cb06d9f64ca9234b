// nvse_host: native host-side audio IO for the TPU data pipeline.
//
// The TPU compute path is JAX/XLA; this library accelerates the host
// side that feeds it: WAV decoding (PCM 16/24/32 + float32, mono
// mixdown) and whole-batch segment assembly (read + random-crop N files
// into one contiguous batch buffer with a thread pool), replacing
// per-file Python decoding in the prefetch loader.
//
// C ABI only (loaded via ctypes; no pybind11 in this image).
//
// Build: make -C native   (produces libnvse_host.so)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct WavInfo {
  int sample_rate = 0;
  int channels = 0;
  int bits = 0;
  int format = 0;  // 1 = PCM, 3 = float
  long data_offset = 0;
  long data_bytes = 0;
};

bool parse_header(FILE* f, WavInfo* info) {
  char id[4];
  uint32_t sz;
  if (fread(id, 1, 4, f) != 4 || memcmp(id, "RIFF", 4)) return false;
  if (fread(&sz, 4, 1, f) != 1) return false;
  if (fread(id, 1, 4, f) != 4 || memcmp(id, "WAVE", 4)) return false;
  while (fread(id, 1, 4, f) == 4 && fread(&sz, 4, 1, f) == 1) {
    if (!memcmp(id, "fmt ", 4)) {
      uint16_t fmt, ch, block, bits;
      uint32_t rate, byterate;
      if (fread(&fmt, 2, 1, f) != 1 || fread(&ch, 2, 1, f) != 1 ||
          fread(&rate, 4, 1, f) != 1 || fread(&byterate, 4, 1, f) != 1 ||
          fread(&block, 2, 1, f) != 1 || fread(&bits, 2, 1, f) != 1)
        return false;
      long fmt_read = 16;
      if (fmt == 0xFFFE && sz >= 40) {
        // WAVE_FORMAT_EXTENSIBLE: the REAL format code is the first
        // two bytes of the SubFormat GUID (cbSize[2] + valid bits[2] +
        // channel mask[4] precede it). Assuming PCM here decoded
        // extensible float WAVs as int32 bit patterns — noise.
        uint16_t cb, valid_bits, sub_fmt;
        uint32_t chan_mask;
        if (fread(&cb, 2, 1, f) != 1 || fread(&valid_bits, 2, 1, f) != 1 ||
            fread(&chan_mask, 4, 1, f) != 1 || fread(&sub_fmt, 2, 1, f) != 1)
          return false;
        fmt = sub_fmt;
        fmt_read = 26;
      } else if (fmt == 0xFFFE) {
        fmt = 1;  // malformed extensible without SubFormat: assume PCM
      }
      info->format = fmt;
      info->channels = ch;
      info->sample_rate = (int)rate;
      info->bits = bits;
      if ((long)sz > fmt_read) fseek(f, (long)sz - fmt_read, SEEK_CUR);
    } else if (!memcmp(id, "data", 4)) {
      info->data_offset = ftell(f);
      info->data_bytes = sz;
      // clamp the declared payload to what the file actually holds
      // (a bogus 0xFFFFFFFF data size otherwise drives a huge resize
      // -> bad_alloc inside a worker thread -> std::terminate)
      long pos = ftell(f);
      if (fseek(f, 0, SEEK_END) == 0) {
        long end = ftell(f);
        if (end >= pos && info->data_bytes > end - pos)
          info->data_bytes = end - pos;
        fseek(f, pos, SEEK_SET);
      }
      // bits must be a sane byte multiple (bits==0 divided by zero)
      if (info->bits != 8 && info->bits != 16 && info->bits != 24 &&
          info->bits != 32)
        return false;
      if (info->format != 1 && info->format != 3) return false;
      return info->sample_rate > 0 && info->channels > 0;
    } else {
      fseek(f, sz + (sz & 1), SEEK_CUR);
    }
  }
  return false;
}

// Decode to mono float32 in [-1, 1]. Returns frames decoded or -1.
long decode_wav(const char* path, float* out, long max_frames, int* sr_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_header(f, &info)) { fclose(f); return -1; }
  int bytes_per = info.bits / 8;
  long frames = info.data_bytes / (bytes_per * info.channels);
  if (frames > max_frames) frames = max_frames;
  if (sr_out) *sr_out = info.sample_rate;
  if (!out || frames <= 0) { fclose(f); return frames; }

  fseek(f, info.data_offset, SEEK_SET);
  std::vector<uint8_t> raw((size_t)frames * bytes_per * info.channels);
  size_t got = fread(raw.data(), 1, raw.size(), f);
  fclose(f);
  frames = (long)(got / (bytes_per * info.channels));

  const int ch = info.channels;
  const float inv_ch = 1.0f / (float)ch;
  for (long i = 0; i < frames; ++i) {
    float acc = 0.0f;
    for (int c = 0; c < ch; ++c) {
      const uint8_t* p = raw.data() + ((size_t)i * ch + c) * bytes_per;
      float v = 0.0f;
      if (info.format == 3 && info.bits == 32) {
        float fv;
        memcpy(&fv, p, 4);
        v = fv;
      } else if (info.bits == 16) {
        int16_t s;
        memcpy(&s, p, 2);
        v = (float)s / 32768.0f;
      } else if (info.bits == 32) {
        int32_t s;
        memcpy(&s, p, 4);
        v = (float)s / 2147483648.0f;
      } else if (info.bits == 24) {
        int32_t s = (int32_t)(p[0] | (p[1] << 8) | (p[2] << 16));
        if (s >= (1 << 23)) s -= (1 << 24);
        v = (float)s / 8388608.0f;
      } else if (info.bits == 8) {
        v = ((float)p[0] - 128.0f) / 128.0f;
      }
      acc += v;
    }
    out[i] = acc * inv_ch;
  }
  return frames;
}

// xorshift for crop starts — deterministic per (seed, index)
inline uint64_t mix64(uint64_t x) {
  x ^= x >> 33; x *= 0xff51afd7ed558ccdULL;
  x ^= x >> 33; x *= 0xc4ceb9fe1a85ec53ULL;
  x ^= x >> 33; return x;
}

}  // namespace

extern "C" {

// Peek sample count / rate without decoding. Returns frames or -1.
long nvse_wav_info(const char* path, int* sample_rate) {
  return decode_wav(path, nullptr, 0x7fffffffffffL, sample_rate);
}

// Decode to mono float32. Returns frames written or -1.
long nvse_read_wav(const char* path, float* out, long max_frames,
                   int* sample_rate) {
  return decode_wav(path, out, max_frames, sample_rate);
}

// Assemble a (batch, segment) float32 batch: for each path decode and
// random-crop (zero-pad short files), using `threads` worker threads.
// starts_seed makes crops deterministic per (seed, item). Returns 0 on
// success, else the count of failed items.
int nvse_batch_segments(const char** paths, int batch, long segment,
                        float* out, uint64_t starts_seed, int threads) {
  std::atomic<int> failures{0};
  std::atomic<int> next{0};
  auto work = [&]() {
    std::vector<float> buf;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= batch) return;
      float* dst = out + (size_t)i * segment;
      int sr = 0;
      long frames = nvse_wav_info(paths[i], &sr);
      if (frames < 0) { memset(dst, 0, sizeof(float) * segment); ++failures; continue; }
      if (frames <= segment) {
        long got = nvse_read_wav(paths[i], dst, segment, &sr);
        if (got < 0) { memset(dst, 0, sizeof(float) * segment); ++failures; continue; }
        if (got < segment) memset(dst + got, 0, sizeof(float) * (segment - got));
      } else {
        buf.resize(frames);
        long got = nvse_read_wav(paths[i], buf.data(), frames, &sr);
        if (got < segment) { memset(dst, 0, sizeof(float) * segment); ++failures; continue; }
        long start = (long)(mix64(starts_seed * 0x9E3779B97F4A7C15ULL + i + 1) %
                            (uint64_t)(got - segment + 1));
        memcpy(dst, buf.data() + start, sizeof(float) * segment);
      }
    }
  };
  int n_threads = threads > 0 ? threads : (int)std::thread::hardware_concurrency();
  if (n_threads > batch) n_threads = batch;
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(work);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
