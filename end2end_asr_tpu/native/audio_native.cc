// Native runtime helpers for end2end_asr_tpu, exposed via a C ABI and
// loaded from Python with ctypes (see end2end_asr_tpu/native/__init__.py).
//
// Replaces the reference's out-of-process native dependencies:
//   * torchaudio's C++ WAV decode        (utils/audio.py:8)
//   * `soxi -D` duration subprocess      (utils/audio.py:17-20)
//   * `sox` resample/tempo/gain subprocess-per-utterance
//                                        (utils/audio.py:22-61)
//   * python-Levenshtein C extension     (utils/metrics.py:3)
//
// Build: make -C end2end_asr_tpu/native   (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// WAV decode (RIFF/WAVE: PCM 8/16/24/32-bit and IEEE float32)
// ---------------------------------------------------------------------------

struct WavInfo {
  int32_t sample_rate;
  int32_t num_channels;
  int64_t num_frames;  // per channel
};

static bool read_header(FILE* f, WavInfo* info, int32_t* audio_format,
                        int32_t* bits, long* data_offset, int64_t* data_size) {
  char tag[4];
  uint32_t sz;
  if (fread(tag, 1, 4, f) != 4 || memcmp(tag, "RIFF", 4) != 0) return false;
  if (fread(&sz, 4, 1, f) != 1) return false;
  if (fread(tag, 1, 4, f) != 4 || memcmp(tag, "WAVE", 4) != 0) return false;

  bool have_fmt = false, have_data = false;
  uint16_t fmt = 0, channels = 0, bps = 0;
  uint32_t rate = 0;
  while (!have_data) {
    if (fread(tag, 1, 4, f) != 4) break;
    if (fread(&sz, 4, 1, f) != 1) break;
    if (memcmp(tag, "fmt ", 4) == 0) {
      uint16_t block_align;
      uint32_t byte_rate;
      if (fread(&fmt, 2, 1, f) != 1) return false;
      if (fread(&channels, 2, 1, f) != 1) return false;
      if (fread(&rate, 4, 1, f) != 1) return false;
      if (fread(&byte_rate, 4, 1, f) != 1) return false;
      if (fread(&block_align, 2, 1, f) != 1) return false;
      if (fread(&bps, 2, 1, f) != 1) return false;
      if (fmt == 0xFFFE && sz >= 40) {
        // WAVE_FORMAT_EXTENSIBLE: the REAL format code is the first
        // 2 bytes of the SubFormat GUID (1 = PCM, 3 = IEEE float) —
        // mapping everything to PCM would decode extensible float32
        // as int32 garbage.
        uint16_t cb, valid_bits, sub;
        uint32_t channel_mask;
        if (fread(&cb, 2, 1, f) != 1) return false;
        if (fread(&valid_bits, 2, 1, f) != 1) return false;
        if (fread(&channel_mask, 4, 1, f) != 1) return false;
        if (fread(&sub, 2, 1, f) != 1) return false;
        fmt = sub;
        if (sz > 26) fseek(f, sz - 26, SEEK_CUR);
      } else if (sz > 16) {
        fseek(f, sz - 16, SEEK_CUR);
      }
      have_fmt = true;
    } else if (memcmp(tag, "data", 4) == 0) {
      *data_offset = ftell(f);
      *data_size = sz;
      have_data = true;
    } else {
      fseek(f, sz + (sz & 1), SEEK_CUR);
    }
  }
  if (!have_fmt || !have_data || channels == 0) return false;
  // Only whole-byte sample widths we can actually decode; anything
  // else (4-bit ADPCM, a/mu-law, float64) fails here so the callers'
  // Python fallback engages instead of SIGFPE (bps/8 == 0) or silent
  // garbage from the wrong branch of the sample loop.
  bool supported = (fmt == 1 && (bps == 8 || bps == 16 || bps == 24 ||
                                 bps == 32)) ||
                   (fmt == 3 && bps == 32);
  if (!supported) return false;
  info->sample_rate = (int32_t)rate;
  info->num_channels = (int32_t)channels;
  info->num_frames = *data_size / (channels * (bps / 8));
  *audio_format = fmt;
  *bits = bps;
  return true;
}

// Returns number of mono frames written (>=0), or -1 on failure.
// out must have capacity max_frames floats. Mean-downmixes channels and
// normalizes to [-1, 1] (torchaudio normalization=True semantics).
int64_t wav_decode(const char* path, float* out, int64_t max_frames,
                   int32_t* sample_rate_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  int32_t fmt = 0, bits = 0;
  long off = 0;
  int64_t dsize = 0;
  if (!read_header(f, &info, &fmt, &bits, &off, &dsize)) { fclose(f); return -1; }
  if (sample_rate_out) *sample_rate_out = info.sample_rate;
  int64_t frames = info.num_frames;
  if (frames > max_frames) frames = max_frames;
  fseek(f, off, SEEK_SET);

  const int C = info.num_channels;
  const int bytes = bits / 8;
  std::vector<uint8_t> buf((size_t)frames * C * bytes);
  size_t got = fread(buf.data(), 1, buf.size(), f);
  fclose(f);
  int64_t got_frames = (int64_t)(got / (C * bytes));

  for (int64_t i = 0; i < got_frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < C; ++c) {
      const uint8_t* p = buf.data() + ((size_t)i * C + c) * bytes;
      double v = 0.0;
      if (fmt == 3 && bits == 32) {  // IEEE float
        float fv;
        memcpy(&fv, p, 4);
        v = fv;
      } else if (bits == 16) {
        int16_t s;
        memcpy(&s, p, 2);
        v = s / 32768.0;
      } else if (bits == 32) {
        int32_t s;
        memcpy(&s, p, 4);
        v = s / 2147483648.0;
      } else if (bits == 24) {
        int32_t s = (p[0] << 8) | (p[1] << 16) | ((int32_t)(int8_t)p[2] << 24);
        v = (s >> 8) / 8388608.0;
      } else if (bits == 8) {
        v = ((int)p[0] - 128) / 128.0;
      }
      acc += v;
    }
    out[i] = (float)(acc / C);
  }
  return got_frames;
}

// Duration in seconds, or -1.0 on failure (soxi -D replacement).
double wav_duration(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1.0;
  WavInfo info;
  int32_t fmt, bits;
  long off;
  int64_t dsize;
  bool ok = read_header(f, &info, &fmt, &bits, &off, &dsize);
  fclose(f);
  if (!ok || info.sample_rate <= 0) return -1.0;
  return (double)info.num_frames / info.sample_rate;
}

int64_t wav_num_frames(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  int32_t fmt, bits;
  long off;
  int64_t dsize;
  bool ok = read_header(f, &info, &fmt, &bits, &off, &dsize);
  fclose(f);
  return ok ? info.num_frames : -1;
}

// ---------------------------------------------------------------------------
// Linear resampler
// ---------------------------------------------------------------------------

int64_t resample_linear(const float* in, int64_t n_in, int32_t sr_in,
                        int32_t sr_out, float* out, int64_t max_out) {
  if (n_in <= 1 || sr_in <= 0 || sr_out <= 0) return -1;
  int64_t n_out = (int64_t)llround((double)n_in * sr_out / sr_in);
  if (n_out > max_out) n_out = max_out;
  double step = (double)(n_in - 1) / (n_out > 1 ? (n_out - 1) : 1);
  for (int64_t i = 0; i < n_out; ++i) {
    double x = i * step;
    int64_t i0 = (int64_t)x;
    if (i0 >= n_in - 1) { out[i] = in[n_in - 1]; continue; }
    double frac = x - i0;
    out[i] = (float)(in[i0] * (1.0 - frac) + in[i0 + 1] * frac);
  }
  return n_out;
}

// ---------------------------------------------------------------------------
// WSOLA tempo change (pitch-preserving), sox-tempo-class functionality
// ---------------------------------------------------------------------------

int64_t tempo_wsola(const float* in, int64_t n_in, float tempo,
                    int32_t sample_rate, float* out, int64_t max_out) {
  if (tempo <= 0.f || n_in <= 0) return -1;
  int64_t win = (int64_t)(0.030 * sample_rate);
  win -= win % 2;
  if (win < 32) win = 32;
  const int64_t hop_out = win / 2;
  const double hop_in = tempo * (double)hop_out;
  const int64_t seek = (int64_t)(0.010 * sample_rate);
  int64_t n_out = (int64_t)(n_in / tempo);
  if (n_out > max_out) n_out = max_out;

  if (n_in < 2 * win) {  // too short: linear stretch
    return resample_linear(in, n_in, sample_rate,
                           (int32_t)(sample_rate / tempo), out, max_out);
  }

  std::vector<float> window(win), acc(n_out + win, 0.f), norm(n_out + win, 0.f);
  for (int64_t i = 0; i < win; ++i)
    window[i] = 0.5f - 0.5f * cosf(2.f * (float)M_PI * i / (win - 1));

  std::vector<float> prev(win);
  for (int64_t i = 0; i < win; ++i) prev[i] = in[i] * window[i];
  for (int64_t i = 0; i < win; ++i) { acc[i] += prev[i]; norm[i] += window[i]; }

  int64_t t_out = hop_out;
  double pos = 0.0;
  while (t_out + win <= n_out) {
    pos += hop_in;
    int64_t center = (int64_t)pos;
    int64_t lo = center - seek; if (lo < 0) lo = 0;
    int64_t hi = center + seek; if (hi > n_in - win) hi = n_in - win;
    if (hi <= lo) break;
    const float* target = prev.data() + hop_out;
    const int64_t tail = win - hop_out;
    int64_t best = lo;
    double best_score = -1e30;
    for (int64_t c = lo; c < hi; ++c) {
      double s = 0.0;
      const float* seg = in + c;
      for (int64_t i = 0; i < tail; ++i) s += seg[i] * target[i];
      if (s > best_score) { best_score = s; best = c; }
    }
    for (int64_t i = 0; i < win; ++i) {
      float v = in[best + i] * window[i];
      acc[t_out + i] += v;
      norm[t_out + i] += window[i];
      prev[i] = v;
    }
    t_out += hop_out;
  }
  for (int64_t i = 0; i < n_out; ++i)
    out[i] = acc[i] / (norm[i] > 1e-6f ? norm[i] : 1e-6f);
  return n_out;
}

// ---------------------------------------------------------------------------
// Levenshtein distance over uint32 code points (CER/WER backend,
// replaces the python-Levenshtein C extension)
// ---------------------------------------------------------------------------

int64_t edit_distance_u32(const uint32_t* a, int64_t na,
                          const uint32_t* b, int64_t nb) {
  if (na == 0) return nb;
  if (nb == 0) return na;
  std::vector<int64_t> row(nb + 1);
  for (int64_t j = 0; j <= nb; ++j) row[j] = j;
  for (int64_t i = 1; i <= na; ++i) {
    int64_t prev = row[0];
    row[0] = i;
    for (int64_t j = 1; j <= nb; ++j) {
      int64_t cur = row[j];
      int64_t cost = (a[i - 1] == b[j - 1]) ? 0 : 1;
      int64_t v = prev + cost;
      if (row[j] + 1 < v) v = row[j] + 1;
      if (row[j - 1] + 1 < v) v = row[j - 1] + 1;
      row[j] = v;
      prev = cur;
    }
  }
  return row[nb];
}

}  // extern "C"
