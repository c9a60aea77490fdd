#include "wavio.h"

#include <cstdio>
#include <cstring>

namespace trunet {

namespace {

struct ChunkHeader {
  char id[4];
  uint32_t size;
};

bool ReadExact(FILE* f, void* dst, size_t n) {
  return std::fread(dst, 1, n, f) == n;
}

}  // namespace

bool ReadWav(const std::string& path, WavData* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;

  char riff[4], wave[4];
  uint32_t riff_size;
  if (!ReadExact(f, riff, 4) || !ReadExact(f, &riff_size, 4) ||
      !ReadExact(f, wave, 4) || std::memcmp(riff, "RIFF", 4) != 0 ||
      std::memcmp(wave, "WAVE", 4) != 0) {
    std::fclose(f);
    return false;
  }

  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  bool have_fmt = false;

  ChunkHeader ch;
  while (ReadExact(f, &ch, sizeof(ch))) {
    if (std::memcmp(ch.id, "fmt ", 4) == 0) {
      std::vector<uint8_t> fmt(ch.size);
      if (!ReadExact(f, fmt.data(), ch.size) || ch.size < 16) break;
      std::memcpy(&format, fmt.data() + 0, 2);
      std::memcpy(&channels, fmt.data() + 2, 2);
      std::memcpy(&sample_rate, fmt.data() + 4, 4);
      std::memcpy(&bits, fmt.data() + 14, 2);
      have_fmt = true;
    } else if (std::memcmp(ch.id, "data", 4) == 0 && have_fmt) {
      std::vector<uint8_t> raw(ch.size);
      if (!ReadExact(f, raw.data(), ch.size)) break;
      std::fclose(f);

      size_t n;
      out->sample_rate = static_cast<int>(sample_rate);
      out->channels = static_cast<int>(channels);
      if (format == 1 && bits == 16) {
        n = ch.size / 2;
        out->samples.resize(n);
        const int16_t* p = reinterpret_cast<const int16_t*>(raw.data());
        for (size_t i = 0; i < n; ++i) out->samples[i] = p[i] / 32768.0f;
      } else if (format == 1 && bits == 32) {
        n = ch.size / 4;
        out->samples.resize(n);
        const int32_t* p = reinterpret_cast<const int32_t*>(raw.data());
        for (size_t i = 0; i < n; ++i)
          out->samples[i] = static_cast<float>(p[i] / 2147483648.0);
      } else if (format == 3 && bits == 32) {
        n = ch.size / 4;
        out->samples.resize(n);
        std::memcpy(out->samples.data(), raw.data(), ch.size);
      } else {
        return false;
      }
      return true;
    } else {
      // skip unknown chunk (word-aligned)
      std::fseek(f, static_cast<long>(ch.size + (ch.size & 1)), SEEK_CUR);
    }
  }
  std::fclose(f);
  return false;
}

bool WriteWavPcm16(const std::string& path, const float* samples, size_t n,
                   int sample_rate, int channels) {
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) return false;

  uint32_t data_size = static_cast<uint32_t>(n * 2);
  uint32_t riff_size = 36 + data_size;
  uint16_t fmt = 1, bits = 16, ch = static_cast<uint16_t>(channels);
  uint32_t sr = static_cast<uint32_t>(sample_rate);
  uint32_t byte_rate = sr * ch * 2;
  uint16_t block_align = ch * 2;
  uint32_t fmt_size = 16;

  std::fwrite("RIFF", 1, 4, f);
  std::fwrite(&riff_size, 4, 1, f);
  std::fwrite("WAVE", 1, 4, f);
  std::fwrite("fmt ", 1, 4, f);
  std::fwrite(&fmt_size, 4, 1, f);
  std::fwrite(&fmt, 2, 1, f);
  std::fwrite(&ch, 2, 1, f);
  std::fwrite(&sr, 4, 1, f);
  std::fwrite(&byte_rate, 4, 1, f);
  std::fwrite(&block_align, 2, 1, f);
  std::fwrite(&bits, 2, 1, f);
  std::fwrite("data", 1, 4, f);
  std::fwrite(&data_size, 4, 1, f);

  std::vector<int16_t> pcm(n);
  for (size_t i = 0; i < n; ++i) {
    float v = samples[i];
    if (v > 1.0f) v = 1.0f;
    if (v < -1.0f) v = -1.0f;
    pcm[i] = static_cast<int16_t>(v * 32767.0f);
  }
  std::fwrite(pcm.data(), 2, n, f);
  std::fclose(f);
  return true;
}

}  // namespace trunet
