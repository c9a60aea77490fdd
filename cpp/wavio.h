// Minimal RIFF/WAVE reader+writer (PCM16, PCM32, float32), host-side.
//
// Native replacement for the data loader's decode path (the reference
// leaned on torchaudio's C++ IO, reference dataset.py:358-359).

#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace trunet {

struct WavData {
  std::vector<float> samples;  // interleaved, normalized to [-1, 1]
  int sample_rate = 0;
  int channels = 0;
};

// returns true on success
bool ReadWav(const std::string& path, WavData* out);
bool WriteWavPcm16(const std::string& path, const float* samples, size_t n,
                   int sample_rate, int channels);

}  // namespace trunet
