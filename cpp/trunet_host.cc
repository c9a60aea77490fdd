// C API for the host runtime: ring buffers, WAV IO, stream-host statistics.
// Consumed from Python via ctypes (tinyrecurrentunet_tpu/runtime/native.py).
//
// This is the framework's native layer — the role PortAudio + torch's
// DataLoader workers play around the reference's compute path (SURVEY.md
// §2.2): moving audio between a real-time producer and the TPU inference
// loop without the GIL in the hot path.

#include <chrono>
#include <cstdint>
#include <cstring>

#include "ringbuffer.h"
#include "wavio.h"

using trunet::RingBuffer;

namespace {

double NowSeconds() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

// Stream host: input + output rings plus deadline accounting for one
// full-duplex streaming session.
struct StreamHost {
  RingBuffer* input;
  RingBuffer* output;
  uint64_t blocks_processed = 0;
  uint64_t input_underruns = 0;   // consumer wanted a block, none ready
  uint64_t output_overruns = 0;   // producer had no space for a block
  double busy_seconds = 0.0;      // time spent inside the model step
  int block_size = 0;
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------- rings --

void* trunet_rb_create(size_t capacity) { return new RingBuffer(capacity); }
void trunet_rb_destroy(void* rb) { delete static_cast<RingBuffer*>(rb); }

size_t trunet_rb_push(void* rb, const float* data, size_t n) {
  return static_cast<RingBuffer*>(rb)->push(data, n);
}
size_t trunet_rb_pop(void* rb, float* out, size_t n) {
  return static_cast<RingBuffer*>(rb)->pop(out, n);
}
size_t trunet_rb_available(void* rb) {
  return static_cast<RingBuffer*>(rb)->available();
}
size_t trunet_rb_space(void* rb) { return static_cast<RingBuffer*>(rb)->space(); }

// ------------------------------------------------------------------ wav --

// Returns number of samples, or -1 on failure. Caller passes a buffer of
// `max_n` floats; *sample_rate/*channels are filled in. Two-call pattern:
// call with max_n=0 to query the size first.
int64_t trunet_wav_read(const char* path, float* out, int64_t max_n,
                        int32_t* sample_rate, int32_t* channels) {
  trunet::WavData data;
  if (!trunet::ReadWav(path, &data)) return -1;
  *sample_rate = data.sample_rate;
  *channels = data.channels;
  int64_t n = static_cast<int64_t>(data.samples.size());
  if (out != nullptr && max_n >= n) {
    std::memcpy(out, data.samples.data(), n * sizeof(float));
  }
  return n;
}

int32_t trunet_wav_write(const char* path, const float* samples, int64_t n,
                         int32_t sample_rate, int32_t channels) {
  return trunet::WriteWavPcm16(path, samples, static_cast<size_t>(n),
                               sample_rate, channels)
             ? 0
             : -1;
}

// ----------------------------------------------------------- stream host --

void* trunet_host_create(int block_size, int capacity_blocks) {
  auto* host = new StreamHost();
  host->block_size = block_size;
  host->input = new RingBuffer(static_cast<size_t>(block_size) * capacity_blocks);
  host->output = new RingBuffer(static_cast<size_t>(block_size) * capacity_blocks);
  return host;
}

void trunet_host_destroy(void* h) {
  auto* host = static_cast<StreamHost*>(h);
  delete host->input;
  delete host->output;
  delete host;
}

// producer side (audio thread): feed captured samples, take back rendered
// ones. Returns samples moved.
size_t trunet_host_feed(void* h, const float* data, size_t n) {
  return static_cast<StreamHost*>(h)->input->push(data, n);
}
size_t trunet_host_collect(void* h, float* out, size_t n) {
  return static_cast<StreamHost*>(h)->output->pop(out, n);
}

// consumer side (inference loop): pull one block if ready (returns 1), else
// records an underrun when starved=true and returns 0.
int32_t trunet_host_pull_block(void* h, float* out, int32_t starved) {
  auto* host = static_cast<StreamHost*>(h);
  size_t bs = static_cast<size_t>(host->block_size);
  if (host->input->available() < bs) {
    if (starved) host->input_underruns++;
    return 0;
  }
  host->input->pop(out, bs);
  return 1;
}

int32_t trunet_host_push_block(void* h, const float* data) {
  auto* host = static_cast<StreamHost*>(h);
  size_t bs = static_cast<size_t>(host->block_size);
  if (host->output->space() < bs) {
    host->output_overruns++;
    return 0;
  }
  host->output->push(data, bs);
  host->blocks_processed++;
  return 1;
}

void trunet_host_add_busy(void* h, double seconds) {
  static_cast<StreamHost*>(h)->busy_seconds += seconds;
}

// stats: [blocks, underruns, overruns, busy_seconds]
void trunet_host_stats(void* h, double* out4) {
  auto* host = static_cast<StreamHost*>(h);
  out4[0] = static_cast<double>(host->blocks_processed);
  out4[1] = static_cast<double>(host->input_underruns);
  out4[2] = static_cast<double>(host->output_overruns);
  out4[3] = host->busy_seconds;
}

double trunet_now_seconds() { return NowSeconds(); }

}  // extern "C"
