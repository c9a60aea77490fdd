// Lock-free single-producer/single-consumer ring buffer for audio samples.
//
// The native boundary between a real-time audio thread and the inference
// loop — the role PortAudio's callback queue plays in the reference's
// streaming path (reference stream.py:83-129). Wait-free on both sides:
// one atomic load + one atomic store per operation.

#pragma once

#include <atomic>
#include <cstddef>
#include <cstdint>
#include <vector>

namespace trunet {

class RingBuffer {
 public:
  explicit RingBuffer(size_t capacity)
      : buf_(capacity + 1), head_(0), tail_(0) {}

  size_t capacity() const { return buf_.size() - 1; }

  // samples currently readable
  size_t available() const {
    size_t h = head_.load(std::memory_order_acquire);
    size_t t = tail_.load(std::memory_order_acquire);
    return (h + buf_.size() - t) % buf_.size();
  }

  size_t space() const { return capacity() - available(); }

  // producer side: returns samples actually written (may be < n when full)
  size_t push(const float* data, size_t n) {
    size_t h = head_.load(std::memory_order_relaxed);
    size_t t = tail_.load(std::memory_order_acquire);
    size_t free = capacity() - (h + buf_.size() - t) % buf_.size();
    if (n > free) n = free;
    for (size_t i = 0; i < n; ++i) buf_[(h + i) % buf_.size()] = data[i];
    head_.store((h + n) % buf_.size(), std::memory_order_release);
    return n;
  }

  // consumer side: returns samples actually read
  size_t pop(float* out, size_t n) {
    size_t t = tail_.load(std::memory_order_relaxed);
    size_t h = head_.load(std::memory_order_acquire);
    size_t avail = (h + buf_.size() - t) % buf_.size();
    if (n > avail) n = avail;
    for (size_t i = 0; i < n; ++i) out[i] = buf_[(t + i) % buf_.size()];
    tail_.store((t + n) % buf_.size(), std::memory_order_release);
    return n;
  }

 private:
  std::vector<float> buf_;
  std::atomic<size_t> head_;  // write index (producer)
  std::atomic<size_t> tail_;  // read index (consumer)
};

}  // namespace trunet
