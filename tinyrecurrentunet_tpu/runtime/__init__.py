"""Native host runtime bindings (C++ ring buffers, WAV IO, stream host)."""

from tinyrecurrentunet_tpu.runtime.native import (  # noqa: F401
    NativeLib,
    RingBuffer,
    StreamHost,
    load_native,
    native_available,
)
