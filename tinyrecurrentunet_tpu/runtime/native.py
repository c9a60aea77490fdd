"""ctypes bindings for the C++ host runtime (cpp/libtrunet_host.so).

The native layer owns the real-time boundary — lock-free SPSC ring buffers
between an audio producer thread and the TPU inference loop, WAV decode for
the data pipeline, deadline/xrun statistics — the role PortAudio +
torchaudio's C++ played around the reference (SURVEY.md §2.2). Pure-Python
fallbacks exist for WAV IO (data/audio_io.py); the ring buffer / stream
host have no fallback because their reason to exist is native wait-free
behavior.

The library auto-builds from cpp/ with `make` on first use when a toolchain
is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_CPP_DIR = os.path.join(_REPO_ROOT, "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libtrunet_host.so")

_lock = threading.Lock()
_lib = None
_load_error: Exception | None = None


def _build() -> None:
    subprocess.run(
        ["make", "-s"], cwd=_CPP_DIR, check=True, capture_output=True, text=True
    )


def load_native() -> ctypes.CDLL:
    """Load (building if needed) the native library; raises on failure."""
    global _lib, _load_error
    with _lock:
        if _lib is not None:
            return _lib
        if _load_error is not None:
            raise _load_error
        try:
            if not os.path.exists(_LIB_PATH):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            _configure(lib)
            _lib = lib
            return lib
        except Exception as e:  # noqa: BLE001 - record and re-raise
            _load_error = e
            raise


def native_available() -> bool:
    try:
        load_native()
        return True
    except Exception:  # noqa: BLE001
        return False


def _configure(lib: ctypes.CDLL) -> None:
    c = ctypes
    fp = c.POINTER(c.c_float)
    lib.trunet_rb_create.restype = c.c_void_p
    lib.trunet_rb_create.argtypes = [c.c_size_t]
    lib.trunet_rb_destroy.argtypes = [c.c_void_p]
    for name in ("trunet_rb_push", "trunet_rb_pop"):
        fn = getattr(lib, name)
        fn.restype = c.c_size_t
        fn.argtypes = [c.c_void_p, fp, c.c_size_t]
    for name in ("trunet_rb_available", "trunet_rb_space"):
        fn = getattr(lib, name)
        fn.restype = c.c_size_t
        fn.argtypes = [c.c_void_p]

    lib.trunet_wav_read.restype = c.c_int64
    lib.trunet_wav_read.argtypes = [
        c.c_char_p, fp, c.c_int64, c.POINTER(c.c_int32), c.POINTER(c.c_int32),
    ]
    lib.trunet_wav_write.restype = c.c_int32
    lib.trunet_wav_write.argtypes = [c.c_char_p, fp, c.c_int64, c.c_int32, c.c_int32]

    lib.trunet_host_create.restype = c.c_void_p
    lib.trunet_host_create.argtypes = [c.c_int32, c.c_int32]
    lib.trunet_host_destroy.argtypes = [c.c_void_p]
    lib.trunet_host_feed.restype = c.c_size_t
    lib.trunet_host_feed.argtypes = [c.c_void_p, fp, c.c_size_t]
    lib.trunet_host_collect.restype = c.c_size_t
    lib.trunet_host_collect.argtypes = [c.c_void_p, fp, c.c_size_t]
    lib.trunet_host_pull_block.restype = c.c_int32
    lib.trunet_host_pull_block.argtypes = [c.c_void_p, fp, c.c_int32]
    lib.trunet_host_push_block.restype = c.c_int32
    lib.trunet_host_push_block.argtypes = [c.c_void_p, fp]
    lib.trunet_host_add_busy.argtypes = [c.c_void_p, c.c_double]
    lib.trunet_host_stats.argtypes = [c.c_void_p, c.POINTER(c.c_double)]
    lib.trunet_now_seconds.restype = c.c_double


class NativeLib:
    """Convenience namespace over the raw CDLL."""

    def __init__(self):
        self.lib = load_native()

    def wav_read(self, path: str):
        sr = ctypes.c_int32()
        ch = ctypes.c_int32()
        n = self.lib.trunet_wav_read(path.encode(), None, 0, ctypes.byref(sr), ctypes.byref(ch))
        if n < 0:
            raise IOError(f"native wav read failed: {path}")
        buf = np.empty(n, np.float32)
        got = self.lib.trunet_wav_read(
            path.encode(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
            ctypes.byref(sr),
            ctypes.byref(ch),
        )
        if got != n:
            raise IOError(f"native wav re-read mismatch: {path}")
        data = buf.reshape(-1, ch.value).T if ch.value > 1 else buf
        return data, int(sr.value)

    def wav_write(self, path: str, samples: np.ndarray, sample_rate: int, channels: int = 1):
        samples = np.ascontiguousarray(samples, np.float32)
        rc = self.lib.trunet_wav_write(
            path.encode(),
            samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            samples.size,
            sample_rate,
            channels,
        )
        if rc != 0:
            raise IOError(f"native wav write failed: {path}")


class RingBuffer:
    """SPSC lock-free float ring buffer (native)."""

    def __init__(self, capacity: int):
        self._lib = load_native()
        self._ptr = ctypes.c_void_p(self._lib.trunet_rb_create(capacity))

    def push(self, data: np.ndarray) -> int:
        data = np.ascontiguousarray(data, np.float32)
        return self._lib.trunet_rb_push(
            self._ptr, data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), data.size
        )

    def pop(self, n: int) -> np.ndarray:
        out = np.empty(n, np.float32)
        got = self._lib.trunet_rb_pop(
            self._ptr, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
        )
        return out[:got]

    @property
    def available(self) -> int:
        return self._lib.trunet_rb_available(self._ptr)

    @property
    def space(self) -> int:
        return self._lib.trunet_rb_space(self._ptr)

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.trunet_rb_destroy(self._ptr)
            self._ptr = None


class StreamHost:
    """Native full-duplex stream host: input/output rings + xrun stats."""

    def __init__(self, block_size: int, capacity_blocks: int = 64):
        self._lib = load_native()
        self.block_size = block_size
        self._ptr = ctypes.c_void_p(
            self._lib.trunet_host_create(block_size, capacity_blocks)
        )

    # ---- producer (audio/file thread) ----
    def feed(self, samples: np.ndarray) -> int:
        samples = np.ascontiguousarray(samples, np.float32)
        return self._lib.trunet_host_feed(
            self._ptr,
            samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            samples.size,
        )

    def collect(self, n: int) -> np.ndarray:
        out = np.empty(n, np.float32)
        got = self._lib.trunet_host_collect(
            self._ptr, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
        )
        return out[:got]

    # ---- consumer (inference loop) ----
    def pull_block(self, starved: bool = True):
        out = np.empty(self.block_size, np.float32)
        ok = self._lib.trunet_host_pull_block(
            self._ptr,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            1 if starved else 0,
        )
        return out if ok else None

    def push_block(self, block: np.ndarray) -> bool:
        block = np.ascontiguousarray(block, np.float32)
        assert block.size == self.block_size
        return bool(
            self._lib.trunet_host_push_block(
                self._ptr, block.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
        )

    def add_busy(self, seconds: float):
        self._lib.trunet_host_add_busy(self._ptr, seconds)

    def stats(self) -> dict:
        buf = (ctypes.c_double * 4)()
        self._lib.trunet_host_stats(self._ptr, buf)
        return {
            "blocks_processed": int(buf[0]),
            "input_underruns": int(buf[1]),
            "output_overruns": int(buf[2]),
            "busy_seconds": float(buf[3]),
        }

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.trunet_host_destroy(self._ptr)
            self._ptr = None
