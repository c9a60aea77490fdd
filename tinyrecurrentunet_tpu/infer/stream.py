"""Real-time streaming CLI: the working version of the reference's
stream.py (reference `stream.py:18-129`, defect D12 — there, every line of
the callback was stubbed or broken).

Architecture: a producer thread (microphone via sounddevice when available,
else a WAV file paced at real time) feeds the NATIVE stream host's lock-free
input ring; the inference loop pulls hop-sized blocks, runs the jitted
streaming step (TGRU/featurizer state carried), and pushes results to the
output ring, where the consumer (speaker callback or output file) drains
them. Deadline misses are counted as xruns by the native host.

Usage:
    # file-driven real-time simulation (reports RTF + xruns):
    python -m tinyrecurrentunet_tpu.infer.stream -c config/tiny16k.json \
        --input noisy.wav --output enhanced.wav --random_init [--realtime]

    # live duplex audio (requires the sounddevice wheel + PortAudio):
    python -m tinyrecurrentunet_tpu.infer.stream -c config/tiny16k.json --mic
"""

from __future__ import annotations

import argparse
import threading
import time

import numpy as np

from tinyrecurrentunet_tpu.config import Config, load_config
from tinyrecurrentunet_tpu.data.audio_io import read_wav, write_wav
from tinyrecurrentunet_tpu.infer.streaming import StreamingDenoiser


def stream_file(
    cfg: Config,
    variables: dict,
    input_path: str,
    output_path: str,
    realtime: bool = False,
    chunk_frames: int = 1,
) -> dict:
    """Stream a WAV through the native host + jitted step; returns stats."""
    from tinyrecurrentunet_tpu.runtime import StreamHost

    audio, sr = read_wav(input_path)
    if audio.ndim > 1:
        audio = audio[0]
    if sr != cfg.featurizer.sample_rate:
        raise ValueError(f"input is {sr} Hz, config wants {cfg.featurizer.sample_rate}")

    hop = cfg.featurizer.hop_length * chunk_frames
    block_seconds = hop / sr
    pad = (-len(audio)) % hop
    if pad:
        audio = np.pad(audio, (0, pad))
    num_blocks = len(audio) // hop

    sd = StreamingDenoiser(cfg, variables, chunk_frames=chunk_frames)
    state = sd.init_state()
    # warm the compile cache before the clock starts
    _, state = sd.process_block(state, np.zeros(hop, np.float32))
    state = sd.init_state()

    host = StreamHost(block_size=hop)
    stop = threading.Event()

    def producer():
        for i in range(num_blocks):
            if realtime:
                time.sleep(block_seconds)
            block = audio[i * hop : (i + 1) * hop]
            while host.feed(block) < hop and not stop.is_set():
                time.sleep(block_seconds / 4)
        stop.set()

    thread = threading.Thread(target=producer, daemon=True)
    out_blocks = []
    start = time.perf_counter()
    thread.start()
    processed = 0
    while processed < num_blocks:
        block = host.pull_block(starved=realtime)
        if block is None:
            if stop.is_set() and host.pull_block(starved=False) is None:
                time.sleep(0)
            continue
        t0 = time.perf_counter()
        out, state = sd.process_block(state, block)
        out = np.asarray(out)
        host.add_busy(time.perf_counter() - t0)
        host.push_block(out)
        out_blocks.append(host.collect(hop))
        processed += 1
    wall = time.perf_counter() - start
    thread.join(timeout=1.0)

    enhanced = np.concatenate(out_blocks)[: len(audio) - pad if pad else len(audio)]
    write_wav(output_path, enhanced, sr)

    stats = host.stats()
    audio_seconds = num_blocks * block_seconds
    stats.update(
        {
            "audio_seconds": audio_seconds,
            "wall_seconds": wall,
            "rtf_busy": stats["busy_seconds"] / audio_seconds,
            "output": output_path,
        }
    )
    return stats


def stream_microphone(cfg: Config, variables: dict, latency: str = "low"):
    """Live duplex denoising via PortAudio (gated on the sounddevice wheel)."""
    try:
        import sounddevice as sdev
    except ImportError as e:
        raise ImportError(
            "live audio needs the `sounddevice` wheel (PortAudio); in this "
            "environment use --input/--output file streaming instead"
        ) from e

    from tinyrecurrentunet_tpu.runtime import StreamHost

    hop = cfg.featurizer.hop_length
    sr = cfg.featurizer.sample_rate
    sd = StreamingDenoiser(cfg, variables)
    state = sd.init_state()
    _, state = sd.process_block(state, np.zeros(hop, np.float32))
    state = sd.init_state()
    host = StreamHost(block_size=hop)
    stop = threading.Event()

    def callback(indata, outdata, frames, time_info, status):  # noqa: ARG001
        host.feed(indata[:, 0])
        got = host.collect(frames)
        outdata[:, 0] = 0.0
        outdata[: len(got), 0] = got

    def inference_loop():
        nonlocal state
        while not stop.is_set():
            block = host.pull_block(starved=False)
            if block is None:
                time.sleep(0.001)
                continue
            t0 = time.perf_counter()
            out, state = sd.process_block(state, block)
            host.add_busy(time.perf_counter() - t0)
            host.push_block(np.asarray(out))

    thread = threading.Thread(target=inference_loop, daemon=True)
    thread.start()
    with sdev.Stream(
        samplerate=sr, blocksize=hop, channels=1, latency=latency, callback=callback
    ):
        print("streaming... Ctrl-C to stop")
        try:
            while True:
                time.sleep(1.0)
                print(host.stats())
        except KeyboardInterrupt:
            stop.set()


def list_devices() -> list[str]:
    """Audio device inventory (reference `stream.py:28-46` CLI parity).

    With the sounddevice wheel installed this is the PortAudio device
    table (exactly what the reference printed); without it, the native
    stream host's virtual endpoints are listed so the flag still answers
    "what can I stream through here".
    """
    try:
        import sounddevice as sdev

        lines = ["PortAudio devices:"]
        lines.extend(str(sdev.query_devices()).splitlines())
        default = sdev.default.device
        lines.append(f"default (in, out): {default}")
    except Exception:
        # Not just ImportError: a sounddevice wheel without the PortAudio
        # shared library raises OSError at import (ADVICE r3) — either way
        # the native-endpoint listing is the answer.
        lines = [
            "sounddevice/PortAudio wheel not installed; native host endpoints:",
            "  0  ring:input   (StreamHost lock-free SPSC input ring)",
            "  1  ring:output  (StreamHost lock-free SPSC output ring)",
            "  file endpoints: --input/--output WAV streaming "
            "(add --realtime to pace blocks at the hop deadline and count xruns)",
        ]
    return lines


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", default=None)
    parser.add_argument(
        "--list-devices",
        action="store_true",
        help="list audio devices and exit (reference stream.py:28-46)",
    )
    parser.add_argument("--input", default=None)
    parser.add_argument("--output", default="enhanced_stream.wav")
    parser.add_argument("--mic", action="store_true")
    parser.add_argument("--realtime", action="store_true",
                        help="pace file blocks at real time (measures xruns)")
    parser.add_argument("--chunk_frames", type=int, default=1,
                        help="hops per device call (latency/throughput trade)")
    parser.add_argument("--ckpt_iter", default=None)
    parser.add_argument("--random_init", action="store_true")
    parser.add_argument("--latency", default="low")
    args = parser.parse_args()
    if args.list_devices:
        for line in list_devices():
            print(line)
        return
    if not args.config:
        parser.error("-c/--config is required (except with --list-devices)")
    cfg = load_config(args.config)

    if args.random_init:
        from tinyrecurrentunet_tpu.train.state import create_train_state

        state = create_train_state(cfg)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    else:
        from tinyrecurrentunet_tpu.infer.denoise import Denoiser

        variables = Denoiser.from_checkpoint(cfg, args.ckpt_iter).variables

    if args.mic:
        stream_microphone(cfg, variables, args.latency)
    else:
        if not args.input:
            parser.error("--input is required without --mic")
        stats = stream_file(cfg, variables, args.input, args.output, args.realtime, args.chunk_frames)
        for k, v in stats.items():
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()
