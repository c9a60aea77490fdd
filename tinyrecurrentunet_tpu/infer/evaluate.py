"""DNS-testset evaluation (reference `eval.py:16-57`).

Walks clean/enhanced (or clean/noisy baseline) pairs and reports
length-weighted mean PESQ-WB/NB (when the pesq wheel is present), STOI
(first-party implementation), and SI-SDR.

Usage:
    python -m tinyrecurrentunet_tpu.infer.evaluate -t <testset_root> \
        -e <enhanced_dir> [--target enhanced|noisy] [--sample_rate 16000]
"""

from __future__ import annotations

import argparse
import os

from tinyrecurrentunet_tpu.data.audio_io import read_wav
from tinyrecurrentunet_tpu.infer.metrics import pesq_score, si_sdr, stoi


def evaluate_dns(
    testset_path: str,
    enhanced_path: str | None = None,
    target: str = "enhanced",
    sample_rate: int = 16000,
    max_files: int | None = None,
):
    """Returns a dict of length-weighted mean metrics.

    testset_path points at the DNS no-reverb layout (clean/ + noisy/), or
    any directory with clean/ and noisy/ subdirs; enhanced files are matched
    by the trailing fileid like the reference (`eval.py:24-28`).
    """
    base = os.path.join(testset_path, "datasets/test_set/synthetic/no_reverb")
    if not os.path.isdir(base):
        base = testset_path
    clean_dir = os.path.join(base, "clean")
    clean_files = sorted(os.listdir(clean_dir))
    if max_files:
        clean_files = clean_files[:max_files]

    try:
        import pesq  # noqa: F401

        has_pesq = True
    except ImportError:
        has_pesq = False

    totals = {"pesq_wb": 0.0, "pesq_nb": 0.0, "stoi": 0.0, "si_sdr": 0.0}
    weights = 0.0
    for name in clean_files:
        fileid = name.split("_")[-1]  # fileid_<n>.wav tail
        clean, sr = read_wav(os.path.join(clean_dir, name))
        if target == "noisy" or enhanced_path is None:
            cand_dir = os.path.join(base, "noisy")
            cand = next(
                f for f in os.listdir(cand_dir) if f.endswith(fileid)
            )
            est, _ = read_wav(os.path.join(cand_dir, cand))
        else:
            cand = next(
                f for f in os.listdir(enhanced_path) if f.endswith(fileid)
            )
            est, _ = read_wav(os.path.join(enhanced_path, cand))
        sr = sample_rate or sr
        n = min(len(clean), len(est))
        clean, est = clean[:n], est[:n]

        length = n
        totals["stoi"] += stoi(clean, est, sr) * length
        totals["si_sdr"] += si_sdr(est, clean) * length
        if has_pesq:
            totals["pesq_wb"] += pesq_score(clean, est, sr, "wb") * length
            totals["pesq_nb"] += pesq_score(clean, est, sr, "nb") * length
        weights += length

    result = {k: v / weights for k, v in totals.items() if v != 0.0 or k in ("si_sdr",)}
    if not has_pesq:
        result["pesq_note"] = "pesq wheel not installed; PESQ skipped"
    result["num_files"] = len(clean_files)
    return result


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-t", "--testset", required=True)
    parser.add_argument("-e", "--enhanced", default=None)
    parser.add_argument("--target", default="enhanced", choices=["enhanced", "noisy"])
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument("--max_files", type=int, default=None)
    args = parser.parse_args()
    result = evaluate_dns(
        args.testset, args.enhanced, args.target, args.sample_rate, args.max_files
    )
    for k, v in result.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
