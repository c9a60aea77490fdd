#!/usr/bin/env python
"""Side-by-side comparison of two QUALITY.json artifacts for promotion calls.

The retrain pipelines (scripts/round4b_pipeline.sh, round5_pipeline.sh)
write candidate quality reports to /tmp; the session promotes a candidate
over the committed artifact only if it actually improved. This prints the
decision-relevant axes: overall SI-SDR/STOI/PESQ-est gain, every per-kind
row, every per-SNR bucket, and int8 parity.

Usage:
    python scripts/compare_quality.py QUALITY.json /tmp/r4b_QUALITY.json
"""

from __future__ import annotations

import json
import sys


def _gain(block: dict, base: dict, key: str) -> float:
    return block[key] - base[key]


def main(old_path: str, new_path: str) -> None:
    old = json.load(open(old_path))
    new = json.load(open(new_path))

    print(f"{'':24s} {'committed':>10s} {'candidate':>10s} {'delta':>8s}")

    def row(label, o, n):
        print(f"{label:24s} {o:>+10.3f} {n:>+10.3f} {n - o:>+8.3f}")

    for key in ("si_sdr", "stoi", "pesq_wb_est", "fwsegsnr", "llr", "wss"):
        if key in old.get("improvement", {}) and key in new.get("improvement", {}):
            row(f"overall {key}", old["improvement"][key], new["improvement"][key])
    if "si_sdr" in old.get("int8_improvement", {}) and "si_sdr" in new.get(
        "int8_improvement", {}
    ):
        row("int8 si_sdr", old["int8_improvement"]["si_sdr"], new["int8_improvement"]["si_sdr"])

    print("\nper-kind SI-SDR gain (dB):")
    kinds = sorted(set(old["per_noise_kind"]) | set(new["per_noise_kind"]))
    worse = []
    for k in kinds:
        o = old["per_noise_kind"].get(k, {}).get("si_sdr_gain_db", float("nan"))
        n = new["per_noise_kind"].get(k, {}).get("si_sdr_gain_db", float("nan"))
        row(f"  {k}", o, n)
        if n < o - 0.25:
            worse.append(k)

    print("\nper-SNR-bucket SI-SDR gain (dB):")
    neg = []
    for b in old.get("per_snr_bucket", {}):
        o = old["per_snr_bucket"][b]["si_sdr_gain_db"]
        n = new["per_snr_bucket"].get(b, {}).get("si_sdr_gain_db", float("nan"))
        row(f"  {b}", o, n)
        if n < 0:
            neg.append(b)

    print()
    if worse:
        print(f"regressed >0.25 dB: {', '.join(worse)}")
    if neg:
        print(f"NEGATIVE candidate buckets: {', '.join(neg)}")
    if not worse and not neg:
        print("no per-kind regression >0.25 dB, all candidate buckets positive")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2])
