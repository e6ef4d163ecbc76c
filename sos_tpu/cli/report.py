"""Aggregate per-SNR eval results into metric-vs-SNR plots and a table.

Usage:
    python -m sos_tpu.cli.report --results_dir outputs/ [--plot report.png]

Equivalent of model_2 `draw_agg_stats.py` (:10-127): scans
`eval_results_snr*.json`, tabulates the `denoise_statistics` averages per
SNR and (optionally) renders one line plot per metric.
"""

import argparse
import glob
import json
import os
import re
from collections import OrderedDict

METRIC_KEYS = ("avg_l1", "avg_stoi", "avg_csig", "avg_cbak", "avg_covl",
               "avg_pesq", "avg_ssnr_regular", "avg_ssnr_shift",
               "avg_ssnr_clip", "avg_ssnr_exsi", "avg_overall_snr")


def collect(results_dir: str) -> "OrderedDict[float, dict]":
    out = {}
    for path in glob.glob(os.path.join(results_dir, "eval_results*snr*.json")):
        m = re.search(r"_snr(-?[0-9_]+)\.json$", path)
        if not m:
            continue
        snr = float(m.group(1).replace("_", "."))
        with open(path) as fp:
            payload = json.load(fp)
        stats = payload.get("denoise_statistics")
        if stats:
            out[snr] = stats
    return OrderedDict(sorted(out.items()))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--results_dir", type=str, required=True)
    parser.add_argument("--plot", type=str, default=None)
    args = parser.parse_args()
    table = collect(args.results_dir)
    if not table:
        print("no eval_results_snr*.json files found")
        return
    keys = [k for k in METRIC_KEYS if k in next(iter(table.values()))]
    header = "snr_db " + " ".join(k.replace("avg_", "") for k in keys)
    print(header)
    for snr, stats in table.items():
        print(f"{snr:+.0f} " + " ".join(
            f"{stats.get(k, float('nan')):.4f}" for k in keys))
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = len(keys)
        cols = 3
        rows = -(-n // cols)
        fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 3 * rows))
        snrs = list(table.keys())
        for ax, key in zip(axes.flat, keys):
            ax.plot(snrs, [table[s].get(key) for s in snrs], marker="o")
            ax.set_title(key.replace("avg_", ""))
            ax.set_xlabel("input SNR (dB)")
            ax.grid(alpha=0.3)
        for ax in axes.flat[n:]:
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
