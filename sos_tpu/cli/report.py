"""Aggregate per-SNR eval results into metric-vs-SNR plots and a table,
and render training curves from the fit() metrics log.

Usage:
    python -m sos_tpu.cli.report --results_dir outputs/ [--plot report.png]
    python -m sos_tpu.cli.report --train_log <log_dir> \
        [--train_plot curves.png]

Equivalent of model_2 `draw_agg_stats.py` (:10-127) for the per-SNR
table/plots; the training-curve view renders the durable
`metrics.jsonl` written by train/fit.py (train/val loss, steps/sec,
epoch validation metrics) — the dashboard the reference only had via a
live tensorboard process.
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


def load_train_log(path: str):
    """path: a metrics.jsonl file or the log dir containing it.

    The log is append-mode across crash-resumes, so replayed steps can
    appear twice (pre-crash rows, then the resumed run's rows): keep the
    LAST row per (kind, step/epoch) and return in step order."""
    if os.path.isdir(path):
        path = os.path.join(path, "metrics.jsonl")
    latest = {}
    with open(path) as fp:
        for line in fp:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            key = (r["kind"],
                   r["epoch"] if r["kind"] == "epoch" else r["step"])
            latest[key] = r
    return sorted(latest.values(),
                  key=lambda r: (r["step"], r["epoch"], r["kind"]))


def train_report(rows, plot_path=None) -> None:
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r)
    train = by_kind.get("train", [])
    val = by_kind.get("val", [])
    epochs = by_kind.get("epoch", [])
    if train:
        last = train[-1]
        keys = [k for k in last if k not in ("kind", "step", "epoch")]
        print(f"train: {len(train)} logged steps, last step {last['step']}: "
              + " ".join(f"{k}={last[k]:.5g}" for k in keys))
    if epochs:
        skip = ("kind", "step", "epoch", "ckpt_epoch")
        last = epochs[-1]
        keys = [k for k in last if k not in skip]
        print(f"epoch {last['epoch']}: "
              + " ".join(f"{k}={last[k]:.5g}" for k in keys))
        for key in keys:
            # loss-style metrics: lower is better
            lower = any(t in key for t in ("loss", "stage", "l1", "wss",
                                           "llr"))
            series = [(r, r[key]) for r in epochs if key in r]
            best_r, best_v = (min if lower else max)(series,
                                                     key=lambda t: t[1])
            which = "min" if lower else "max"
            ck = best_r.get("ckpt_epoch")
            ck_s = f" (ckpt_epoch{ck})" if ck is not None else ""
            print(f"  best({which}) epoch_{key}: {best_v:.5g} "
                  f"@ epoch {best_r['epoch']}{ck_s}")
    if plot_path:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        metric_keys = []
        for r in train + val:
            for k in r:
                if k not in ("kind", "step", "epoch") and k not in metric_keys:
                    metric_keys.append(k)
        epoch_keys = []
        for r in epochs:
            for k in r:
                if (k not in ("kind", "step", "epoch", "ckpt_epoch")
                        and k not in epoch_keys):
                    epoch_keys.append(k)
        n = len(metric_keys) + len(epoch_keys)
        cols = 3
        rows_n = max(1, -(-n // cols))
        fig, axes = plt.subplots(rows_n, cols,
                                 figsize=(4 * cols, 3 * rows_n),
                                 squeeze=False)
        flat = axes.flat
        for i, key in enumerate(metric_keys):
            ax = flat[i]
            for kind, series, style in (("train", train, "-"),
                                        ("val", val, "--")):
                pts = [(r["step"], r[key]) for r in series if key in r]
                if pts:
                    ax.plot(*zip(*pts), style, label=kind, alpha=0.8)
            ax.set_title(key)
            ax.set_xlabel("step")
            ax.legend(fontsize=7)
            ax.grid(alpha=0.3)
        for j, key in enumerate(epoch_keys):
            ax = flat[len(metric_keys) + j]
            pts = [(r["epoch"], r[key]) for r in epochs if key in r]
            ax.plot(*zip(*pts), marker="o")
            ax.set_title(f"epoch {key}")
            ax.set_xlabel("epoch")
            ax.grid(alpha=0.3)
        for ax in list(flat)[n:]:
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(plot_path, dpi=120)
        print(f"wrote {plot_path}")


def compare_evals(path_a: str, path_b: str) -> None:
    """Per-SNR metric deltas between two eval JSONs (e.g. the f32 and
    int8 outputs of `cli.eval_synthetic --out`): certifies a serving
    profile's quality cost in one command."""
    with open(path_a) as fp:
        a = json.load(fp)
    with open(path_b) as fp:
        b = json.load(fp)
    name_a = os.path.basename(path_a)
    name_b = os.path.basename(path_b)
    print(f"delta = {name_b} - {name_a}")
    for snr_key in sorted(set(a) & set(b),
                          key=lambda k: float(k.split("_", 1)[1])):
        keys = [k for k in a[snr_key]
                if k.startswith("avg_") and k in b[snr_key]]
        deltas = " ".join(
            f"{k.replace('avg_', '')}{b[snr_key][k] - a[snr_key][k]:+.4f}"
            for k in keys)
        print(f"{snr_key}: {deltas}")
    only = sorted((set(a) | set(b)) - (set(a) & set(b)))
    if only:
        print(f"(SNRs present in only one file: {only})")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--results_dir", type=str, default=None)
    parser.add_argument("--plot", type=str, default=None)
    parser.add_argument("--train_log", type=str, default=None,
                        help="metrics.jsonl (or its log dir) from training")
    parser.add_argument("--train_plot", type=str, default=None)
    parser.add_argument("--compare", type=str, nargs=2, default=None,
                        metavar=("BASE.json", "OTHER.json"),
                        help="print per-SNR metric deltas between two "
                             "eval_synthetic --out files (profile "
                             "certification)")
    args = parser.parse_args()
    if args.compare:
        compare_evals(*args.compare)
    if args.train_log:
        train_report(load_train_log(args.train_log), args.train_plot)
    if not args.results_dir:
        if not (args.train_log or args.compare):
            parser.error("need --results_dir, --train_log and/or --compare")
        return
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
