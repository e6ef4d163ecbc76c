"""bf16-training certification: f32 vs bf16/no-remat at matched steps, 3 seeds.

VERDICT r2 weak #6: the 2.4x bf16 train-step win was backed by a single
quality run. This harness trains the denoiser from scratch under both
compute dtypes at MATCHED step counts across >= 3 seeds and evaluates
STOI/PESQ/overall-SNR per SNR through `cli.eval_synthetic` (ground-truth
intervals), recording mean +/- spread so the bf16 recommendation rests
on a distribution, not a point.

Usage (real chip; ~2 h wall):
    python experiments/make_corpus.py --out /tmp/e2e_exp
    python experiments/bf16_cert.py --corpus /tmp/e2e_exp \
        --out experiments/bf16_cert_results.json \
        [--seeds 0 1 2] [--epochs 20] [--batch_size 20]

Results land in docs/EXPERIMENTS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def run_cli(module_name: str, argv: list) -> None:
    import importlib

    mod = importlib.import_module(f"sos_tpu.cli.{module_name}")
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", type=str, required=True)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2])
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=20)
    ap.add_argument("--snr_idx", type=int, nargs="*", default=[0, 3, 6])
    ap.add_argument("--work", type=str, default="/tmp/bf16_cert_runs")
    args = ap.parse_args()

    train_json = os.path.join(args.corpus, "train.json")
    test_json = os.path.join(args.corpus, "test.json")
    noise_root = os.path.join(args.corpus, "noise")

    # the resume key must cover EVERYTHING that changes the recorded
    # metrics, or a re-run with different eval settings would silently
    # mix incomparable runs in one file
    results = {"config": {"epochs": args.epochs,
                          "batch_size": args.batch_size,
                          "seeds": args.seeds,
                          "snr_idx": args.snr_idx,
                          "corpus": os.path.abspath(args.corpus)},
               "runs": []}
    if os.path.exists(args.out):  # resume an interrupted sweep
        with open(args.out) as fp:
            prev = json.load(fp)
        if prev.get("config") == results["config"]:
            results = prev
        else:
            # never silently discard a prior sweep (runs cost ~15 min
            # each on chip): a mismatched config must not overwrite it
            raise SystemExit(
                f"{args.out} holds a sweep with a different config:\n"
                f"  recorded: {prev.get('config')}\n"
                f"  requested: {results['config']}\n"
                "refusing to overwrite — pass a different --out or "
                "delete the file first")

    for dtype in ("float32", "bfloat16"):
        for seed in args.seeds:
            name = f"cert_{dtype}_s{seed}"
            if any(r["name"] == name for r in results["runs"]):
                print(f"skip {name} (already recorded)", flush=True)
                continue
            out_root = os.path.join(args.work, name)
            t0 = time.time()
            train_argv = [
                "--dataset_json", train_json,
                "--test_dataset_json", test_json,
                "--noise_root", noise_root,
                "--output_root", out_root, "--name", "exp",
                "--epochs", str(args.epochs),
                "--batch_size", str(args.batch_size),
                "--seed", str(seed),
                "--compute_dtype", dtype,
            ]
            if dtype == "bfloat16":
                train_argv.append("--no_remat")
            print(f"== train {name}", flush=True)
            run_cli("train_denoiser", train_argv)
            train_wall = time.time() - t0

            eval_out = os.path.join(args.work, f"{name}_eval.json")
            run_cli("eval_synthetic", [
                "--dataset_json", test_json, "--noise_root", noise_root,
                "--output_root", out_root, "--name", "exp",
                "--ckpt", "latest", "--batch_size", "24",
                "--snr_idx", *[str(i) for i in args.snr_idx],
                "--out", eval_out,
            ])
            with open(eval_out) as fp:
                metrics = json.load(fp)
            results["runs"].append({
                "name": name, "dtype": dtype, "seed": seed,
                "train_wall_sec": round(train_wall, 1),
                "metrics": metrics,
            })
            with open(args.out, "w") as fp:
                json.dump(results, fp, indent=1)
            print(f"== {name} done in {train_wall:.0f}s", flush=True)

    # summary table: mean +/- spread per dtype per SNR
    summary = {}
    for dtype in ("float32", "bfloat16"):
        runs = [r for r in results["runs"] if r["dtype"] == dtype]
        if not runs:
            continue
        per_snr = {}
        for key in runs[0]["metrics"]:
            per = {}
            for metric in ("avg_stoi", "avg_pesq", "avg_overall_snr"):
                vals = [r["metrics"][key][metric] for r in runs]
                per[metric] = {
                    "mean": round(sum(vals) / len(vals), 4),
                    "min": round(min(vals), 4),
                    "max": round(max(vals), 4)}
            per_snr[key] = per
        summary[dtype] = per_snr
    results["summary"] = summary
    with open(args.out, "w") as fp:
        json.dump(results, fp, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
