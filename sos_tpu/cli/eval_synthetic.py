"""Batched synthetic-mixture quality evaluation per SNR.

Usage:
    python -m sos_tpu.cli.eval_synthetic --dataset_json data/test.json \
        --noise_root data/noise_data_DEMAND/test_noise --ckpt latest \
        [--snr_idx 0 3 6] [--batch_size 32] [--out results.json]

BASELINE config[1]: mixes the test set with corpus noise at each
requested SNR, denoises through the batched fused program (ground-truth
intervals) and reports avg STOI/SSNR/... per SNR in one command.
"""

import argparse
import dataclasses
import json

from sos_tpu.cli.common import add_common_train_args, config_from_args, experiment_dirs
from sos_tpu.cli.predict_denoiser import load_denoiser_variables
from sos_tpu.data import DenoiserBatcher, DatasetIndex, NoiseBank, denoiser_windows
from sos_tpu.infer.synthetic_eval import evaluate_synthetic


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_train_args(parser)
    parser.add_argument("--pth", type=str, default=None)
    parser.add_argument("--snr_idx", type=int, nargs="*", default=[0, 3, 6],
                        help="indices into the SNR set (-10..10)")
    parser.add_argument("--max_batches", type=int, default=None)
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--profile", type=str, default=None,
                        choices=("f32", "bf16", "int8"),
                        help="serving profile to evaluate (measures the "
                             "profile's quality delta on this checkpoint)")
    parser.add_argument("--noisy_baseline", action="store_true",
                        help="also score the noisy mixtures vs clean "
                             "(noisy_* columns) to show the improvement")
    args = parser.parse_args()
    cfg = config_from_args(args, stage="denoiser")
    _, _, model_dir = experiment_dirs(cfg, "denoiser")
    variables = load_denoiser_variables(cfg, model_dir, args.ckpt, args.pth)

    index = DatasetIndex.load(args.dataset_json)
    noise = NoiseBank.from_roots(args.noise_root, cfg.data.sample_rate)
    windows = denoiser_windows(index.files, cfg.data.clip_seconds,
                               cfg.data.overlap_seconds)

    report = {}
    for idx in args.snr_idx:
        snr_cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, snr_idx=idx))
        batcher = DenoiserBatcher(windows, noise, snr_cfg.data,
                                  cfg.train.batch_size, shuffle=False,
                                  seed=cfg.data.pred_random_seed)
        agg = evaluate_synthetic(snr_cfg, variables, batcher,
                                 max_batches=args.max_batches,
                                 profile=args.profile,
                                 noisy_baseline=args.noisy_baseline)
        snr = cfg.data.snrs[idx]
        report[f"snr_{snr}"] = agg
        print(f"SNR {snr:+d} dB: " + " ".join(
            f"{k.replace('avg_', '')}={v:.4f}" for k, v in agg.items()
            if k.startswith("avg_")))
        if args.noisy_baseline:
            print(f"  noisy baseline: " + " ".join(
                f"{k.replace('noisy_avg_', '')}={v:.4f}"
                for k, v in agg.items() if k.startswith("noisy_avg_")))
    if args.out:
        with open(args.out, "w") as fp:
            json.dump(report, fp, indent=4)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
