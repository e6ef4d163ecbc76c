"""Certify the bf16 LSTM head projection on TRAINED checkpoints.

experiments/bf16_lstm_proj.py measured the throughput win (+2.9%
two-stage) and the numeric drift (crm 9.4e-6, 0 detector flips) on
RANDOM weights. This closes the remaining evidence gap: on the round-4
quality experiment's trained checkpoints (experiments/quality_r4.sh),
run the int8 profile with bf16_head_proj True vs False over the held-out
test corpus and report

  1. the full speech-quality suite per SNR for both head modes plus the
     per-metric deltas (quality-neutrality on trained weights), and
  2. trained-detector decision flips at threshold 0.5 + max logit delta
     over every test window.

Usage:
  PYTHONPATH=/root/repo:... python experiments/bf16_head_trained_cert.py \
      [--exp_root /tmp/e2e_r4] [--name r4] [--snr_idx 0 6]

Writes experiments/bf16_head_trained_cert_results.json.
"""

import argparse
import dataclasses
import json
import os

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from sos_tpu.cli.predict_denoiser import load_denoiser_variables
from sos_tpu.cli.predict_detector import load_detector_variables
from sos_tpu.config import ExperimentConfig
from sos_tpu.data import DatasetIndex, DenoiserBatcher, NoiseBank, denoiser_windows
from sos_tpu.data.pipeline import device_mix_and_stft_denoiser
from sos_tpu.infer.synthetic_eval import METRIC_KEYS, evaluate_synthetic
from sos_tpu.models.quant import QuantizedDetector


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--exp_root", default="/tmp/e2e_r4")
    parser.add_argument("--name", default="r4")
    parser.add_argument("--snr_idx", type=int, nargs="*", default=[0, 6])
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--max_batches", type=int, default=None,
                        help="bound windows per eval (metric pass is "
                             "0.14 s/clip on the 1-core host)")
    args = parser.parse_args()

    cfg = ExperimentConfig(
        name=args.name,
        output_root=os.path.join(args.exp_root, "model_output"))
    den_dir = os.path.join(cfg.output_root, f"{cfg.name}_denoiser", "model")
    det_dir = os.path.join(cfg.output_root, f"{cfg.name}_detector", "model")
    den_vars = load_denoiser_variables(cfg, den_dir, "latest")
    det_vars = load_detector_variables(cfg, det_dir, "latest")

    index = DatasetIndex.load(os.path.join(args.exp_root, "test.json"))
    noise = NoiseBank.from_roots(os.path.join(args.exp_root, "noise"),
                                 cfg.data.sample_rate)
    windows = denoiser_windows(index.files, cfg.data.clip_seconds,
                               cfg.data.overlap_seconds)
    results = {"corpus": args.exp_root, "test_windows": len(windows)}

    # -- 1. denoiser quality suite, both head modes, per SNR -------------
    for idx in args.snr_idx:
        snr = cfg.data.snrs[idx]
        snr_cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, snr_idx=idx))
        per_mode = {}
        for tag, bf16 in (("f32_proj", False), ("bf16_proj", True)):
            batcher = DenoiserBatcher(windows, noise, snr_cfg.data,
                                      args.batch_size, shuffle=False,
                                      seed=cfg.data.pred_random_seed)
            agg = evaluate_synthetic(snr_cfg, den_vars, batcher,
                                     profile="int8",
                                     max_batches=args.max_batches,
                                     quant_kwargs={"bf16_head_proj": bf16})
            per_mode[tag] = {k: v for k, v in agg.items()
                             if k.startswith("avg_") or k == "num_clips"}
            print(f"SNR {snr:+d} dB [{tag}]: " + " ".join(
                f"{k.replace('avg_', '')}={v:.4f}"
                for k, v in per_mode[tag].items() if k.startswith("avg_")),
                flush=True)
        deltas = {k: per_mode["bf16_proj"][f"avg_{k}"]
                  - per_mode["f32_proj"][f"avg_{k}"] for k in METRIC_KEYS}
        per_mode["delta_bf16_minus_f32"] = deltas
        print(f"SNR {snr:+d} dB deltas (bf16 - f32): " + " ".join(
            f"{k}={v:+.2e}" for k, v in deltas.items()), flush=True)
        results[f"snr_{snr}"] = per_mode

    # -- 2. trained-detector decision flips over every test window -------
    num_frames = int(cfg.data.clip_seconds * cfg.data.frame_rate)
    idx0 = args.snr_idx[0]
    flip_cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, snr_idx=idx0))
    batcher = DenoiserBatcher(windows, noise, flip_cfg.data,
                              args.batch_size, shuffle=False,
                              seed=cfg.data.pred_random_seed)

    @jax.jit
    def mixed_spec(clean, noise_w, snr_db, bits):
        d = device_mix_and_stft_denoiser(clean, noise_w, snr_db, bits,
                                         flip_cfg.data, cfg.stft)
        return d["mixed"]

    qdet = {}
    flips = total = 0
    max_logit_delta = 0.0
    for b_idx, batch in enumerate(batcher):
        if args.max_batches is not None and b_idx >= args.max_batches:
            break
        spec = mixed_spec(jnp.asarray(batch["clean"]),
                          jnp.asarray(batch["noise"]),
                          jnp.asarray(batch["snr"]),
                          jnp.asarray(batch["bits"]))
        if b_idx == 0:
            for tag, bf16 in (("f32", False), ("bf16", True)):
                qdet[tag] = QuantizedDetector(cfg.detector, det_vars,
                                              bf16_head_proj=bf16)
                qdet[tag].calibrate([spec])
        lf = qdet["f32"](spec, num_frames)
        lb = qdet["bf16"](spec, num_frames)
        flips += int(np.sum((jax.nn.sigmoid(lf) >= 0.5)
                            != (jax.nn.sigmoid(lb) >= 0.5)))
        total += int(np.prod(lf.shape))
        max_logit_delta = max(max_logit_delta,
                              float(jnp.max(jnp.abs(lf - lb))))
    results["detector"] = {
        "snr_db": cfg.data.snrs[idx0],
        "decision_flips": flips,
        "decisions_total": total,
        "max_logit_delta": max_logit_delta,
    }
    print(f"trained detector: {flips}/{total} decision flips, "
          f"max |logit delta| {max_logit_delta:.2e}", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bf16_head_trained_cert_results.json")
    with open(out, "w") as fp:
        json.dump(results, fp, indent=2)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
