"""Streamed vs whole-utterance quality bound (BASELINE config[4]).

The reference denoises whole utterances in one pass (m2 predict.py:
319-334); `StreamingDenoiser` chunks them (fixed compiled program, any
duration) with overlap-add crossfades and boundary-consistent two-pass
detection. This experiment bounds what chunking costs in quality: each
test-corpus clip is mixed at a fixed SNR, denoised three ways —

  whole     : full-utterance detector -> full-utterance denoiser
              (the reference-faithful path, bits from the detector);
  two_pass  : StreamingDenoiser, consistent_boundaries=True (default);
  one_pass  : StreamingDenoiser, naive per-chunk detection;

— and scored (STOI/PESQ/overall SNR @16 kHz, reference metric protocol)
against the clean signal.

Usage (after experiments/bf16_cert.py has trained checkpoints):
    python experiments/streaming_quality.py --corpus /tmp/e2e_exp \
        --detector_root <root with exp_detector> \
        --denoiser_root <root with exp_denoiser> \
        --out experiments/streaming_quality_results.json [--snr 0]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", type=str, required=True)
    ap.add_argument("--detector_root", type=str, required=True)
    ap.add_argument("--denoiser_root", type=str, required=True)
    ap.add_argument("--name", type=str, default="exp")
    ap.add_argument("--snr", type=float, default=0.0)
    ap.add_argument("--chunk_seconds", type=float, default=2.0)
    ap.add_argument("--overlap_seconds", type=float, default=0.5)
    ap.add_argument("--detector_context_seconds", type=float, default=None,
                    help="detector-context halo for the two_pass mode "
                         "(one_pass cannot use it: single fused program)")
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--config_json", type=str, default=None,
                    help="ExperimentConfig JSON (tiny configs for smoke "
                         "runs); default = full-size reference config")
    args = ap.parse_args()

    from sos_tpu.cli.common import enable_compile_cache
    enable_compile_cache()

    from sos_tpu.config import ExperimentConfig
    from sos_tpu.cli.predict_detector import load_detector_variables
    from sos_tpu.cli.predict_denoiser import load_denoiser_variables
    from sos_tpu.data.index import DatasetIndex
    from sos_tpu.dsp import audio_io
    from sos_tpu.dsp.mixing import crop_noise_np, mix_at_snr_np
    from sos_tpu.eval.speech import evaluate_metrics
    from sos_tpu.infer.denoise import DenoiserPredictor
    from sos_tpu.infer.detect import DetectorPredictor
    from sos_tpu.infer.streaming import StreamingDenoiser

    if args.config_json:
        with open(args.config_json) as fp:
            cfg = ExperimentConfig.from_json(fp.read())
    else:
        cfg = ExperimentConfig(name=args.name)
    sr = cfg.data.sample_rate

    det_dir = os.path.join(args.detector_root, f"{args.name}_detector",
                           "model")
    den_dir = os.path.join(args.denoiser_root, f"{args.name}_denoiser",
                           "model")
    det_vars = load_detector_variables(cfg, det_dir, "latest", None)
    den_vars = load_denoiser_variables(cfg, den_dir, "latest", None)

    detector = DetectorPredictor(cfg, det_vars)
    denoiser = DenoiserPredictor(cfg, den_vars)
    streams = {
        "two_pass": StreamingDenoiser(
            cfg, det_vars, den_vars, chunk_seconds=args.chunk_seconds,
            overlap_seconds=args.overlap_seconds,
            detector_context_seconds=args.detector_context_seconds,
            consistent_boundaries=True),
        "one_pass": StreamingDenoiser(
            cfg, det_vars, den_vars, chunk_seconds=args.chunk_seconds,
            overlap_seconds=args.overlap_seconds,
            consistent_boundaries=False),
    }

    index = DatasetIndex.load(os.path.join(args.corpus, "test.json"))
    noise_dir = os.path.join(args.corpus, "noise")
    noise_files = sorted(os.listdir(noise_dir))

    rng = np.random.default_rng(cfg.data.pred_random_seed)
    agg = {k: [] for k in ("whole", "two_pass", "one_pass")}
    for i, rec in enumerate(index.files):
        clean, _ = audio_io.load(rec.audio_path, sr=sr)
        clean = clean.astype(np.float32)
        track, _ = audio_io.load(
            os.path.join(noise_dir, noise_files[i % len(noise_files)]),
            sr=sr)
        crop = crop_noise_np(track, len(clean), rng=rng)
        mixed, clean_sig, _ = mix_at_snr_np(clean, crop, args.snr,
                                            norm=cfg.data.mix_norm)

        num_frames = int(len(mixed) / sr * cfg.data.frame_rate)
        bits, _ = detector.predict_waveform(mixed, num_frames)
        bits_str = "".join(str(int(b)) for b in bits)
        outs = {
            "whole": denoiser.denoise_waveform(
                mixed, bits_str,
                framerate=cfg.data.frame_rate)["denoised"],
        }
        for mode, s in streams.items():
            outs[mode] = s.denoise(mixed)
        for mode, den in outs.items():
            # reference metric protocol: resample 14k -> 16k, score
            # (signal under test, clean) — m2 predict.py:461-466
            n = min(len(den), len(clean_sig))
            out_16k = audio_io.resample(np.asarray(den[:n]), sr, 16000)
            ref_16k = audio_io.resample(clean_sig[:n], sr, 16000)
            m = evaluate_metrics(out_16k, ref_16k, sr=16000)
            agg[mode].append({k: float(m[k])
                              for k in ("stoi", "pesq", "overall_snr")})
        print(f"clip {i}: " + "  ".join(
            f"{mode} stoi={agg[mode][-1]['stoi']:.4f}"
            for mode in outs), flush=True)

    summary = {}
    for mode, rows in agg.items():
        summary[mode] = {k: round(float(np.mean([r[k] for r in rows])), 4)
                         for k in rows[0]}
    result = {"snr": args.snr, "chunk_seconds": args.chunk_seconds,
              "overlap_seconds": args.overlap_seconds,
              "detector_context_seconds": args.detector_context_seconds,
              "clips": len(index.files), "summary": summary,
              "per_clip": agg}
    with open(args.out, "w") as fp:
        json.dump(result, fp, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
