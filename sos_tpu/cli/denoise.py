"""One-shot denoising: noisy WAV in -> clean WAV out.

Usage:
    python -m sos_tpu.cli.denoise --input noisy.wav --output clean.wav \
        [--detector_ckpt latest --denoiser_ckpt latest | \
         --detector_pth ckpt_epoch87.pth --denoiser_pth ckpt_epoch24.pth] \
        [--chunk_seconds 2.0 --overlap_seconds 0.5] [--bf16]

The reference requires three separate script invocations glued by JSON
files to denoise one recording; this runs the fused detect+denoise
pipeline end-to-end on arbitrary-length audio (chunked streaming with
crossfade overlap-add) in a single command. Input is resampled to the
14 kHz processing rate; output is written at the same rate.
"""

import argparse

import numpy as np

from sos_tpu.cli.common import add_common_train_args, config_from_args, experiment_dirs
from sos_tpu.cli.predict_denoiser import load_denoiser_variables
from sos_tpu.cli.predict_detector import load_detector_variables
from sos_tpu.dsp import audio_io
from sos_tpu.infer.streaming import StreamingDenoiser


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_train_args(parser, need_dataset=False)
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--detector_ckpt", type=str, default="latest")
    parser.add_argument("--denoiser_ckpt", type=str, default="latest")
    parser.add_argument("--detector_pth", type=str, default=None)
    parser.add_argument("--denoiser_pth", type=str, default=None)
    parser.add_argument("--chunk_seconds", type=float, default=2.0)
    parser.add_argument("--overlap_seconds", type=float, default=0.5)
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--bf16", action="store_true",
                        help="shorthand for --profile bf16")
    parser.add_argument("--profile", type=str, default=None,
                        choices=("f32", "bf16", "int8"),
                        help="serving profile (see bench.py): f32 = "
                             "reference-exact, bf16 = bf16 conv trunks, "
                             "int8 = quantized trunks + packed layout "
                             "(fastest; self-calibrates on first batch)")
    parser.add_argument("--calibration_json", type=str, default=None,
                        help="int8 activation-scale file; loaded when "
                             "present, else written after the first "
                             "self-calibration (default: "
                             "<denoiser model dir>/int8_calibration.json)")
    args = parser.parse_args()

    cfg = config_from_args(args, stage="denoise")
    _, _, det_dir = experiment_dirs(cfg, "detector")
    _, _, den_dir = experiment_dirs(cfg, "denoiser")
    det_vars = load_detector_variables(cfg, det_dir, args.detector_ckpt,
                                       args.detector_pth)
    den_vars = load_denoiser_variables(cfg, den_dir, args.denoiser_ckpt,
                                       args.denoiser_pth)

    wav, _ = audio_io.load(args.input, sr=cfg.data.sample_rate)
    profile = args.profile or ("bf16" if args.bf16 else None)
    from sos_tpu.cli.common import default_calibration_path

    calib = default_calibration_path(den_dir, profile,
                                     args.calibration_json)
    stream = StreamingDenoiser(
        cfg, det_vars, den_vars, chunk_seconds=args.chunk_seconds,
        overlap_seconds=args.overlap_seconds, threshold=args.threshold,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        profile=profile, calibration_path=calib)
    out = stream.denoise(wav.astype(np.float32))
    audio_io.write_wav(args.output, out, cfg.data.sample_rate)
    print(f"denoised {len(wav) / cfg.data.sample_rate:.1f}s -> {args.output}")


if __name__ == "__main__":
    main()
