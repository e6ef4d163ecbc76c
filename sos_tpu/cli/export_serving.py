"""Export the fused denoise pipeline as a standalone serving artifact.

Usage:
    python -m sos_tpu.cli.export_serving --output denoise_b128.jaxprog \
        --batch 128 [--profile int8 [--calibration_json scales.json]] \
        [--clip_seconds 2.0] [--platforms tpu cpu] \
        --output_root model_output --name exp \
        [--detector_ckpt latest --denoiser_ckpt latest | --*_pth ...]

Writes `<output>` (serialized multi-platform StableHLO with the weights
embedded) plus `<output>.json` (shape/profile metadata). Load with
`sos_tpu.infer.export.load_denoise_program` — no model code or
checkpoints needed at serving time. Export one artifact per serving
bucket (batch, clip length).
"""

import argparse
import os

from sos_tpu.cli.common import (add_common_train_args, config_from_args,
                                experiment_dirs)
from sos_tpu.cli.predict_detector import load_detector_variables
from sos_tpu.cli.predict_denoiser import load_denoiser_variables
from sos_tpu.infer.export import export_denoise_program


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_train_args(parser, need_dataset=False)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--clip_seconds", type=float, default=2.0)
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--profile", type=str, default="f32",
                        choices=("f32", "bf16", "int8"))
    parser.add_argument("--calibration_json", type=str, default=None,
                        help="int8 activation scales (required for int8; "
                             "default: <denoiser model dir>/"
                             "int8_calibration.json)")
    parser.add_argument("--platforms", type=str, nargs="+",
                        default=["tpu", "cpu"])
    parser.add_argument("--transfer_dtype", type=str, default="float32",
                        choices=("float32", "int16"),
                        help="int16: the artifact takes/returns int16 "
                             "PCM wire samples (half the accelerator-"
                             "link bytes; fused.wire_encode/wire_decode "
                             "convert)")
    parser.add_argument("--detector_ckpt", type=str, default="latest")
    parser.add_argument("--denoiser_ckpt", type=str, default="latest")
    parser.add_argument("--detector_pth", type=str, default=None)
    parser.add_argument("--denoiser_pth", type=str, default=None)
    parser.add_argument("--exact_f32_head", action="store_true",
                        help="int8 profile: exact-f32 LSTM input "
                             "projection instead of the default bf16 "
                             "(for artifacts pinning pre-r4 int8 "
                             "outputs bit-for-bit)")
    args = parser.parse_args()

    cfg = config_from_args(args, stage="export")
    _, _, det_dir = experiment_dirs(cfg, "detector")
    _, _, den_dir = experiment_dirs(cfg, "denoiser")
    det_vars = load_detector_variables(cfg, det_dir, args.detector_ckpt,
                                       args.detector_pth)
    den_vars = load_denoiser_variables(cfg, den_dir, args.denoiser_ckpt,
                                       args.denoiser_pth)

    from sos_tpu.cli.common import default_calibration_path

    calib = default_calibration_path(den_dir, args.profile,
                                     args.calibration_json)

    path = export_denoise_program(
        cfg, det_vars, den_vars, args.output, batch=args.batch,
        clip_seconds=args.clip_seconds, threshold=args.threshold,
        profile=args.profile, calibration_path=calib,
        platforms=args.platforms, wire_dtype=args.transfer_dtype,
        bf16_head_proj=not args.exact_f32_head)
    size = os.path.getsize(path)
    print(f"exported {path} ({size / 1e6:.1f} MB, "
          f"platforms={args.platforms}, profile={args.profile}, "
          f"batch={args.batch})")


if __name__ == "__main__":
    main()
