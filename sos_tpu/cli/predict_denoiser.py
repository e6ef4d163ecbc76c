"""Stage-2 inference: denoise from a pred_data.json handshake file.

Usage:
    python -m sos_tpu.cli.predict_denoiser --pred_data outputs/pred_data.json \
        --ckpt 24 [--pth ckpt_epoch24.pth] [--snr 0] [--unknown_clean_signal true]

Equivalent of model_2 `predict.py` (m2 predict.py:255-626): per file
writes denoised_output.wav / predicted_full_noise.wav / noise_intervals.wav
/ noisy_input.wav + stat.json; aggregates the speech-metric suite into
`eval_results{_snrX}.json` when the clean signal is known.
"""

import argparse
import os

from sos_tpu.cli.common import add_common_train_args, config_from_args, experiment_dirs
from sos_tpu.infer.denoise import DenoiserPredictor
from sos_tpu.infer.evaluate import evaluate_denoiser
from sos_tpu.train.checkpoints import CheckpointManager
from sos_tpu.train.loop import init_denoiser_state


def load_denoiser_variables(cfg, model_dir, ckpt: str, pth: str = None):
    if pth:
        from sos_tpu.models.torch_import import import_denoiser_checkpoint

        return import_denoiser_checkpoint(pth)
    _, template = init_denoiser_state(cfg, steps_per_epoch=1)
    mgr = CheckpointManager(model_dir)
    name = ckpt if ckpt in ("latest", "best_acc") else f"ckpt_epoch{ckpt}"
    state, _ = mgr.load(name, template=template)
    return state.variables()


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_train_args(parser, need_dataset=False)
    parser.add_argument("--pred_data", type=str, required=True,
                        help="stage-1 bridge output JSON")
    parser.add_argument("--pth", type=str, default=None)
    parser.add_argument("--snr", type=float, default=None)
    parser.add_argument("--buckets", type=int, nargs="*", default=None,
                        help="length buckets (spectrogram frames) for "
                             "compile reuse; numerically exact")
    parser.add_argument(
        "--unknown_clean_signal",
        type=lambda x: str(x).lower() in ("true", "1", "yes"), default=False)
    parser.add_argument(
        "--save_results",
        type=lambda x: str(x).lower() in ("true", "1", "yes"), default=True)
    parser.add_argument("--eval_batch_size", type=int, default=None,
                        help="batch same-bucket utterances per device "
                             "dispatch (needs --buckets)")
    parser.add_argument("--outputs", type=str, default=None)
    parser.add_argument("--profile", type=str, default=None,
                        choices=("f32", "bf16", "int8"),
                        help="serving profile; every profile is "
                             "bucketed-exact within itself (int8 drift vs "
                             "f32 is bounded by tests/test_quant.py)")
    parser.add_argument("--calibration_json", type=str, default=None,
                        help="persisted int8 activation scales (defaults "
                             "to the denoiser model dir's file when "
                             "present)")
    args = parser.parse_args()
    if not args.unknown_clean_signal and args.snr is None:
        parser.error("--unknown_clean_signal false REQUIRES --snr")
    cfg = config_from_args(args, stage="denoiser")
    exp_dir, _, model_dir = experiment_dirs(cfg, "denoiser")
    outputs = args.outputs or os.path.join(exp_dir, "outputs")

    variables = load_denoiser_variables(cfg, model_dir, args.ckpt, args.pth)
    from sos_tpu.cli.common import default_calibration_path

    calib = default_calibration_path(model_dir, args.profile,
                                     args.calibration_json)
    predictor = DenoiserPredictor(cfg, variables,
                                  buckets=args.buckets or None,
                                  profile=args.profile,
                                  calibration_path=calib)
    out = evaluate_denoiser(cfg, predictor, args.pred_data, outputs,
                            snr=args.snr,
                            unknown_clean_signal=args.unknown_clean_signal,
                            save_individual_results=args.save_results,
                            batch_size=args.eval_batch_size)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
