"""Stage-1 inference: detect silent intervals over a dataset JSON.

Usage:
    python -m sos_tpu.cli.predict_detector --dataset_json data/sos.json \
        --ckpt 87 [--pth ckpt_epoch87.pth] [--snr_idx 3] \
        [--unknown_clean_signal true] --noise_root data/noise_data_DEMAND/test_noise

Equivalent of model_1 `predict.py` (m1 predict.py:38-233,415-460): writes
`eval_results{_snrX}.json` + the per-file noise assignment under
`noise{_snrX}/`. `--unknown_clean_signal true` skips mixing (the input
wavs are already noisy; m1 predict.py:43-46).
"""

import argparse
import os

from sos_tpu.cli.common import add_common_train_args, config_from_args, experiment_dirs
from sos_tpu.data import NoiseBank
from sos_tpu.infer.detect import DetectorPredictor
from sos_tpu.infer.evaluate import evaluate_detector
from sos_tpu.train.checkpoints import CheckpointManager
from sos_tpu.train.loop import init_detector_state


def load_detector_variables(cfg, model_dir, ckpt: str, pth: str = None):
    model, template = init_detector_state(cfg, steps_per_epoch=1)
    if pth:
        from sos_tpu.models.torch_import import import_detector_checkpoint

        return import_detector_checkpoint(pth)
    mgr = CheckpointManager(model_dir)
    name = ckpt if ckpt in ("latest", "best_acc") else f"ckpt_epoch{ckpt}"
    state, _ = mgr.load(name, template=template)
    return state.variables()


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_train_args(parser)
    parser.add_argument("--pth", type=str, default=None,
                        help="import a reference PyTorch checkpoint instead")
    parser.add_argument("--snr_idx", type=int, default=None)
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--buckets", type=int, nargs="*", default=None,
                        help="length buckets (spectrogram frames) for "
                             "compile reuse; numerically exact")
    parser.add_argument(
        "--unknown_clean_signal",
        type=lambda x: str(x).lower() in ("true", "1", "yes"), default=False)
    parser.add_argument("--outputs", type=str, default=None)
    parser.add_argument("--eval_batch_size", type=int, default=None,
                        help="batch same-bucket utterances per device "
                             "dispatch (needs --buckets)")
    parser.add_argument("--save_individual", action="store_true",
                        help="save wav + bitstream/confidence overlay plots "
                             "for mismatched or silent items "
                             "(m1 predict.py:150-183)")
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
    cfg = config_from_args(args, stage="detector")
    exp_dir, _, model_dir = experiment_dirs(cfg, "detector")

    import dataclasses
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, snr_idx=args.snr_idx))

    outputs = args.outputs or os.path.join(exp_dir, "outputs", os.path.basename(
        args.dataset_json).split(".json")[0])
    variables = load_detector_variables(cfg, model_dir, args.ckpt, args.pth)
    from sos_tpu.cli.common import default_calibration_path
    _, _, den_model_dir = experiment_dirs(cfg, "denoiser", make=False)
    calib = default_calibration_path(den_model_dir, args.profile,
                                     args.calibration_json)
    predictor = DetectorPredictor(cfg, variables, threshold=args.threshold,
                                  buckets=args.buckets or None,
                                  profile=args.profile,
                                  calibration_path=calib)

    clean_audio = not args.unknown_clean_signal
    noise = NoiseBank.from_roots(args.noise_root, cfg.data.sample_rate) \
        if clean_audio else None
    out = evaluate_detector(cfg, predictor, args.dataset_json, outputs,
                            noise_bank=noise, snr_idx=args.snr_idx,
                            clean_audio=clean_audio,
                            save_individual_results=args.save_individual,
                            batch_size=args.eval_batch_size)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
