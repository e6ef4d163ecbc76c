"""Offline int8 calibration: derive activation scales from a corpus.

Usage:
    python -m sos_tpu calibrate --input_dir noisy_wavs/ \
        --out scales.json [--max_clips 256] [--batch 16] \
        [--clip_seconds 2.0] [--threshold 0.5] \
        --output_root model_output --name exp \
        [--detector_ckpt latest --denoiser_ckpt latest | --*_pth ...]

Why: without a persisted scale file, the int8 serving pipeline
self-calibrates on whatever batch arrives FIRST (infer/fused.py
_maybe_calibrate, using the mixed spectrum as an upper bound for the
gated branch) — safe, but serving numerics then depend on traffic
order. This command derives the scales from a representative corpus
instead and writes the exact JSON schema the serving/export paths load
(`{"denoiser": ..., "detector": ...}`), making calibration a
deterministic, reviewable build step:

  1. chunk every wav into fixed clips at the processing rate,
  2. run the FLOAT detector on each batch -> bits -> despeckled sample
     mask -> true gated-noise spectra (tighter than the serving-time
     mixed-spectrum upper bound, because the real gated branch only
     sees the silence-gated signal),
  3. calibrate the quantized denoiser on (mixed, gated) pairs and the
     quantized detector on the mixed spectra,
  4. atomically write `--out` (default: the per-experiment
     int8_calibration.json the serve/denoise/export CLIs pick up).

Point --input_dir at audio matching the deployment's loudness and
noise profile; the scales are static maxima, so the corpus should
cover the loudest expected inputs (the calibrator's margin covers
modest excursions).
"""

import argparse
import glob
import json
import os
import tempfile

import numpy as np

from sos_tpu.cli.common import (add_common_train_args, config_from_args,
                                experiment_dirs)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_train_args(parser, need_dataset=False)
    parser.add_argument("--input_dir", type=str, required=True,
                        help="directory of representative noisy wavs")
    parser.add_argument("--glob", type=str, default="*.wav")
    parser.add_argument("--out", type=str, default=None,
                        help="scale-file path (default: <denoiser model "
                             "dir>/int8_calibration.json)")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--max_clips", type=int, default=256,
                        help="cap on calibration clips (scales are "
                             "running maxima; more clips only help if "
                             "they add louder/denser material)")
    parser.add_argument("--clip_seconds", type=float, default=2.0)
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--detector_ckpt", type=str, default="latest")
    parser.add_argument("--denoiser_ckpt", type=str, default="latest")
    parser.add_argument("--detector_pth", type=str, default=None)
    parser.add_argument("--denoiser_pth", type=str, default=None)
    args = parser.parse_args()

    cfg = config_from_args(args, stage="calibrate")
    _, _, det_dir = experiment_dirs(cfg, "detector")
    _, _, den_dir = experiment_dirs(cfg, "denoiser")

    paths = sorted(glob.glob(os.path.join(args.input_dir, args.glob)))
    if not paths:
        parser.error(f"no files match {args.input_dir}/{args.glob}")

    import jax
    import jax.numpy as jnp

    from sos_tpu.cli.predict_denoiser import load_denoiser_variables
    from sos_tpu.cli.predict_detector import load_detector_variables
    from sos_tpu.dsp import audio_io
    from sos_tpu.dsp.mixing import bitstream_to_sample_mask
    from sos_tpu.dsp.stft import stft
    from sos_tpu.models import SilenceDetector
    from sos_tpu.models.quant import QuantizedDenoiser, QuantizedDetector

    det_vars = load_detector_variables(cfg, det_dir, args.detector_ckpt,
                                       args.detector_pth)
    den_vars = load_denoiser_variables(cfg, den_dir, args.denoiser_ckpt,
                                       args.denoiser_pth)

    sr = cfg.data.sample_rate
    clip_samples = int(args.clip_seconds * sr)
    num_frames = int(args.clip_seconds * cfg.data.frame_rate)
    ratio = sr / cfg.data.frame_rate

    # chunk the corpus into fixed clips (zero-padded tails)
    clips = []
    for path in paths:
        if len(clips) >= args.max_clips:
            break
        wav, _ = audio_io.load(path, sr=sr)
        for start in range(0, max(len(wav), 1), clip_samples):
            seg = wav[start:start + clip_samples]
            if len(seg) < clip_samples:
                seg = np.pad(seg, (0, clip_samples - len(seg)))
            clips.append(seg.astype(np.float32))
            if len(clips) >= args.max_clips:
                break
    clips = np.stack(clips)

    detector = SilenceDetector(cfg.detector)
    scfg = cfg.stft

    @jax.jit
    def detect_and_gate(mixed):
        """float detector -> bits -> sample mask -> (mixed, gated) STFTs."""
        mixed_stft = stft(mixed, scfg.n_fft, scfg.hop_length, scfg.win_length)
        logits = detector.apply(det_vars, mixed_stft,
                                num_frames=num_frames, train=False)
        bits = (jax.nn.sigmoid(logits) >= args.threshold).astype(jnp.float32)
        mask = bitstream_to_sample_mask(bits, ratio, clip_samples,
                                        cfg.data.despeckle_min_run)
        gated_stft = stft(mixed * mask, scfg.n_fft, scfg.hop_length,
                          scfg.win_length)
        return mixed_stft, gated_stft

    pairs = []
    for b in range(0, len(clips), args.batch):
        tile = clips[b:b + args.batch]
        if len(tile) < args.batch:  # pad the tail to ONE program shape
            tile = np.concatenate(
                [tile, np.zeros((args.batch - len(tile), clip_samples),
                                np.float32)])
        pairs.append(tuple(map(jnp.asarray, detect_and_gate(
            jnp.asarray(tile)))))

    quant = QuantizedDenoiser(cfg.denoiser, den_vars, inpaint_dtype="int8")
    quant.calibrate(pairs)
    quant_det = QuantizedDetector(cfg.detector, det_vars)
    quant_det.calibrate([mixed for mixed, _ in pairs])

    state = {"denoiser": quant.calibration_state(),
             "detector": quant_det.calibration_state()}
    out = args.out or os.path.join(den_dir, "int8_calibration.json")
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(out)),
                               suffix=".tmp")
    with os.fdopen(fd, "w") as fp:
        json.dump(state, fp, indent=1)
    os.replace(tmp, out)
    print(f"calibrated on {len(clips)} clips ({len(paths)} files) -> {out}")


if __name__ == "__main__":
    main()
