"""Long-lived denoising server: compile once, serve many requests.

Usage:
    python -m sos_tpu.cli.serve --output_root model_output --name exp \
        [--profile int8] [--chunk_seconds 2.0] [--threshold 0.5]

Protocol (stdin/stdout, one request per line):

    <input.wav>\t<output.wav>      denoise input -> output
    PING                           liveness check -> "PONG"
    QUIT                           graceful shutdown

Responses: "OK <output> <seconds_of_audio> <wall_seconds>" or
"ERR <message>". The pipeline (and its compiled programs + int8
calibration) stays warm across requests — the reference's per-request
cost of process start + retrace + checkpoint load disappears after the
first request.
"""

import argparse
import sys
import time

import numpy as np

from sos_tpu.cli.common import (add_common_train_args, config_from_args,
                                experiment_dirs)
from sos_tpu.cli.predict_detector import load_detector_variables
from sos_tpu.cli.predict_denoiser import load_denoiser_variables
from sos_tpu.dsp import audio_io
from sos_tpu.infer.streaming import StreamingDenoiser


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_train_args(parser, need_dataset=False)
    parser.add_argument("--detector_ckpt", type=str, default="latest")
    parser.add_argument("--denoiser_ckpt", type=str, default="latest")
    parser.add_argument("--detector_pth", type=str, default=None)
    parser.add_argument("--denoiser_pth", type=str, default=None)
    parser.add_argument("--chunk_seconds", type=float, default=2.0)
    parser.add_argument("--overlap_seconds", type=float, default=0.5)
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--profile", type=str, default=None,
                        choices=("f32", "bf16", "int8"))
    parser.add_argument("--calibration_json", type=str, default=None)
    args = parser.parse_args()

    cfg = config_from_args(args, stage="serve")
    _, _, det_dir = experiment_dirs(cfg, "detector")
    _, _, den_dir = experiment_dirs(cfg, "denoiser")
    det_vars = load_detector_variables(cfg, det_dir, args.detector_ckpt,
                                       args.detector_pth)
    den_vars = load_denoiser_variables(cfg, den_dir, args.denoiser_ckpt,
                                       args.denoiser_pth)
    from sos_tpu.cli.common import default_calibration_path

    calib = default_calibration_path(den_dir, args.profile,
                                     args.calibration_json)
    stream = StreamingDenoiser(
        cfg, det_vars, den_vars, chunk_seconds=args.chunk_seconds,
        overlap_seconds=args.overlap_seconds, threshold=args.threshold,
        profile=args.profile, calibration_path=calib)

    print("READY", flush=True)
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        if line == "QUIT":
            print("BYE", flush=True)
            return
        if line == "PING":
            print("PONG", flush=True)
            continue
        try:
            src, dst = line.split("\t")
            t0 = time.perf_counter()
            wav, _ = audio_io.load(src, sr=cfg.data.sample_rate)
            out = stream.denoise(wav.astype(np.float32))
            audio_io.write_wav(dst, out, cfg.data.sample_rate)
            wall = time.perf_counter() - t0
            secs = len(wav) / cfg.data.sample_rate
            print(f"OK {dst} {secs:.2f} {wall:.2f}", flush=True)
        except Exception as exc:  # keep serving on bad requests
            # one-line protocol: JAX/XLA errors are routinely multi-line
            msg = " ".join(str(exc).split())[:500]
            print(f"ERR {type(exc).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
