"""Synthetic speech-like corpus for on-chip quality experiments.

No external speech data exists in this environment, so quality
experiments (docs/EXPERIMENTS.md) run on a generated corpus whose
silent-interval structure is true by construction:

* clips: harmonic bursts (random F0 90-250 Hz, 5 harmonics, slow AM,
  onset/offset ramps) separated by genuine silences;
* noise bank: leaky-integrator pink-ish noise tracks plus band tones.

Usage:
    python experiments/make_corpus.py --out /tmp/e2e_exp \
        [--train 24 --test 6 --clip_seconds 8.0 --seed 0]

Writes  <out>/clips_train/*.wav, <out>/clips_test/*.wav, <out>/noise/*.wav
and runs `sos_tpu.cli.preprocess --label_silence` (the reference's
energy-0.08 labeling recipe, preprocessing/util.py:600-778) to build
<out>/train.json and <out>/test.json.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from sos_tpu.dsp import audio_io

SR = 14000


def make_clip(rng: np.random.Generator, seconds: float) -> np.ndarray:
    n = int(seconds * SR)
    y = np.zeros(n, np.float32)
    t = 0
    while t < n:
        sil = int(rng.uniform(0.25, 0.9) * SR)   # true silent interval
        t += sil
        if t >= n:
            break
        dur = int(rng.uniform(0.4, 1.2) * SR)    # voiced burst
        dur = min(dur, n - t)
        f0 = rng.uniform(90.0, 250.0)
        tt = np.arange(dur) / SR
        burst = np.zeros(dur, np.float64)
        for h in range(1, 6):
            burst += rng.uniform(0.3, 1.0) / h * np.sin(
                2 * np.pi * f0 * h * tt + rng.uniform(0, 2 * np.pi))
        am = 1.0 + 0.35 * np.sin(2 * np.pi * rng.uniform(2.0, 6.0) * tt)
        ramp = np.minimum(1.0, np.minimum(np.arange(dur),
                                          dur - np.arange(dur)) / (0.02 * SR))
        y[t:t + dur] = (burst * am * ramp * 0.22).astype(np.float32)
        t += dur
    peak = np.abs(y).max()
    return y / peak * 0.7 if peak > 0 else y


NOISE_KINDS = ("pink", "tones", "babble", "white", "hum", "clicks")


def make_noise_track(rng: np.random.Generator, seconds: float,
                     kind: str) -> np.ndarray:
    """Six noise families (r4: diversity beyond pink+tones — babble-like
    competing speech, broadband white, AM machine hum, impulsive
    clicks), so detection/denoising stats aren't fit to one spectrum."""
    from scipy.signal import lfilter

    n = int(seconds * SR)
    tt = np.arange(n) / SR
    if kind == "pink":
        white = rng.standard_normal(n)
        # leaky integrator (~1/f-ish) + white floor, vectorized
        out = lfilter([1 - 0.92], [1, -0.92], white) + 0.25 * white
    elif kind == "tones":
        out = sum(np.sin(2 * np.pi * rng.uniform(300, 3000) * tt
                         + rng.uniform(0, 2 * np.pi))
                  * rng.uniform(0.2, 0.5) for _ in range(4))
    elif kind == "babble":
        # overlapping speech-like bursts from several "talkers" — the
        # hardest case for a silence detector (noise resembles speech)
        out = np.zeros(n)
        for _ in range(5):
            out += make_clip(rng, seconds).astype(np.float64) \
                * rng.uniform(0.4, 1.0)
    elif kind == "white":
        out = rng.standard_normal(n)
    elif kind == "hum":
        # mains-like hum + harmonics with slow AM (machine noise)
        base = rng.uniform(45, 120)
        out = sum(np.sin(2 * np.pi * base * h * tt
                         + rng.uniform(0, 2 * np.pi)) / h
                  for h in range(1, 7))
        out *= 1.0 + 0.4 * np.sin(2 * np.pi * rng.uniform(0.3, 2.0) * tt)
    elif kind == "clicks":
        # impulsive: exponentially-decaying broadband clicks on a low
        # noise floor
        out = 0.05 * rng.standard_normal(n)
        for _ in range(int(seconds * 3)):
            p = int(rng.uniform(0, n - SR // 10))
            dur = int(rng.uniform(0.01, 0.06) * SR)
            out[p:p + dur] += rng.standard_normal(dur) \
                * np.exp(-np.arange(dur) / (0.01 * SR)) \
                * rng.uniform(0.5, 1.5)
    else:
        raise ValueError(kind)
    out = np.asarray(out, np.float32)
    return out / np.abs(out).max() * 0.5


def run_preprocess(audio_dir: str, out_json: str) -> None:
    from sos_tpu.cli import preprocess

    argv = sys.argv
    sys.argv = ["prog", "--audio_dir", audio_dir, "--output_json", out_json,
                "--label_silence"]
    try:
        preprocess.main()
    finally:
        sys.argv = argv


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--train", type=int, default=24)
    ap.add_argument("--test", type=int, default=6)
    ap.add_argument("--clip_seconds", type=float, default=8.0)
    ap.add_argument("--noise_tracks", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    for split, count in (("train", args.train), ("test", args.test)):
        d = os.path.join(args.out, f"clips_{split}")
        os.makedirs(d, exist_ok=True)
        for i in range(count):
            audio_io.write_wav(os.path.join(d, f"clip_{i:03d}.wav"),
                               make_clip(rng, args.clip_seconds), SR)
    nd = os.path.join(args.out, "noise")
    os.makedirs(nd, exist_ok=True)
    for i in range(args.noise_tracks):
        kind = NOISE_KINDS[i % len(NOISE_KINDS)]
        audio_io.write_wav(os.path.join(nd, f"noise_{i:02d}_{kind}.wav"),
                           make_noise_track(rng, 20.0, kind), SR)

    for split in ("train", "test"):
        run_preprocess(os.path.join(args.out, f"clips_{split}"),
                       os.path.join(args.out, f"{split}.json"))
    print(f"corpus ready under {args.out}")


if __name__ == "__main__":
    main()
