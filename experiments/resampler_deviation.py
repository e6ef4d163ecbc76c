"""Quantify the repo-vs-reference resampler deviation (VERDICT r3 #8).

The reference decodes every wav through librosa.load(sr=14000) — i.e.
resampy's `kaiser_best` polyphase filter (m1 dataset.py:226, m2
predict.py:301). The repo resamples with scipy resample_poly and a
kaiser(12.9846) window (dsp/audio_io.py:84). Neither librosa nor
resampy is installable here (zero egress), so the oracle below is
resampy's `kaiser_best` filter REBUILT FROM ITS PUBLISHED PARAMETERS
(num_zeros=64, beta=14.769656459379492, rolloff=0.9475937167399596 —
resampy/filters.py defaults, public constants), evaluated EXACTLY as a
polyphase FIR (no 512-entry table interpolation, so the oracle is if
anything cleaner than resampy itself).

Measures, for 44.1 kHz -> 14 kHz (the preprocessing path) on a
speech-like harmonic signal and white noise:
  * max / RMS sample delta between the repo resampler and the oracle,
  * STOI + native PESQ of (repo output) scored against (oracle output)
    — the metric-level impact of the deviation on the eval path.

Run: python experiments/resampler_deviation.py
Results recorded in docs/PARITY.md ("Resampler deviation").
"""

import json

import numpy as np
from scipy.signal import resample_poly

from sos_tpu.dsp.audio_io import resample as repo_resample

NUM_ZEROS = 64
BETA = 14.769656459379492
ROLLOFF = 0.9475937167399596


def kaiser_best_oracle(y: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resample with resampy kaiser_best's exact filter params."""
    import math

    g = math.gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g
    max_rate = max(up, down)
    # windowed-sinc lowpass at rolloff * output Nyquist, on the up-rate
    # grid; num_zeros zero crossings per side
    half = int(np.ceil(NUM_ZEROS * max_rate / ROLLOFF))
    t = np.arange(-half, half + 1, dtype=np.float64)
    h = (ROLLOFF / max_rate) * np.sinc(ROLLOFF * t / max_rate)
    h *= np.kaiser(len(h), BETA)
    # unit DC gain: scipy applies array windows with an `up` factor, and
    # the Kaiser taper shaves ~2.5% off the raw sinc's DC sum (measured
    # 0.975 gain unnormalized) — normalize so both resamplers are
    # amplitude-comparable and the delta measures filter SHAPE, not gain
    h /= np.sum(h)
    out = resample_poly(y, up, down, window=h)
    return out.astype(np.float64)


def speechlike(seconds: float, fs: int) -> np.ndarray:
    t = np.arange(int(fs * seconds)) / fs
    f0 = 170.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t)
    phase = 2 * np.pi * np.cumsum(f0) / fs
    sig = sum(np.sin(k * phase) / k for k in range(1, 8))
    env = np.clip(np.sin(2 * np.pi * 3.0 * t), 0.0, None)
    return (sig * env * 0.25).astype(np.float64)


def main() -> None:
    fs_in, fs_out = 44100, 14000
    rng = np.random.default_rng(0)
    # oracle gain sanity: a full-scale in-band sine must come through at
    # amplitude ~1 (validates the FIR normalization/scipy gain handling)
    t = np.arange(fs_in) / fs_in
    sine = np.sin(2 * np.pi * 1000 * t)
    body = kaiser_best_oracle(sine, fs_in, fs_out)[1000:-1000]
    g = np.sqrt(2 * np.mean(body ** 2))  # RMS amplitude (peak sampling
    # of a 1 kHz sine at 14 kHz under-reads max|.| by cos(pi/14)=2.5%)
    assert 0.999 < g < 1.001, f"oracle gain {g}"

    report = {}
    for name, sig in (("speechlike", speechlike(3.0, fs_in)),
                      ("white_noise",
                       rng.standard_normal(3 * fs_in) * 0.2)):
        ours = np.asarray(repo_resample(sig.astype(np.float32),
                                        fs_in, fs_out), np.float64)
        ref = kaiser_best_oracle(sig, fs_in, fs_out)
        n = min(len(ours), len(ref))
        ours, ref = ours[:n], ref[:n]
        scale = np.max(np.abs(ref))
        delta = ours - ref
        entry = {
            "n_samples": int(n),
            "peak": float(scale),
            "max_abs_delta": float(np.max(np.abs(delta))),
            "rms_delta": float(np.sqrt(np.mean(delta ** 2))),
            "delta_db_vs_peak": float(
                20 * np.log10(np.max(np.abs(delta)) / scale)),
        }
        # where does the delta live? split at the common passband edge
        # (rolloff * 7 kHz = 6633 Hz): in-band delta = both filters
        # agree; transition-band delta = design difference only
        from scipy.signal import butter, filtfilt

        b, a = butter(8, (ROLLOFF * fs_out / 2 * 0.97) / (fs_out / 2))
        d_in = filtfilt(b, a, delta)
        entry["inband_max_abs_delta"] = float(np.max(np.abs(d_in)))
        entry["inband_delta_db_vs_peak"] = float(
            20 * np.log10(np.max(np.abs(d_in)) / scale))

        # metric impact at the pipeline's 16 kHz metric rate (m2
        # predict.py:461-466 resamples 14k->16k before scoring); both
        # sides go through the SAME 14k->16k path
        from sos_tpu.eval.speech import pesq_score
        from sos_tpu.eval.stoi import stoi

        ours16 = np.asarray(repo_resample(ours.astype(np.float32),
                                          fs_out, 16000), np.float64)
        ref16 = np.asarray(repo_resample(ref.astype(np.float32),
                                         fs_out, 16000), np.float64)
        entry["stoi_ours_vs_oracle"] = float(stoi(ref16, ours16, 16000))
        entry["pesq_ours_vs_oracle_native"] = float(
            pesq_score(ref16, ours16, 16000))
        report[name] = entry
        print(name, json.dumps(entry, indent=1))

    with open("experiments/resampler_deviation_results.json", "w") as fp:
        json.dump(report, fp, indent=1)
    print("wrote experiments/resampler_deviation_results.json")


if __name__ == "__main__":
    main()
