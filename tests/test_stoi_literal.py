"""STOI numerical validation against an independent literal transcription.

pystoi itself is not installable here (no package, zero egress), so the
strongest available numerical check is a second, independently-structured
implementation transcribed 1:1 from the published algorithm (Taal,
Hendriks, Heusdens, Jensen, "A short-time objective intelligibility
measure for time-frequency weighted noisy speech", ICASSP 2010), written
as explicit per-band / per-segment python loops (no shared code with the
vectorized production version beyond numpy). Agreement to ~1e-10 on
random and structured signals rules out vectorization/axis bugs in
sos_tpu/eval/stoi.py. pystoi-specific quirks matched by both: exclusive
frame range, scipy.signal.resample_poly for 10 kHz conversion.
"""

import numpy as np
import pytest
from scipy.signal import resample_poly

from sos_tpu.eval.stoi import stoi

FS = 10000
FRAME = 256
HOP = 128
NFFT = 512
NBANDS = 15
MINFREQ = 150.0
NSEG = 30
BETA = -15.0
DYN = 40.0


def _literal_stoi(x, y, fs):
    """Direct per-step transcription of the STOI definition (loops)."""
    eps = np.finfo(np.float64).eps
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n = min(len(x), len(y))
    x, y = x[:n], y[:n]
    if fs != FS:
        x = resample_poly(x, FS, fs)
        y = resample_poly(y, FS, fs)

    w = np.hanning(FRAME + 2)[1:-1]

    # 1. remove silent frames (energy within 40 dB of the loudest)
    starts = list(range(0, len(x) - FRAME, HOP))
    energies = [20 * np.log10(np.linalg.norm(w * x[s:s + FRAME]) + eps)
                for s in starts]
    emax = max(energies)
    keep = [s for s, e in zip(starts, energies) if e > emax - DYN]
    xs = np.zeros((len(keep) - 1) * HOP + FRAME)
    ys = np.zeros_like(xs)
    for i, s in enumerate(keep):
        xs[i * HOP:i * HOP + FRAME] += w * x[s:s + FRAME]
        ys[i * HOP:i * HOP + FRAME] += w * y[s:s + FRAME]

    # 2. one-third-octave band analysis
    f = np.linspace(0, FS, NFFT + 1)[: NFFT // 2 + 1]
    bands = []
    for k in range(NBANDS):
        lo = MINFREQ * 2.0 ** ((2 * k - 1) / 6)
        hi = MINFREQ * 2.0 ** ((2 * k + 1) / 6)
        bands.append((int(np.argmin((f - lo) ** 2)),
                      int(np.argmin((f - hi) ** 2))))

    def envelopes(sig):
        frames = [w * sig[s:s + FRAME]
                  for s in range(0, len(sig) - FRAME, HOP)]
        out = np.zeros((NBANDS, len(frames)))
        for t, fr in enumerate(frames):
            power = np.abs(np.fft.rfft(fr, NFFT)) ** 2
            for b, (lo, hi) in enumerate(bands):
                out[b, t] = np.sqrt(np.sum(power[lo:hi]))
        return out

    ex, ey = envelopes(xs), envelopes(ys)
    t_total = ex.shape[1]
    if t_total < NSEG:
        return float("nan")

    # 3. per-segment normalized correlation with clipping
    clip = 10 ** (-BETA / 20)
    vals = []
    for m in range(NSEG, t_total + 1):
        for b in range(NBANDS):
            xb = ex[b, m - NSEG:m]
            yb = ey[b, m - NSEG:m]
            alpha = np.linalg.norm(xb) / (np.linalg.norm(yb) + eps)
            yb = np.minimum(yb * alpha, xb * (1 + clip))
            xc = xb - xb.mean()
            yc = yb - yb.mean()
            denom = (np.linalg.norm(xc) + eps) * (np.linalg.norm(yc) + eps)
            vals.append(float(np.dot(xc, yc) / denom))
    return float(np.mean(vals))


def _speech_like(seconds, fs, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * fs)) / fs
    f0 = 160 + 40 * np.sin(2 * np.pi * 0.5 * t)
    phase = 2 * np.pi * np.cumsum(f0) / fs
    sig = sum(np.sin(k * phase) / k for k in range(1, 5))
    env = np.clip(np.sin(2 * np.pi * 2.7 * t), 0, None)
    return (sig * env * 0.3 + rng.normal(0, 1e-4, len(t))).astype(np.float64)


@pytest.mark.parametrize("fs,seed,noise", [
    (10000, 0, 0.00),
    (10000, 1, 0.02),
    (14000, 2, 0.05),
    (16000, 3, 0.10),
])
def test_stoi_matches_literal_transcription(fs, seed, noise):
    clean = _speech_like(2.5, fs, seed)
    rng = np.random.default_rng(100 + seed)
    deg = clean + rng.normal(0, noise, len(clean))
    ours = stoi(clean, deg, fs)
    lit = _literal_stoi(clean, deg, fs)
    assert ours == pytest.approx(lit, abs=1e-9), (ours, lit)


def test_stoi_identity_and_monotone():
    clean = _speech_like(2.5, 10000, 7)
    assert stoi(clean, clean, 10000) == pytest.approx(1.0, abs=1e-6)
    rng = np.random.default_rng(8)
    noise = rng.normal(0, 1, len(clean))
    prev = 1.1
    for level in (0.005, 0.02, 0.08, 0.3):
        s = stoi(clean, clean + level * noise, 10000)
        assert s < prev
        prev = s
