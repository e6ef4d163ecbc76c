"""Eval suite tests: detection stats vs golden file, speech metric invariants."""

import json
import os

import numpy as np
import pytest

from sos_tpu.eval.detection import detection_statistics
from sos_tpu.eval.speech import (
    evaluate_metrics,
    llr,
    ssnr,
    ssnr_exclude_silence,
    wss,
)
from sos_tpu.eval.stoi import stoi

GOLDEN = ("/root/reference/model_1_silent_interval_detection/model_output/"
          "audioonly_model/outputs/sounds_of_silence/eval_results.json")


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="golden file absent")
def test_detection_statistics_matches_golden():
    """Reproduce the committed demo-run statistics exactly."""
    with open(GOLDEN) as fp:
        golden = json.load(fp)["prediction_statistics"]["all"]
    y_true, y_pred = [], []
    with open(GOLDEN) as fp:
        for rec in json.load(fp)["data"]:
            y_true += [int(b) for b in rec["label"]]
            y_pred += [int(b) for b in rec["pred_label"]]
    stats = detection_statistics(y_true, y_pred)
    for key, want in golden.items():
        got = stats[key]
        if want is None:
            assert got is None, key
        else:
            assert got == pytest.approx(want, abs=1e-9), key


def test_detection_statistics_balanced():
    y_true = [0, 0, 1, 1, 0, 1]
    y_pred = [0, 1, 1, 1, 0, 0]
    s = detection_statistics(y_true, y_pred)
    assert s["num_samples"] == 6
    assert s["num_silent_samples"] == 3
    assert s["accuracy"] == pytest.approx(4 / 6)
    # silent-positive convention: tp = both-zero count
    assert s["true_positive"] == 2
    assert s["false_positive"] == 1
    assert s["false_negative"] == 1
    assert s["true_negative"] == 2


def _speech_pair(rng, sr=16000, seconds=1.0, snr_db=10.0):
    n = int(sr * seconds)
    t = np.arange(n) / sr
    clean = (np.sin(2 * np.pi * 220 * t) * np.sin(2 * np.pi * 3 * t)).astype(np.float64)
    noise = rng.standard_normal(n)
    noise *= np.sqrt(np.sum(clean ** 2) / (10 ** (snr_db / 10)) / np.sum(noise ** 2))
    return clean, clean + noise


def test_ssnr_identity_and_degradation(rng):
    clean, deg = _speech_pair(rng, snr_db=10)
    osnr_id, seg_id = ssnr(clean, clean.copy())
    assert seg_id == pytest.approx(35.0)  # clipped at max for identical
    osnr, seg = ssnr(clean, deg)
    assert osnr == pytest.approx(10.0, abs=0.5)
    assert seg < seg_id
    # shift variant is bounded below by 0 inside the log -> higher floor
    _, seg_shift = ssnr(clean, deg, shift=1.0)
    assert np.isfinite(seg_shift)


def test_ssnr_matches_loop_oracle(rng):
    clean, deg = _speech_pair(rng, snr_db=5)
    srate, eps = 16000, 1e-10
    winlength = int(round(30 * srate / 1000))
    skip = winlength // 4
    num_frames = int(len(clean) / skip - winlength / skip)
    tt = np.arange(1, winlength + 1) / (winlength + 1)
    w = 0.5 * (1 - np.cos(2 * np.pi * tt))
    segs = []
    start = 0
    for _ in range(num_frames):
        cf = clean[start:start + winlength] * w
        df = deg[start:start + winlength] * w
        val = 10 * np.log10(np.sum(cf ** 2) / (np.sum((cf - df) ** 2) + eps) + eps)
        segs.append(np.clip(val, -10, 35))
        start += skip
    _, ours = ssnr(clean, deg)
    assert ours == pytest.approx(np.mean(segs), abs=1e-9)


def test_ssnr_exclude_silence(rng):
    clean, deg = _speech_pair(rng, snr_db=5)
    clean[:4000] = 0.0  # silent head
    deg[:4000] = rng.standard_normal(4000) * 0.01
    osnr, seg = ssnr_exclude_silence(clean, deg)
    assert np.isfinite(seg)


def test_wss_llr_identity(rng):
    clean, _ = _speech_pair(rng)
    assert np.nanmean(wss(clean, clean.copy(), 16000)) == pytest.approx(0.0, abs=1e-8)
    assert np.nanmean(llr(clean, clean.copy(), 16000)) == pytest.approx(0.0, abs=1e-8)


def test_llr_degradation_positive(rng):
    clean, deg = _speech_pair(rng, snr_db=0)
    assert np.nanmean(llr(clean, deg, 16000)) > 0.01


def test_stoi_behaviour(rng):
    clean, deg_good = _speech_pair(rng, seconds=2.0, snr_db=20)
    _, deg_bad = _speech_pair(rng, seconds=2.0, snr_db=-5)
    s_self = stoi(clean, clean.copy(), 16000)
    s_good = stoi(clean, deg_good, 16000)
    s_bad = stoi(clean, deg_bad, 16000)
    assert s_self == pytest.approx(1.0, abs=1e-6)
    assert s_good > s_bad


def test_evaluate_metrics_keys(rng):
    clean, deg = _speech_pair(rng, seconds=2.0, snr_db=10)
    m = evaluate_metrics(deg, clean, sr=16000)
    assert list(m.keys()) == [
        "l1", "stoi", "csig", "cbak", "covl", "pesq",
        "ssnr_regular", "ssnr_shift", "ssnr_clip", "ssnr_exsi", "overall_snr"]
    assert np.isfinite(m["l1"]) and np.isfinite(m["stoi"])
    assert np.isfinite(m["ssnr_regular"]) and np.isfinite(m["overall_snr"])
    # pesq (and its composites) are NaN when no PESQ backend is installed


def test_wss_matches_loop_oracle(rng):
    """Vectorized WSS == literal per-frame translation of the algorithm."""
    clean, deg = _speech_pair(rng, seconds=0.5, snr_db=5)
    srate, eps = 16000, 1e-10
    winlength = int(round(30 * srate / 1000))
    skip = winlength // 4
    num_frames = int(len(clean) / skip - winlength / skip)
    tt = np.arange(1, winlength + 1) / (winlength + 1)
    w = 0.5 * (1 - np.cos(2 * np.pi * tt))
    n_fft = int(2 ** np.ceil(np.log2(2 * winlength)))
    from sos_tpu.eval.speech import _critical_band_filters, _nearest_peaks

    filters = _critical_band_filters(srate, n_fft // 2)
    want = []
    start = 0
    for _ in range(num_frames):
        cf = clean[start:start + winlength] * w
        df = deg[start:start + winlength] * w
        cs = np.abs(np.fft.fft(cf, n_fft))[: n_fft // 2] ** 2
        ps = np.abs(np.fft.fft(df, n_fft))[: n_fft // 2] ** 2
        ce = 10 * np.log10(np.maximum(cs @ filters.T, eps))
        pe = 10 * np.log10(np.maximum(ps @ filters.T, eps))
        c_slope, p_slope = np.diff(ce), np.diff(pe)
        c_peak = _nearest_peaks(ce, c_slope)
        p_peak = _nearest_peaks(pe, p_slope)
        wc = (20 / (20 + ce.max() - ce[:-1])) * (1 / (1 + c_peak - ce[:-1]))
        wp = (20 / (20 + pe.max() - pe[:-1])) * (1 / (1 + p_peak - pe[:-1]))
        ww = (wc + wp) / 2
        want.append(np.sum(ww * (c_slope - p_slope) ** 2) / np.sum(ww))
        start += skip
    got = wss(clean, deg, srate)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-10)


def test_llr_matches_scipy_lpc_oracle(rng):
    """Batched Levinson-Durbin LLR == per-frame toeplitz/solve oracle.

    Uses a broadband AR(2) signal — pure tones make order-16 LPC
    ill-conditioned and numerically incomparable across solvers.
    """
    from scipy.linalg import solve_toeplitz, toeplitz
    from scipy.signal import lfilter

    srate = 16000
    n = int(0.4 * srate)
    clean = lfilter([1.0], [1.0, -1.2, 0.6],
                    rng.standard_normal(n)).astype(np.float64)
    deg = clean + 0.3 * lfilter([1.0], [1.0, -0.5],
                                rng.standard_normal(n))
    winlength = int(round(30 * srate / 1000))
    skip = winlength // 4
    num_frames = int(len(clean) / skip - winlength / skip)
    tt = np.arange(1, winlength + 1) / (winlength + 1)
    w = 0.5 * (1 - np.cos(2 * np.pi * tt))
    order = 16

    def lpc(frame):
        r = np.array([np.dot(frame[: winlength - k], frame[k:])
                      for k in range(order + 1)])
        a = solve_toeplitz((r[:-1], r[:-1]), r[1:])
        return r, np.concatenate([[1.0], -a])

    want = []
    start = 0
    for _ in range(num_frames):
        cf = clean[start:start + winlength] * w
        df = deg[start:start + winlength] * w
        r_c, a_c = lpc(cf)
        _, a_d = lpc(df)
        t = toeplitz(r_c)
        want.append(np.log((a_d @ t @ a_d) / (a_c @ t @ a_c)))
        start += skip
    got = llr(clean, deg, srate)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6, atol=1e-8)


def test_nearest_peaks_matches_while_loop_oracle(rng):
    """Vectorized run-boundary-scan peak walk == the literal while-loop
    translation of the reference (metrics.py:494-515), across random
    band-energy profiles including flat runs and all-monotone edges."""
    from sos_tpu.eval.speech import _nearest_peaks

    def oracle(energy, slope):
        num_crit = energy.shape[0]
        out = np.empty(num_crit - 1)
        for i in range(num_crit - 1):
            if slope[i] > 0:
                n = i
                while n < num_crit - 1 and slope[n] > 0:
                    n += 1
                out[i] = energy[n - 1] if n > 0 else energy[0]
            else:
                n = i
                while n >= 0 and slope[n] <= 0:
                    n -= 1
                out[i] = energy[n + 1]
        return out

    cases = [rng.standard_normal(25) * 10 for _ in range(50)]
    cases += [np.arange(25.0), -np.arange(25.0), np.zeros(25)]
    cases += [np.repeat(rng.standard_normal(5), 5) for _ in range(5)]
    for e in cases:
        s = np.diff(e)
        np.testing.assert_array_equal(_nearest_peaks(e, s), oracle(e, s))
    # batched call == per-row calls
    batch = np.stack(cases)
    got = _nearest_peaks(batch, np.diff(batch, axis=1))
    for row, e in enumerate(cases):
        np.testing.assert_array_equal(got[row], oracle(e, np.diff(e)))
