"""Speech-quality metric suite (reference metrics.py:16-681, re-vectorized).

Produces the same OrderedDict as the reference `evaluate_metrics`: l1,
stoi, csig, cbak, covl, pesq, ssnr_regular/shift/clip/exsi, overall_snr
(metrics.py:16-32). Implementations are frame-vectorized numpy instead of
per-frame Python loops:

* SSNR  — 30 ms Hann frames, 1/4 skip, clipped [-10, 35]; the "shift"
  variant adds +1 inside the log, the "exclude-silence" variant drops
  samples with |clean| < 0.03*max before framing (metrics.py:86-310).
* WSS   — 25 Gaussian critical-band filters, spectral-slope distances
  weighted by peak proximity (Klatt 1982; metrics.py:404-558).
* LLR   — order-16 LPC via batched Levinson-Durbin + Toeplitz quadratic
  forms (metrics.py:561-681).
* Composite Csig/Cbak/Covl — alpha=0.95 trimmed means + MOS regression
  clamped to [1,5] (metrics.py:345-401).
* STOI  — native implementation (sos_tpu.eval.stoi); pystoi not required.
* PESQ  — optional: uses `pesq`/`pypesq` if importable, else NaN (the
  composite metrics that depend on it also become NaN).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Tuple

import numpy as np
from scipy.interpolate import interp1d

from sos_tpu.eval.stoi import stoi as _stoi


# ---------------------------------------------------------------------------
# framing helpers
# ---------------------------------------------------------------------------


def _ref_window(winlength: int) -> np.ndarray:
    """The reference's Hann variant: 0.5*(1-cos(2*pi*(1..w)/(w+1)))."""
    t = np.arange(1, winlength + 1) / (winlength + 1)
    return 0.5 * (1 - np.cos(2 * np.pi * t))


def _frame_pair(clean: np.ndarray, deg: np.ndarray, srate: int,
                win_ms: float = 30.0) -> Tuple[np.ndarray, np.ndarray, int]:
    winlength = int(round(win_ms * srate / 1000.0))
    skip = winlength // 4
    num_frames = int(len(clean) / skip - (winlength / skip))
    idx = np.arange(winlength)[None, :] + skip * np.arange(num_frames)[:, None]
    w = _ref_window(winlength)
    return clean[idx] * w, deg[idx] * w, winlength


def _overall_snr(clean: np.ndarray, deg: np.ndarray, eps: float) -> float:
    dif = clean - deg
    return float(10 * np.log10(np.sum(clean ** 2) / (np.sum(dif ** 2) + eps)))


# ---------------------------------------------------------------------------
# SSNR family
# ---------------------------------------------------------------------------


def ssnr(clean: np.ndarray, deg: np.ndarray, srate: int = 16000,
         win_ms: float = 30.0, min_snr: float = -10, max_snr: float = 35,
         eps: float = 1e-10, shift: float = 0.0) -> Tuple[float, float]:
    """Returns (overall_snr, mean segmental SNR). shift=1.0 -> 'shift' variant."""
    osnr = _overall_snr(clean, deg, eps)
    cf, df, _ = _frame_pair(clean, deg, srate, win_ms)
    sig = np.sum(cf ** 2, axis=1)
    noi = np.sum((cf - df) ** 2, axis=1)
    inner = sig / (noi + eps) + (shift if shift else eps)
    seg = np.clip(10 * np.log10(inner), min_snr, max_snr)
    return osnr, float(np.nanmean(seg)) if len(seg) else float("nan")


def ssnr_exclude_silence(clean: np.ndarray, deg: np.ndarray, srate: int = 16000,
                         eps: float = 1e-10, shift: float = 0.0,
                         rel_threshold: float = 0.03) -> Tuple[float, float]:
    """Drop samples where |clean| < rel_threshold * max|clean| before framing."""
    keep = np.abs(clean) >= np.max(np.abs(clean)) * rel_threshold
    osnr = _overall_snr(clean, deg, eps)  # computed on the full signals
    c = clean[keep]
    d = deg[keep]
    if len(c) == 0:
        return osnr, float("nan")
    _, seg = ssnr(c, d, srate=srate, eps=eps, shift=shift)
    return osnr, seg


# ---------------------------------------------------------------------------
# WSS (weighted spectral slope)
# ---------------------------------------------------------------------------

_CENT_FREQ = np.array([
    50., 120, 190, 260, 330, 400, 470, 540, 617.372, 703.378, 798.717,
    904.128, 1020.38, 1148.30, 1288.72, 1442.54, 1610.70, 1794.16,
    1993.93, 2211.08, 2446.71, 2701.97, 2978.04, 3276.17, 3597.63])
_BANDWIDTH = np.array([
    70., 70, 70, 70, 70, 70, 70, 77.3724, 86.0056, 95.3398, 105.411,
    116.256, 127.914, 140.423, 153.823, 168.154, 183.457, 199.776,
    217.153, 235.631, 255.255, 276.072, 298.126, 321.465, 346.136])


def _critical_band_filters(srate: int, n_fftby2: int) -> np.ndarray:
    max_freq = srate / 2
    num_crit = len(_CENT_FREQ)
    min_factor = np.exp(-30.0 / (2 * 2.303))
    j = np.arange(n_fftby2)[None, :]
    f0 = np.floor(_CENT_FREQ / max_freq * n_fftby2)[:, None]
    bw = (_BANDWIDTH / max_freq * n_fftby2)[:, None]
    norm = (np.log(_BANDWIDTH[0]) - np.log(_BANDWIDTH))[:, None]
    filt = np.exp(-11 * ((j - f0) / bw) ** 2 + norm)
    return filt * (filt > min_factor)


def _nearest_peaks(energy: np.ndarray, slope: np.ndarray) -> np.ndarray:
    """For each band, the energy at the nearest spectral peak.

    Positive slope at band i -> walk right while slope stays > 0 and take
    the energy one before the stop; otherwise walk left while slope <= 0
    (metrics.py:494-515). The walks are run-boundary scans, so the whole
    thing vectorizes: the rightward stop for band i is the FIRST band
    n >= i with slope <= 0 (a suffix min-accumulate over stop indices),
    the leftward stop is the LAST band n <= i with slope > 0 (a prefix
    max-accumulate). Accepts (bands,) or batched (frames, bands) inputs;
    tests/test_eval.py pins this against the literal while-loop oracle.
    """
    e = np.atleast_2d(energy)
    s = np.atleast_2d(slope)
    nb = s.shape[1]  # num_crit - 1
    ar = np.arange(nb)
    # rightward walk: n_final = min(first k >= i with slope[k] <= 0, nb)
    cand = np.where(s <= 0, ar, nb)
    nxt = np.minimum.accumulate(cand[:, ::-1], axis=1)[:, ::-1]
    out_pos = np.take_along_axis(e, np.maximum(nxt - 1, 0), axis=1)
    # leftward walk: n_final = max(last k <= i with slope[k] > 0, -1)
    prev = np.maximum.accumulate(np.where(s > 0, ar, -1), axis=1)
    out_neg = np.take_along_axis(e, prev + 1, axis=1)
    out = np.where(s > 0, out_pos, out_neg)
    return out[0] if np.ndim(energy) == 1 else out


def wss(clean: np.ndarray, deg: np.ndarray, srate: int,
        eps: float = 1e-10) -> np.ndarray:
    """Per-frame WSS distortion (metrics.py:404-558), fully vectorized."""
    cf, df, winlength = _frame_pair(clean, deg, srate)
    n_fft = int(2 ** np.ceil(np.log2(2 * winlength)))
    n_fftby2 = n_fft // 2
    filters = _critical_band_filters(srate, n_fftby2)  # (25, n_fftby2)

    cs = np.abs(np.fft.fft(cf, n_fft, axis=1)[:, :n_fftby2]) ** 2
    ps = np.abs(np.fft.fft(df, n_fft, axis=1)[:, :n_fftby2]) ** 2
    ce = 10 * np.log10(np.maximum(cs @ filters.T, eps))  # (N, 25)
    pe = 10 * np.log10(np.maximum(ps @ filters.T, eps))

    kmax, klocmax = 20.0, 1.0
    c_slope = np.diff(ce, axis=1)  # (N, 24)
    p_slope = np.diff(pe, axis=1)
    c_peak = _nearest_peaks(ce, c_slope)
    p_peak = _nearest_peaks(pe, p_slope)
    w_clean = (kmax / (kmax + ce.max(axis=1, keepdims=True) - ce[:, :-1])) * \
              (klocmax / (klocmax + c_peak - ce[:, :-1]))
    w_proc = (kmax / (kmax + pe.max(axis=1, keepdims=True) - pe[:, :-1])) * \
             (klocmax / (klocmax + p_peak - pe[:, :-1]))
    w = (w_clean + w_proc) / 2
    return np.sum(w * (c_slope - p_slope) ** 2, axis=1) / np.sum(w, axis=1)


# ---------------------------------------------------------------------------
# LLR (log-likelihood ratio via LPC)
# ---------------------------------------------------------------------------


def _batched_lpc(frames: np.ndarray, order: int) -> Tuple[np.ndarray, np.ndarray]:
    """Levinson-Durbin across frames. Returns (autocorr (N, order+1), lp (N, order+1))."""
    n, w = frames.shape
    r = np.empty((n, order + 1))
    for k in range(order + 1):
        r[:, k] = np.sum(frames[:, :w - k] * frames[:, k:], axis=1)
    a = np.zeros((n, order))
    e = r[:, 0].copy()
    # All-zero (silent) frames yield E=0 -> NaN LPCs, excluded later by
    # nanmean exactly like the reference's per-frame loop.
    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(order):
            if i == 0:
                acc = np.zeros(n)
            else:
                acc = np.sum(a[:, :i] * r[:, i:0:-1], axis=1)
            rc = (r[:, i + 1] - acc) / e
            if i > 0:
                a[:, :i] = a[:, :i] - rc[:, None] * a[:, i - 1::-1]
            a[:, i] = rc
            e = (1 - rc * rc) * e
    lp = np.concatenate([np.ones((n, 1)), -a], axis=1)
    return r, lp


def _toeplitz_quad(a: np.ndarray, r: np.ndarray) -> np.ndarray:
    """Batched a^T Toeplitz(r) a without materializing the matrices.

    sum_{i,j} a_i a_j r[|i-j|] = r_0 * sum(a^2) + 2 * sum_{k>=1} r_k *
    <a[:-k], a[k:]> — i.e. the quadratic form is the autocorrelation of
    `a` dotted with `r` (lag 0 weighted once, others twice)."""
    n, m = a.shape
    s = np.empty((n, m))
    for k in range(m):
        s[:, k] = np.sum(a[:, : m - k] * a[:, k:], axis=1)
    w = np.full(m, 2.0)
    w[0] = 1.0
    return np.sum(r * s * w, axis=1)


def llr(clean: np.ndarray, deg: np.ndarray, srate: int) -> np.ndarray:
    """Per-frame LLR distances (metrics.py:561-623), fully batched:
    Levinson-Durbin across frames + lag-space Toeplitz quadratic forms."""
    order = 10 if srate < 10000 else 16
    cf, df, _ = _frame_pair(clean, deg, srate)
    r_clean, a_clean = _batched_lpc(cf, order)
    _, a_proc = _batched_lpc(df, order)
    num = _toeplitz_quad(a_proc, r_clean)
    den = _toeplitz_quad(a_clean, r_clean)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.log(num / den)


# ---------------------------------------------------------------------------
# PESQ (optional dependency)
# ---------------------------------------------------------------------------


def pesq_backend() -> str:
    """Which P.862 backend `pesq_score` will use: "pypesq"/"pesq"
    (conformant C extensions) or "native" (sos_tpu/eval/pesq.py, whose
    Bark-band tables are reconstructed — NOT certified conformant;
    report tools footnote PESQ-derived numbers when this is "native",
    and `python -m sos_tpu.eval.pesq_conformance` quantifies the delta
    once a conformant backend is importable)."""
    for mod, name in (("pypesq", "pypesq"), ("pesq", "pesq")):
        try:
            __import__(mod)
            return name
        except ImportError:
            continue
    return "native"


def pesq_score(clean: np.ndarray, deg: np.ndarray, srate: int) -> float:
    """P.862 narrowband score (reference metrics.py:341-343 via pypesq).

    Dispatch order: conformant `pypesq`/`pesq` C extensions when importable,
    else the native numpy P.862 implementation (sos_tpu/eval/pesq.py) —
    never NaN for valid inputs.
    """
    try:  # pypesq exposes pesq(ref, deg, fs)
        from pypesq import pesq as _pesq  # type: ignore

        return float(_pesq(clean, deg, srate))
    except ImportError:
        pass
    try:  # pesq package exposes pesq(fs, ref, deg, mode); the reference
        # pipeline is narrowband throughout (14 kHz audio, metrics @16 kHz)
        from pesq import pesq as _pesq2  # type: ignore

        return float(_pesq2(srate, clean, deg, "nb"))
    except ImportError:
        pass
    from sos_tpu.eval.pesq import pesq_nb

    try:
        return pesq_nb(clean, deg, srate)
    except ValueError:  # too short / not mono
        return float("nan")


# ---------------------------------------------------------------------------
# Composite + entry point
# ---------------------------------------------------------------------------


def _trim_mos(v: float) -> float:
    return float(min(max(v, 1.0), 5.0)) if np.isfinite(v) else float("nan")


def composite_eval(clean: np.ndarray, deg: np.ndarray, srate: int = 16000,
                   eps: float = 1e-10):
    """Csig/Cbak/Covl/pesq/segSNR/overall_snr (metrics.py:345-401).

    alpha=0.95 trimmed means of the frame-sorted WSS and LLR distances;
    the SSNR term uses the clipped (min_snr=0) variant.
    """
    alpha = 0.95
    n = min(len(clean), len(deg))
    clean, deg = clean[:n], deg[:n]

    wss_vec = np.sort(wss(clean, deg, srate, eps=eps))
    wss_dist = float(np.nanmean(wss_vec[: int(round(len(wss_vec) * alpha))]))
    llr_vec = np.sort(llr(clean, deg, srate))
    llr_mean = float(np.nanmean(llr_vec[: int(round(len(llr_vec) * alpha))]))
    overall_snr, seg_snr = ssnr(clean, deg, srate=srate, min_snr=0, eps=eps)
    pesq_raw = pesq_score(clean, deg, srate)

    csig = _trim_mos(3.093 - 1.029 * llr_mean + 0.603 * pesq_raw - 0.009 * wss_dist)
    cbak = _trim_mos(1.634 + 0.478 * pesq_raw - 0.007 * wss_dist + 0.063 * seg_snr)
    covl = _trim_mos(1.594 + 0.805 * pesq_raw - 0.512 * llr_mean - 0.007 * wss_dist)
    return csig, cbak, covl, pesq_raw, seg_snr, overall_snr


def metrics_l1(output: np.ndarray, target: np.ndarray) -> float:
    """Mean |resampled(output) - target| (metrics.py:40-45)."""
    lin = interp1d(np.arange(len(output)), output)
    steps = np.linspace(0, len(output) - 1, len(target))
    return float(np.mean(np.abs(lin(steps) - target)))


def evaluate_metrics(noisy: np.ndarray, clean: np.ndarray, sr: int = 16000,
                     eps: float = 1e-20) -> OrderedDict:
    """Full suite with the reference's key order (metrics.py:16-32).

    `noisy` is the signal under test (denoised output), `clean` the
    reference, mirroring the reference call convention.
    """
    noisy = np.asarray(noisy, dtype=np.float64)
    clean = np.asarray(clean, dtype=np.float64)
    csig, cbak, covl, pesq_raw, seg_clip, overall = composite_eval(
        clean, noisy, sr, eps=eps)
    m = OrderedDict()
    m["l1"] = metrics_l1(noisy, clean)
    m["stoi"] = float(_stoi(clean, noisy, sr))
    m["csig"] = csig
    m["cbak"] = cbak
    m["covl"] = covl
    m["pesq"] = pesq_raw
    m["ssnr_regular"] = ssnr(clean, noisy, srate=sr, eps=eps)[1]
    m["ssnr_shift"] = ssnr(clean, noisy, srate=sr, eps=eps, shift=1.0)[1]
    m["ssnr_clip"] = seg_clip
    m["ssnr_exsi"] = ssnr_exclude_silence(clean, noisy, srate=sr, eps=eps)[1]
    m["overall_snr"] = overall
    return m
