"""Native P.862 PESQ behavior tests.

No conformant PESQ binary or ITU test vectors exist in this environment
(no pypesq/pesq package, zero egress), so these tests pin the behavioral
contract a P.862 implementation must satisfy: perfect score on identity,
level invariance (P.862 level-aligns to 1e7 active-band power),
monotonicity over additive-noise severity in the operating range, delay
recovery, and the [-0.5, 4.5] raw-score range. The speech-metric suite
(reference metrics.py:16-32) must be NaN-free with the native backend.
"""

import math

import numpy as np
import pytest

from sos_tpu.eval.pesq import pesq_nb, _band_tables
from sos_tpu.eval.speech import evaluate_metrics, pesq_score

FS = 16000


def _speechlike(seconds: float = 3.0, fs: int = FS) -> np.ndarray:
    """Harmonic complex with syllabic (3 Hz) AM — silence gaps included."""
    t = np.arange(int(fs * seconds)) / fs
    f0 = 170.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t)
    phase = 2 * np.pi * np.cumsum(f0) / fs
    sig = sum(np.sin(k * phase) / k for k in range(1, 6))
    env = np.clip(np.sin(2 * np.pi * 3.0 * t), 0.0, None)
    return (sig * env * 0.25).astype(np.float64)


def test_band_tables_cover_spectrum():
    for fs in (8000, 16000):
        t = _band_tables(fs)
        assert t.nr_bins.sum() == t.n_fft // 2
        assert (t.nr_bins > 0).all()
        assert np.all(np.diff(t.centre_hz) > 0)
        assert np.all(np.diff(t.centre_bark) > 0)
        assert t.centre_hz[-1] < fs / 2
    assert len(_band_tables(8000).centre_bark) == 42
    assert len(_band_tables(16000).centre_bark) == 49


def test_identity_scores_max():
    x = _speechlike()
    assert pesq_nb(x, x, FS) == pytest.approx(4.5, abs=1e-6)
    x8 = x[::2]
    assert pesq_nb(x8, x8, 8000) == pytest.approx(4.5, abs=1e-6)


def test_level_invariance():
    x = _speechlike()
    rng = np.random.default_rng(3)
    noisy = x + rng.normal(0, 0.01, len(x))
    base = pesq_nb(x, noisy, FS)
    scaled = pesq_nb(x, noisy * 0.25, FS)
    assert scaled == pytest.approx(base, abs=0.05)
    # pure gain change of the degraded signal is nearly transparent
    assert pesq_nb(x, x * 0.3, FS) == pytest.approx(4.5, abs=1e-6)


def test_monotone_in_noise_level():
    x = _speechlike()
    rng = np.random.default_rng(7)
    noise = rng.normal(0, 1.0, len(x))
    sig_pow = np.mean(x**2)
    scores = []
    for snr_db in (40, 30, 20, 10, 0):
        n = noise * np.sqrt(sig_pow / 10 ** (snr_db / 10))
        scores.append(pesq_nb(x, x + n, FS))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 3.5          # 40 dB SNR is near-transparent
    assert scores[-1] < 2.0         # 0 dB SNR is clearly degraded
    assert all(-0.5 <= s <= 4.5 for s in scores)


def test_delay_recovery():
    x = _speechlike()
    shift = 800  # 50 ms
    deg = np.concatenate([np.zeros(shift), x])[: len(x)]
    # aligned comparison: only the genuinely-missing tail should cost
    assert pesq_nb(x, deg, FS) > 3.8
    # without alignment this would be a catastrophic score
    assert pesq_nb(x, deg, FS) > pesq_nb(x, np.roll(x, FS // 2), FS)


def test_too_short_raises():
    with pytest.raises(ValueError):
        pesq_nb(np.zeros(100), np.zeros(100), FS)


def test_pesq_score_dispatch_never_nan():
    x = _speechlike(2.0)
    assert math.isfinite(pesq_score(x, x * 0.9, FS))


def test_metric_suite_nan_free():
    x = _speechlike(2.0)
    rng = np.random.default_rng(11)
    noisy = x + rng.normal(0, 0.02, len(x))
    m = evaluate_metrics(noisy, x, FS)
    assert set(m) == {"l1", "stoi", "csig", "cbak", "covl", "pesq",
                      "ssnr_regular", "ssnr_shift", "ssnr_clip",
                      "ssnr_exsi", "overall_snr"}
    bad = {k: v for k, v in m.items() if not math.isfinite(v)}
    assert not bad, f"non-finite metrics: {bad}"


def test_golden_regression_values():
    """Frozen golden scores for a fixed signal set (VERDICT r2 #8): any
    change to the native P.862 pipeline that shifts these is a behavior
    change and must be deliberate. Generated with the r3 implementation;
    tolerance covers platform FFT wobble only.

    NB on LQO mapping: these are RAW P.862 scores in [-0.5, 4.5] — the
    reference's pypesq also returns raw narrowband MOS (no P.862.1 LQO
    mapping), so compatibility argues for raw here too; documented in
    docs/ARCHITECTURE.md §6 (Round-2 additions, native PESQ).
    """
    ref = _speechlike(3.0)
    rng = np.random.default_rng(42)
    noise = rng.standard_normal(len(ref)) * 0.02
    cases = {
        "identity": (ref.copy(), 4.500000),
        "noise_0.02": (ref + noise, 2.119273),
        "noise_0.06": (ref + 3 * noise, 1.501614),
        "lowpass": (np.convolve(ref, np.ones(8) / 8, mode="same"), 4.496802),
        "clip_0.1": (np.clip(ref, -0.1, 0.1), 1.893717),
        "delay_160": (np.roll(ref, 160), 4.500000),
    }
    for name, (deg, golden) in cases.items():
        got = pesq_nb(ref, deg, FS)
        assert math.isclose(got, golden, abs_tol=2e-3), (name, got, golden)


def test_monotone_in_clipping_severity():
    """Metamorphic: harder amplitude clipping never improves the score."""
    ref = _speechlike(3.0)
    scores = [pesq_nb(ref, np.clip(ref, -c, c), FS)
              for c in (0.5, 0.2, 0.1, 0.05)]
    for a, b in zip(scores, scores[1:]):
        assert b <= a + 1e-6, scores


def test_monotone_in_bandwidth_loss():
    """Metamorphic: stronger low-pass smearing never improves the score."""
    ref = _speechlike(3.0)
    scores = []
    for k in (4, 16, 48):
        deg = np.convolve(ref, np.ones(k) / k, mode="same")
        scores.append(pesq_nb(ref, deg, FS))
    for a, b in zip(scores, scores[1:]):
        assert b <= a + 1e-6, scores


def test_conformance_corpus_matches_committed_manifest():
    """The committed fixture corpus scores are reproduced exactly —
    a refactor cannot silently move PESQ-derived numbers. The same
    corpus is the input to `python -m sos_tpu.eval.pesq_conformance`,
    which prints native-vs-conformant deltas the moment a conformant
    backend (pypesq/pesq) is importable."""
    import json
    import os

    from sos_tpu.eval.pesq_conformance import score_corpus

    manifest = os.path.join(os.path.dirname(__file__), "fixtures",
                            "pesq_native_scores.json")
    with open(manifest) as fp:
        want = json.load(fp)
    got = score_corpus("native")
    assert set(got) == set(want)
    for name in want:
        assert got[name] == pytest.approx(want[name], abs=1e-9), name


def test_conformance_corpus_family_monotonicity():
    """The offline-certifiable bound: scores are monotone within each
    degradation family over the operating range (awgn 0..20 dB,
    clipping severity, bandwidth loss). Below 0 dB the native model is
    NOT monotone (measured: -10 dB scores 0.17 above 0 dB) — recorded
    in docs/PARITY.md as the known uncertified region."""
    import json
    import os

    manifest = os.path.join(os.path.dirname(__file__), "fixtures",
                            "pesq_native_scores.json")
    with open(manifest) as fp:
        s = json.load(fp)
    assert s["awgn_snr+0"] < s["awgn_snr+5"] < s["awgn_snr+10"] \
        < s["awgn_snr+15"] < s["awgn_snr+20"]
    assert s["clip_0.1"] < s["clip_0.25"] < s["clip_0.5"]
    # 3400 Hz sits at the narrowband edge: 2000/3400 both saturate at
    # ~4.5 (delta 4e-5, below the model's resolution) — only the
    # in-band cutoff is ordered
    assert s["lowpass_1000"] < s["lowpass_2000"]
