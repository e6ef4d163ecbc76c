"""End-to-end pipeline test: preprocess -> detect -> bridge -> denoise.

Exercises the full two-stage flow on synthetic WAVs with tiny random
models, verifying every on-disk handshake artifact (dataset JSON,
eval_results.json, noise dir, pred_data.json, recovered wavs, per-file
outputs, final metric aggregates) against the reference schemas.
"""

import json
import os

import numpy as np
import pytest

import jax

from sos_tpu.config import (
    DataConfig,
    DenoiserModelConfig,
    DetectorModelConfig,
    ExperimentConfig,
)
from sos_tpu.data.preprocess import build_dataset_json, label_bitstream
from sos_tpu.data.sampling import NoiseBank
from sos_tpu.dsp import audio_io
from sos_tpu.infer.denoise import DenoiserPredictor
from sos_tpu.infer.detect import DetectorPredictor
from sos_tpu.infer.evaluate import (
    create_data_from_prediction,
    evaluate_denoiser,
    evaluate_detector,
)

pytestmark = pytest.mark.slow


def tiny_cfg():
    return ExperimentConfig(
        detector=DetectorModelConfig(
            nf=4, outf=2, kernel_sizes=((1, 7), (5, 5)),
            dilations=((1, 1), (2, 2)), lstm_hidden=4, fc_hidden=4),
        denoiser=DenoiserModelConfig(
            nf_mixed=4, nf_noise=2, outf_mixed=2, outf_noise=2,
            kernel_sizes=((1, 7), (5, 5)), dilations=((1, 1), (2, 2)),
            lstm_hidden=4, fc_hidden=8, inpaint_ch=(4, 6, 8)),
        data=DataConfig(),
    )


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    sr = 14000
    audio_dir = root / "clips"
    audio_dir.mkdir()
    for i in range(2):
        # speech-like bursts with silent gaps
        n = int(3.0 * sr)
        y = np.zeros(n, dtype=np.float32)
        for s in range(0, n, sr):
            y[s:s + sr // 2] = rng.standard_normal(sr // 2) * 0.3
        audio_io.write_wav(str(audio_dir / f"clip_{i}.wav"), y, sr)
    noise = [rng.standard_normal(sr * 5).astype(np.float32) * 0.2
             for _ in range(2)]
    return {"root": root, "audio_dir": audio_dir, "sr": sr,
            "noise": NoiseBank.from_arrays(noise, sr)}


def test_full_pipeline(workdir):
    cfg = tiny_cfg()
    root = workdir["root"]

    # -- preprocess: build dataset JSON with energy-threshold labels
    ds_json = str(root / "dataset.json")
    index = build_dataset_json(str(workdir["audio_dir"]), ds_json,
                               label_silence=True)
    assert index.num_files == 2
    with open(ds_json) as fp:
        raw = json.load(fp)
    assert set(raw["files"][0]) >= {
        "path", "framerate", "audio_sample_rate", "audio_samples",
        "duration", "num_frames", "bit_stream", "audio_path"}
    assert set(raw["files"][0]["bit_stream"]) <= {"0", "1", "2"}

    # -- stage 1: detector inference with mixing
    det_model_vars = None
    from sos_tpu.models import SilenceDetector

    det = SilenceDetector(cfg.detector)
    dummy = np.zeros((1, 256, 90, 2), np.float32)
    det_model_vars = det.init(jax.random.PRNGKey(0), dummy)
    predictor = DetectorPredictor(cfg, det_model_vars)
    out_dir = str(root / "outputs")
    eval_json = evaluate_detector(cfg, predictor, ds_json, out_dir,
                                  noise_bank=workdir["noise"], snr_idx=3,
                                  clean_audio=True)
    with open(eval_json) as fp:
        payload = json.load(fp)
    assert payload["data_total_frames"] == 60
    assert payload["snr"] == 0
    assert "all" in payload["prediction_statistics"]
    rec = payload["data"][0]
    assert len(rec["pred_label"]) == len(rec["label"])
    assert os.path.isdir(os.path.join(out_dir, "noise_snr0"))
    noise_json = os.path.join(out_dir, "noise_snr0", "snr0.json")
    assert os.path.exists(noise_json)

    # -- bridge: eval_results -> pred_data + recovered wavs
    pred_json = create_data_from_prediction(cfg, eval_json, noise_snr=0,
                                            clean_audio=True)
    with open(pred_json) as fp:
        bridge = json.load(fp)
    assert bridge["num_videos"] == 2
    f0 = bridge["files"][0]
    for key in ("bit_stream", "ground_truth_bit_stream",
                "predicted_bit_stream", "recovered_prediction",
                "mixed_audio", "clean_audio", "full_noise"):
        assert key in f0, key
    assert len(f0["recovered_prediction"]) == len(f0["ground_truth_bit_stream"])
    mixed_wav = os.path.join(os.path.dirname(pred_json), f0["mixed_audio"])
    assert os.path.exists(mixed_wav)
    # re-mixed additivity: mixed == clean + full_noise
    m, _ = audio_io.load(mixed_wav, sr=workdir["sr"])
    c, _ = audio_io.load(mixed_wav.replace("_mixed", "_clean"), sr=workdir["sr"])
    n, _ = audio_io.load(mixed_wav.replace("_mixed", "_full_noise"),
                         sr=workdir["sr"])
    np.testing.assert_allclose(m, c + n, atol=2e-4)  # 16-bit quantization

    # -- stage 2: denoiser inference + metrics
    from sos_tpu.models import JointDenoiser

    den = JointDenoiser(cfg.denoiser)
    den_vars = den.init(jax.random.PRNGKey(1),
                        np.zeros((1, 256, 90, 2), np.float32),
                        np.zeros((1, 256, 90, 2), np.float32))
    dpred = DenoiserPredictor(cfg, den_vars)
    final_dir = str(root / "denoise_out")
    final_json = evaluate_denoiser(cfg, dpred, pred_json, final_dir, snr=0)
    with open(final_json) as fp:
        final = json.load(fp)
    stats = final["denoise_statistics"]
    for key in ("avg_l1", "avg_stoi", "avg_ssnr_regular", "avg_overall_snr"):
        assert key in stats
        assert np.isfinite(stats[key]), key
    item = final["files"][0]
    assert os.path.exists(item["denoised_output"])
    den_wav, _ = audio_io.load(item["denoised_output"], sr=workdir["sr"])
    assert len(den_wav) > 0 and np.isfinite(den_wav).all()


def test_label_bitstream_energy():
    sr = 14000
    y = np.zeros(sr, dtype=np.float32)
    y[: sr // 2] = 0.5  # loud first half
    bits = label_bitstream(y, sr, framerate=30.0, threshold=0.08)
    assert bits[:10] == "1" * 10
    assert bits[-5:] == "0" * 5


def test_detector_eval_unknown_clean_signal(workdir):
    """--unknown_clean_signal path: no mixing, no noise artifacts."""
    import jax

    from sos_tpu.models import SilenceDetector

    cfg = tiny_cfg()
    det = SilenceDetector(cfg.detector)
    det_vars = det.init(jax.random.PRNGKey(0),
                        np.zeros((1, 256, 90, 2), np.float32))
    predictor = DetectorPredictor(cfg, det_vars)
    root = workdir["root"]
    ds_json = str(root / "dataset.json")
    out_dir = str(root / "unknown_outputs")
    eval_json = evaluate_detector(cfg, predictor, ds_json, out_dir,
                                  noise_bank=None, clean_audio=False)
    with open(eval_json) as fp:
        payload = json.load(fp)
    assert payload["snr"] is None
    assert not os.path.isdir(os.path.join(out_dir, "noise"))
    assert len(payload["data"]) == 2


def test_fit_profiler_hook(tmp_path):
    """jax.profiler trace capture around steps doesn't disturb training."""
    from sos_tpu.data import DetectorBatcher, NoiseBank, detector_windows
    from sos_tpu.data.preprocess import build_dataset_json
    from sos_tpu.train.fit import fit
    from sos_tpu.train.loop import (
        init_detector_state, make_detector_eval_step, make_detector_train_step)
    from sos_tpu.train.state import TrainClock

    rng = np.random.default_rng(3)
    audio_dir = tmp_path / "clips"
    audio_dir.mkdir()
    sr = 14000
    for i in range(2):
        audio_io.write_wav(str(audio_dir / f"c{i}.wav"),
                           rng.standard_normal(sr * 4).astype(np.float32) * 0.3,
                           sr)
    idx = build_dataset_json(str(audio_dir), str(tmp_path / "ds.json"))
    import dataclasses

    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, nr_epochs=1, batch_size=2,
                                       val_frequency=2))
    noise = NoiseBank.from_arrays(
        [rng.standard_normal(sr * 5).astype(np.float32)], sr)
    wins = detector_windows(idx.files, cfg.data.clip_frames)
    train_b = DetectorBatcher(wins, noise, cfg.data, 2, shuffle=True)
    val_b = DetectorBatcher(wins, noise, cfg.data, 2, shuffle=False)
    model, state = init_detector_state(cfg, steps_per_epoch=len(train_b))
    fit(cfg, state, TrainClock(),
        make_detector_train_step(cfg, model, len(train_b)),
        make_detector_eval_step(cfg, model),
        train_b, val_b, str(tmp_path / "model"), str(tmp_path / "log"),
        profile_dir=str(tmp_path / "trace"), profile_steps=(1, 2))
    assert os.path.isdir(str(tmp_path / "trace"))


def test_preprocess_label_flags(tmp_path):
    """--label_threshold/--label_pad_seconds reach the labeler: padding
    frames become '2' at both edges; a higher threshold marks more
    silence."""
    import sys

    from sos_tpu.cli import preprocess as pp
    from sos_tpu.data.index import DatasetIndex
    from sos_tpu.dsp import audio_io

    sr = 44100
    rng = np.random.default_rng(3)
    d = tmp_path / "clips"
    d.mkdir()
    y = np.zeros(4 * sr, np.float32)
    y[: sr] = rng.standard_normal(sr) * 0.5          # loud second
    y[2 * sr: 3 * sr] = rng.standard_normal(sr) * 0.02  # quiet second
    audio_io.write_wav(str(d / "c.wav"), y, sr)

    def run(extra, out):
        old = sys.argv
        sys.argv = ["prog", "--audio_dir", str(d), "--output_json", out,
                    "--label_silence"] + extra
        try:
            pp.main()
        finally:
            sys.argv = old
        return DatasetIndex.load(out).files[0].bit_stream

    bits_pad = run(["--label_pad_seconds", "1.0"],
                   str(tmp_path / "a.json"))
    assert bits_pad[:30] == "2" * 30 and bits_pad[-30:] == "2" * 30

    lo = run(["--label_threshold", "0.01"], str(tmp_path / "b.json"))
    hi = run(["--label_threshold", "0.3"], str(tmp_path / "c.json"))
    assert hi.count("0") > lo.count("0")


def test_preprocess_partial_tail_frame_label(tmp_path):
    """The trailing partial frame (duration ceil vs the labeler's floor)
    stays inside the '2' ignore margin when --label_pad_seconds is set,
    and defaults to '1' otherwise."""
    from sos_tpu.data.preprocess import process_audio_file
    from sos_tpu.dsp import audio_io

    sr = 44100
    rng = np.random.default_rng(7)
    # 4.01 s: 120 full frames + a partial tail frame -> num_frames 121
    y = rng.standard_normal(int(4.01 * sr)).astype(np.float32) * 0.5
    path = str(tmp_path / "t.wav")
    audio_io.write_wav(path, y, sr)

    rec = process_audio_file(path, label_silence=True,
                             label_pad_seconds=1.0)
    assert rec.num_frames == 121
    assert rec.bit_stream[-31:] == "2" * 31  # 30 padded + the tail frame

    rec0 = process_audio_file(path, label_silence=True)
    assert rec0.num_frames == 121
    assert rec0.bit_stream[-1] == "1"  # no margin: unknown tail = sound
