"""Batched bucketed evaluation == the reference-style batch-1 loop.

The reference evaluates utterance-by-utterance (m1 predict.py:71 batch-1
dataloader; m2 predict.py:405-526 one file at a time), idling the
accelerator. The batched mode groups same-bucket utterances into vmapped
tiles; these tests pin that predicted bits are IDENTICAL and confidences/
waveforms agree to float rounding, end-to-end through the eval drivers.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp
import jax.random as jr

from sos_tpu.config import (DataConfig, DenoiserModelConfig,
                            DetectorModelConfig, ExperimentConfig)
from sos_tpu.data import NoiseBank
from sos_tpu.dsp import audio_io
from sos_tpu.infer.detect import DetectorPredictor
from sos_tpu.infer.denoise import DenoiserPredictor
from sos_tpu.infer.evaluate import evaluate_detector
from sos_tpu.models import JointDenoiser, SilenceDetector


def _cfg():
    return ExperimentConfig(
        detector=DetectorModelConfig(
            nf=4, outf=2, kernel_sizes=((1, 7), (5, 5)),
            dilations=((1, 1), (2, 2)), lstm_hidden=4, fc_hidden=4),
        denoiser=DenoiserModelConfig(
            nf_mixed=4, nf_noise=2, outf_mixed=2, outf_noise=2,
            kernel_sizes=((1, 7), (5, 5)), dilations=((1, 1), (2, 2)),
            lstm_hidden=4, fc_hidden=8, inpaint_ch=(4, 6, 8)),
        data=DataConfig(num_train_samples=4))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("batched_eval")
    rng = np.random.default_rng(3)
    sr = 14000
    files = []
    for i, dur in enumerate((2.0, 3.1, 2.6)):  # distinct lengths
        n = int(dur * sr)
        y = np.zeros(n, np.float32)
        for s in range(0, n, sr):
            y[s:s + sr // 2] = rng.standard_normal(
                min(sr // 2, n - s)).astype(np.float32) * 0.3
        path = str(root / f"c{i}.wav")
        audio_io.write_wav(path, y, sr)
        frames = int(dur * 30)
        files.append({
            "path": path, "audio_path": path, "framerate": 30,
            "audio_sample_rate": sr, "audio_samples": n,
            "duration": dur, "num_frames": frames,
            "bit_stream": "".join(
                "1" if (j // 15) % 2 == 0 else "0" for j in range(frames)),
        })
    ds = {"dataset_path": str(root), "num_videos": len(files),
          "files": files}
    ds_json = str(root / "ds.json")
    with open(ds_json, "w") as fp:
        json.dump(ds, fp)
    noise_dir = root / "noise"
    noise_dir.mkdir()
    audio_io.write_wav(str(noise_dir / "n0.wav"),
                       rng.standard_normal(sr * 5).astype(np.float32) * 0.2,
                       sr)
    return {"root": root, "ds_json": ds_json, "noise_dir": str(noise_dir)}


@pytest.mark.slow
def test_detector_eval_batched_equals_serial(corpus, tmp_path):
    cfg = _cfg()
    model = SilenceDetector(cfg.detector)
    variables = model.init(jr.PRNGKey(0), jnp.zeros((1, 256, 64, 2)))
    noise = NoiseBank.from_roots(corpus["noise_dir"], cfg.data.sample_rate)

    out_serial = evaluate_detector(
        cfg, DetectorPredictor(cfg, variables, buckets=(256, 512)),
        corpus["ds_json"], str(tmp_path / "serial"),
        noise_bank=noise, snr_idx=3)
    out_batched = evaluate_detector(
        cfg, DetectorPredictor(cfg, variables, buckets=(256, 512)),
        corpus["ds_json"], str(tmp_path / "batched"),
        noise_bank=noise, snr_idx=3, batch_size=2)

    with open(out_serial) as fp:
        a = json.load(fp)
    with open(out_batched) as fp:
        b = json.load(fp)
    assert a["prediction_statistics"] == b["prediction_statistics"]
    for ra, rb in zip(a["data"], b["data"]):
        assert ra["pred_label"] == rb["pred_label"]
        assert ra["label"] == rb["label"]
        ca = np.asarray([float(c) for c in ra["confidence"]])
        cb = np.asarray([float(c) for c in rb["confidence"]])
        np.testing.assert_allclose(ca, cb, atol=1e-6)


@pytest.mark.slow
def test_denoiser_batch_equals_loop():
    cfg = _cfg()
    model = JointDenoiser(cfg.denoiser)
    variables = model.init(jr.PRNGKey(1), jnp.zeros((1, 256, 64, 2)),
                           jnp.zeros((1, 256, 64, 2)))
    pred = DenoiserPredictor(cfg, variables, buckets=(192, 384))
    rng = np.random.default_rng(5)
    waves = [rng.standard_normal(n).astype(np.float32) * 0.3
             for n in (28000, 21000, 33000, 52000, 28000)]
    bits = ["10" * (len(w) // 932 + 1) for w in waves]
    singles = [pred.denoise_waveform(w, b) for w, b in zip(waves, bits)]
    batched = pred.denoise_batch(waves, bits, batch_size=3)
    for s, bt in zip(singles, batched):
        for key in ("denoised", "predicted_noise", "gated_noise"):
            assert len(s[key]) == len(bt[key])
            np.testing.assert_allclose(s[key], bt[key], atol=5e-6)


def test_detector_batch_no_buckets_falls_back():
    cfg = _cfg()
    model = SilenceDetector(cfg.detector)
    variables = model.init(jr.PRNGKey(2), jnp.zeros((1, 256, 64, 2)))
    pred = DetectorPredictor(cfg, variables, buckets=None)
    rng = np.random.default_rng(6)
    waves = [rng.standard_normal(20000).astype(np.float32)]
    out = pred.predict_batch(waves, [43], batch_size=4)
    bits, conf = out[0]
    b2, c2 = pred.predict_waveform(waves[0], 43)
    assert np.array_equal(bits, b2)
    np.testing.assert_allclose(conf, c2, atol=0)


@pytest.mark.slow
def test_synthetic_eval_noisy_baseline():
    """noisy_baseline=True adds noisy_avg_* keys scoring mixed vs clean;
    at high SNR the noisy overall_snr must far exceed a random model's
    output score."""
    import dataclasses

    import jax.random as jr

    from sos_tpu.config import (DataConfig, DenoiserModelConfig,
                                ExperimentConfig)
    from sos_tpu.data.pipeline import DenoiserBatcher
    from sos_tpu.data.sampling import NoiseBank
    from sos_tpu.data.windows import DenoiserWindow
    from sos_tpu.infer.synthetic_eval import evaluate_synthetic
    from sos_tpu.models import JointDenoiser

    cfg = ExperimentConfig(
        denoiser=DenoiserModelConfig(
            nf_mixed=4, nf_noise=2, outf_mixed=2, outf_noise=2,
            kernel_sizes=((1, 7), (5, 5)), dilations=((1, 1), (2, 2)),
            lstm_hidden=4, fc_hidden=8, inpaint_ch=(4, 6, 8)),
        data=DataConfig(snr_idx=6))  # +10 dB
    rng = np.random.default_rng(5)
    sr = cfg.data.sample_rate
    import pathlib
    import tempfile

    from sos_tpu.dsp import audio_io

    with tempfile.TemporaryDirectory() as td:
        wav = pathlib.Path(td) / "c.wav"
        audio_io.write_wav(str(wav),
                           rng.standard_normal(sr * 4).astype(np.float32)
                           * 0.3, sr)
        windows = [DenoiserWindow(file_index=0, audio_path=str(wav),
                                  start_sec=0.0, end_sec=2.0,
                                  bits="1" * 60, framerate=30),
                   DenoiserWindow(file_index=0, audio_path=str(wav),
                                  start_sec=1.0, end_sec=3.0,
                                  bits="1" * 60, framerate=30)]
        bank = NoiseBank.from_arrays(
            [rng.standard_normal(sr * 6).astype(np.float32) * 0.2], sr)
        batcher = DenoiserBatcher(windows, bank, cfg.data, batch_size=2,
                                  shuffle=False)
        model = JointDenoiser(cfg.denoiser)
        dummy = jnp.zeros((1, 256, 178, 2))
        v = model.init(jr.PRNGKey(0), dummy, dummy)
        agg = evaluate_synthetic(cfg, v, batcher, noisy_baseline=True)
    assert agg["num_clips"] == 2
    assert np.isfinite(agg["noisy_avg_overall_snr"])
    assert np.isfinite(agg["noisy_avg_stoi"])
    # +10 dB mixtures: noisy baseline must beat a random-weight model
    assert agg["noisy_avg_overall_snr"] > agg["avg_overall_snr"]


@pytest.mark.slow  # two full int8-pipeline compiles (~40 s on 1 core)
def test_synthetic_eval_int8_profile_and_head_knob():
    """evaluate_synthetic(profile="int8") self-calibrates and returns
    finite metrics; quant_kwargs plumbs bf16_head_proj through, and the
    two head modes agree closely on the quality suite (the in-graph
    drift bound is pinned by test_quant.py — this pins the eval-surface
    plumbing end to end)."""
    import dataclasses
    import pathlib
    import tempfile

    from sos_tpu.data.pipeline import DenoiserBatcher
    from sos_tpu.data.windows import DenoiserWindow
    from sos_tpu.infer.synthetic_eval import evaluate_synthetic

    cfg = ExperimentConfig(
        denoiser=DenoiserModelConfig(
            nf_mixed=4, nf_noise=2, outf_mixed=2, outf_noise=2,
            kernel_sizes=((1, 7), (5, 5)), dilations=((1, 1), (2, 2)),
            lstm_hidden=4, fc_hidden=8, inpaint_ch=(4, 6, 8)),
        data=DataConfig(snr_idx=6))
    rng = np.random.default_rng(7)
    sr = cfg.data.sample_rate
    with tempfile.TemporaryDirectory() as td:
        wav = pathlib.Path(td) / "c.wav"
        audio_io.write_wav(str(wav),
                           rng.standard_normal(sr * 3).astype(np.float32)
                           * 0.3, sr)
        windows = [DenoiserWindow(file_index=0, audio_path=str(wav),
                                  start_sec=0.0, end_sec=2.0,
                                  bits="1" * 60, framerate=30)]
        bank = NoiseBank.from_arrays(
            [rng.standard_normal(sr * 5).astype(np.float32) * 0.2], sr)
        model = JointDenoiser(cfg.denoiser)
        dummy = jnp.zeros((1, 256, 178, 2))
        v = model.init(jr.PRNGKey(0), dummy, dummy)
        aggs = {}
        for bf16 in (True, False):
            batcher = DenoiserBatcher(windows, bank, cfg.data,
                                      batch_size=1, shuffle=False)
            aggs[bf16] = evaluate_synthetic(
                cfg, v, batcher, profile="int8",
                quant_kwargs={"bf16_head_proj": bf16})
    for agg in aggs.values():
        assert agg["num_clips"] == 1
        assert np.isfinite(agg["avg_stoi"]) and np.isfinite(agg["avg_pesq"])
    # same int8 trunk, heads differ only in projection dtype
    assert abs(aggs[True]["avg_stoi"] - aggs[False]["avg_stoi"]) < 1e-3
    assert abs(aggs[True]["avg_pesq"] - aggs[False]["avg_pesq"]) < 5e-3


def test_report_compare_evals(tmp_path, capsys):
    from sos_tpu.cli.report import compare_evals

    a = {"snr_-10": {"avg_stoi": 0.5, "avg_pesq": 2.0, "num_clips": 4},
         "snr_0": {"avg_stoi": 0.6, "avg_pesq": 2.5}}
    b = {"snr_-10": {"avg_stoi": 0.49, "avg_pesq": 2.02},
         "snr_10": {"avg_stoi": 0.7}}
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    compare_evals(str(pa), str(pb))
    out = capsys.readouterr().out
    assert "snr_-10: stoi-0.0100 pesq+0.0200" in out
    assert "only one file" in out and "snr_0" in out and "snr_10" in out


def test_detector_eval_rejects_duplicate_basenames(corpus, tmp_path):
    """The noise-assignment JSON is keyed by wav basename (reference
    schema): two files sharing a basename must fail loudly instead of
    silently swapping noise assignments in the bridge."""
    cfg = _cfg()
    sr = cfg.data.sample_rate
    with open(corpus["ds_json"]) as fp:
        ds = json.load(fp)
    for sub in ("a", "b"):
        d = tmp_path / sub
        d.mkdir()
        path = str(d / "utt.wav")
        audio_io.write_wav(
            path, np.zeros(int(2.0 * sr), np.float32), sr)
        rec = dict(ds["files"][0])
        rec.update(path=path, audio_path=path)
        ds["files"].append(rec)
    ds["num_videos"] = len(ds["files"])
    dup_json = str(tmp_path / "dup.json")
    with open(dup_json, "w") as fp:
        json.dump(ds, fp)

    model = SilenceDetector(cfg.detector)
    variables = model.init(jr.PRNGKey(0), jnp.zeros((1, 256, 64, 2)))
    noise = NoiseBank.from_roots(corpus["noise_dir"], cfg.data.sample_rate)
    with pytest.raises(ValueError, match="duplicate wav basenames"):
        evaluate_detector(
            cfg, DetectorPredictor(cfg, variables, buckets=(256, 512)),
            dup_json, str(tmp_path / "out"), noise_bank=noise, snr_idx=3)
