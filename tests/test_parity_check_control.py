"""Negative control for the parity harness (FAST tier).

test_parity_check.py (slow tier) proves the happy path on fabricated
full-size checkpoints. This control proves the harness cannot
false-pass: perturbing ONE tensor inside the imported `.pth` must flip
`parity_check` to exit code 1 with real avg_pesq/avg_stoi deltas. A
harness that ignored the checkpoint weights (importer bug, cached
variables) or whose metric pipeline were insensitive to the model would
pass the perturbed run silently — this test makes that impossible
before the released reference checkpoints
(ckpt_epoch87.pth/ckpt_epoch24.pth, reference README.md:69-97) arrive.

Runs at reduced widths (the oracles from tests/torch_oracles.py at the
real 256-bin STFT geometry) so the two pipeline passes fit the fast
tier's budget.
"""

import json
import os
import sys

import numpy as np
import pytest
import torch

from sos_tpu.config import (DataConfig, DenoiserModelConfig,
                            DetectorModelConfig, ExperimentConfig,
                            TrainConfig)
from sos_tpu.dsp import audio_io

from tests.test_model_parity import DILS, KS, SPECS
from tests.torch_oracles import DetectorOracle, JointOracle, randomize_bn_stats


def _save_pth(path, state_dict, epoch):
    """Reference checkpoint layout (m1 agent.py:62-83)."""
    torch.save({
        "clock": {"epoch": epoch, "minibatch": 0, "step": 100},
        "model_state_dict": state_dict,
        "optimizer_state_dict": {},
        "scheduler_state_dict": {},
    }, path)


def _run_parity(root, det_pth, den_pth, ds, noise, cfg_path, monkeypatch,
                extra):
    from sos_tpu.cli import parity_check

    argv = ["prog",
            "--detector_pth", det_pth, "--denoiser_pth", den_pth,
            "--dataset_json", ds, "--noise_root", noise,
            "--output_root", os.path.join(root, "model_output"),
            "--config_json", cfg_path, "--name", "parity_ctl",
            "--outputs", os.path.join(root, "parity_out"),
            "--snr_idx", "3"] + extra
    monkeypatch.setattr(sys, "argv", argv)
    parity_check.main()


def test_parity_check_fails_on_perturbed_checkpoint(tmp_path, monkeypatch,
                                                    capsys):
    root = str(tmp_path)
    torch.manual_seed(21)
    det = DetectorOracle(SPECS, freq_bins=256, nf=8, outf=4, hidden=8,
                         fc_hidden=8)
    den = JointOracle(SPECS, freq_bins=256, ch=(8, 12, 16), nf=8,
                      hidden=8, fc_hidden=16)
    gen = torch.Generator().manual_seed(22)
    with torch.no_grad():
        randomize_bn_stats(det, gen)
        randomize_bn_stats(den, gen)
    det_pth = os.path.join(root, "ckpt_det.pth")
    den_pth = os.path.join(root, "ckpt_den.pth")
    _save_pth(det_pth, det.state_dict(), 87)
    _save_pth(den_pth, den.state_dict(), 24)

    rng = np.random.default_rng(3)
    sr = 14000
    os.makedirs(os.path.join(root, "clips"))
    os.makedirs(os.path.join(root, "noise"))
    for i in range(2):
        n = 2 * sr
        y = np.zeros(n, np.float32)
        for s in range(0, n, sr // 2):
            y[s:s + sr // 4] = rng.standard_normal(sr // 4) * 0.3
        audio_io.write_wav(os.path.join(root, "clips", f"c{i}.wav"), y, sr)
        audio_io.write_wav(
            os.path.join(root, "noise", f"n{i}.wav"),
            rng.standard_normal(3 * sr).astype(np.float32) * 0.2, sr)

    cfg = ExperimentConfig(
        detector=DetectorModelConfig(nf=8, outf=4, kernel_sizes=KS,
                                     dilations=DILS, lstm_hidden=8,
                                     fc_hidden=8),
        denoiser=DenoiserModelConfig(nf_mixed=8, nf_noise=4, outf_mixed=8,
                                     outf_noise=4, kernel_sizes=KS,
                                     dilations=DILS, lstm_hidden=8,
                                     fc_hidden=16, inpaint_ch=(8, 12, 16)),
        data=DataConfig(), train=TrainConfig())
    cfg_path = os.path.join(root, "config.json")
    with open(cfg_path, "w") as fp:
        fp.write(cfg.to_json())

    from sos_tpu.cli import preprocess

    ds = os.path.join(root, "ds.json")
    monkeypatch.setattr(sys, "argv", ["prog", "--audio_dir",
                                      os.path.join(root, "clips"),
                                      "--output_json", ds,
                                      "--label_silence"])
    preprocess.main()

    # pass 1, original weights: create the manifest
    _run_parity(root, det_pth, den_pth, ds, os.path.join(root, "noise"),
                cfg_path, monkeypatch, [])
    capsys.readouterr()
    manifest = os.path.join(root, "parity_out", "eval_results_snr0.json")
    assert os.path.exists(manifest)

    # pass 2, ONE perturbed tensor: saturate the mask head's output bias
    # (the cRM collapses toward all-ones -> denoised drifts toward the
    # mixed input) -> the gated metrics MUST move and the harness MUST
    # exit 1, naming the deltas
    state = torch.load(den_pth, weights_only=False)
    key = "stage2.fc.4.bias"
    assert key in state["model_state_dict"]
    state["model_state_dict"][key] = state["model_state_dict"][key] + 4.0
    den_bad = os.path.join(root, "ckpt_den_bad.pth")
    torch.save(state, den_bad)

    report_path = os.path.join(root, "report.json")
    with pytest.raises(SystemExit) as exc:
        _run_parity(root, det_pth, den_bad, ds,
                    os.path.join(root, "noise"), cfg_path, monkeypatch,
                    ["--manifest", manifest, "--out", report_path])
    assert exc.value.code == 1
    captured = capsys.readouterr()
    assert "PARITY FAIL" in captured.err
    with open(report_path) as fp:
        report = json.load(fp)
    assert report["pass"] is False
    # the deltas are real, not rounding: at least one gated metric moved
    # beyond the 0.01 bar
    assert max(abs(report["delta"]["avg_pesq"]),
               abs(report["delta"]["avg_stoi"])) > 0.01, report["delta"]
