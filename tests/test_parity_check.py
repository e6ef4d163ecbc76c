"""parity_check CLI: fabricated FULL-SIZE .pth -> end-to-end -> deltas.

Proves the one-command real-checkpoint parity harness (BASELINE.md's
PESQ/STOI-within-0.01 bar) on fabricated full-size reference
checkpoints, so the day the released ckpt_epoch87.pth/ckpt_epoch24.pth
appear the check is a single documented command (README "Checkpoint
parity"). Full-size models through the whole two-stage pipeline on CPU
-> marked slow.
"""

import json
import os
import sys
import types

import numpy as np
import pytest
import torch

from sos_tpu.config import (DataConfig, DenoiserModelConfig,
                            ExperimentConfig, TrainConfig)
from sos_tpu.dsp import audio_io

from tests.test_reference_parity import M1_NETWORKS, M2_NETWORKS, _load_module
from tests.torch_oracles import randomize_bn_stats

pytestmark = pytest.mark.slow


def _save_pth(path, net, epoch):
    """The reference's checkpoint layout (m1 agent.py:62-83)."""
    torch.save({
        "clock": {"epoch": epoch, "minibatch": 0, "step": 100},
        "model_state_dict": net.state_dict(),
        "optimizer_state_dict": {},
        "scheduler_state_dict": {},
    }, path)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity")

    # fabricated FULL-SIZE reference checkpoints from the reference's
    # own networks.py (random weights + non-trivial BN running stats)
    ref_m1 = _load_module("pc_ref_m1", M1_NETWORKS)
    torch.manual_seed(7)
    det = ref_m1.AudioVisualNet()
    with torch.no_grad():
        randomize_bn_stats(det, torch.Generator().manual_seed(8))
    det_pth = str(root / "ckpt_epoch87.pth")
    _save_pth(det_pth, det, 87)

    ref_m2 = _load_module("pc_ref_m2", M2_NETWORKS)
    den_cfg = DenoiserModelConfig()
    torch.manual_seed(9)
    den = ref_m2.JointModel(types.SimpleNamespace(
        kernel_sizes=[tuple(k) for k in den_cfg.kernel_sizes],
        dilations=[tuple(d) for d in den_cfg.dilations]))
    with torch.no_grad():
        randomize_bn_stats(den, torch.Generator().manual_seed(10))
    den_pth = str(root / "ckpt_epoch24.pth")
    _save_pth(den_pth, den, 24)

    # tiny 2-clip corpus + noise, full-size STFT geometry
    rng = np.random.default_rng(3)
    sr = 14000
    (root / "clips").mkdir()
    (root / "noise").mkdir()
    for i in range(2):
        n = 2 * sr
        y = np.zeros(n, np.float32)
        for s in range(0, n, sr // 2):
            y[s:s + sr // 4] = rng.standard_normal(sr // 4) * 0.3
        audio_io.write_wav(str(root / "clips" / f"c{i}.wav"), y, sr)
        audio_io.write_wav(str(root / "noise" / f"n{i}.wav"),
                           rng.standard_normal(3 * sr).astype(np.float32) * 0.2,
                           sr)

    cfg = ExperimentConfig(data=DataConfig(), train=TrainConfig())
    cfg_path = root / "config.json"
    cfg_path.write_text(cfg.to_json())

    # dataset json via the preprocess CLI (the real surface)
    from sos_tpu.cli import preprocess

    ds_json = str(root / "ds.json")
    old_argv = sys.argv
    sys.argv = ["prog", "--audio_dir", str(root / "clips"),
                "--output_json", ds_json, "--label_silence"]
    try:
        preprocess.main()
    finally:
        sys.argv = old_argv
    return {"root": root, "det_pth": det_pth, "den_pth": den_pth,
            "ds": ds_json, "noise": str(root / "noise"),
            "cfg": str(cfg_path)}


def _run_parity(env, monkeypatch, extra):
    from sos_tpu.cli import parity_check

    root = env["root"]
    argv = ["prog",
            "--detector_pth", env["det_pth"],
            "--denoiser_pth", env["den_pth"],
            "--dataset_json", env["ds"], "--noise_root", env["noise"],
            "--output_root", str(root / "model_output"),
            "--config_json", env["cfg"], "--name", "parity",
            "--outputs", str(root / "parity_out"),
            "--snr_idx", "3"] + extra
    monkeypatch.setattr(sys, "argv", argv)
    parity_check.main()


def test_parity_check_full_size_pth_end_to_end(env, monkeypatch, capsys):
    """No manifest: runs .pth import -> detect -> bridge -> denoise ->
    metrics and prints the statistics; then the SAME run's output used
    as manifest must pass with zero deltas, and a perturbed manifest
    must fail with exit code 1."""
    root = env["root"]
    _run_parity(env, monkeypatch, [])
    out = capsys.readouterr().out
    assert "avg_pesq" in out and "avg_stoi" in out
    final_json = os.path.join(str(root / "parity_out"),
                              "eval_results_snr0.json")
    assert os.path.exists(final_json)
    with open(final_json) as fp:
        stats = json.load(fp)["denoise_statistics"]
    assert all(np.isfinite(v) for v in stats.values()), stats

    # self-manifest: deltas are exactly zero -> PARITY OK + report file
    report_path = str(root / "report.json")
    _run_parity(env, monkeypatch, ["--manifest", final_json,
                                   "--out", report_path])
    out = capsys.readouterr().out
    assert "PARITY OK" in out
    with open(report_path) as fp:
        report = json.load(fp)
    assert report["pass"] is True
    assert all(abs(d) < 1e-12 for d in report["delta"].values())

    # perturbed manifest beyond tolerance -> exit 1
    bad = dict(stats)
    bad["avg_pesq"] = bad["avg_pesq"] + 0.5
    bad_path = str(root / "bad_manifest.json")
    with open(bad_path, "w") as fp:
        json.dump({"denoise_statistics": bad}, fp)
    with pytest.raises(SystemExit) as exc:
        _run_parity(env, monkeypatch, ["--manifest", bad_path])
    assert exc.value.code == 1
    assert "PARITY FAIL" in capsys.readouterr().err

    # manifest lacking the gated metrics must NOT pass vacuously: the
    # bar is defined on avg_pesq/avg_stoi -> exit 2, not PARITY OK
    partial = {k: v for k, v in stats.items() if k != "avg_pesq"}
    partial_path = str(root / "partial_manifest.json")
    with open(partial_path, "w") as fp:
        json.dump({"denoise_statistics": partial}, fp)
    with pytest.raises(SystemExit) as exc:
        _run_parity(env, monkeypatch, ["--manifest", partial_path])
    assert exc.value.code == 2
    captured = capsys.readouterr()
    assert "PARITY ERROR" in captured.err
    assert "PARITY OK" not in captured.out
