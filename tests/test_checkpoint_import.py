"""Reference-checkpoint (.pth) file import path + config serialization."""

import numpy as np
import torch

import jax.numpy as jnp

from sos_tpu.config import DetectorModelConfig, ExperimentConfig
from sos_tpu.models import SilenceDetector
from sos_tpu.models.torch_import import import_detector_checkpoint

from tests.test_model_parity import DILS, KS, SPECS, _state_np
from tests.torch_oracles import DetectorOracle


def test_pth_file_roundtrip(tmp_path, rng):
    """torch.save'd checkpoint (reference layout: m1 agent.py:62-83) loads
    and produces the same outputs as the in-memory import."""
    torch.manual_seed(5)
    oracle = DetectorOracle(SPECS, freq_bins=64, nf=8, outf=4,
                            hidden=16, fc_hidden=12)
    oracle.eval()
    ckpt_path = str(tmp_path / "ckpt_epoch1.pth")
    torch.save({
        "clock": {"epoch": 1, "minibatch": 0, "step": 10},
        "model_state_dict": oracle.state_dict(),
        "optimizer_state_dict": {},
        "scheduler_state_dict": {},
    }, ckpt_path)

    variables = import_detector_checkpoint(ckpt_path)
    cfg = DetectorModelConfig(freq_bins=64, nf=8, outf=4, kernel_sizes=KS,
                              dilations=DILS, lstm_hidden=16, fc_hidden=12,
                              num_frames=10)
    model = SilenceDetector(cfg)
    x = rng.standard_normal((1, 64, 30, 2)).astype(np.float32)
    ours = np.asarray(model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), num_frames=10))
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     v_num_frames=10).numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


def test_experiment_config_json_roundtrip():
    cfg = ExperimentConfig(name="exp1")
    text = cfg.to_json()
    again = ExperimentConfig.from_json(text)
    assert again == cfg
    assert again.detector.kernel_sizes == cfg.detector.kernel_sizes
    assert again.data.snrs == cfg.data.snrs
