"""Numerical parity: flax models vs torch oracles via the .pth importer.

Random torch weights (incl. randomized BN running stats) are converted
with `sos_tpu.models.torch_import` and both frameworks run the same
inputs in eval mode. Reduced sizes keep the 1-core CI fast; the
architecture/dataflow is identical to the full configuration.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from sos_tpu.config import DenoiserModelConfig, DetectorModelConfig
from sos_tpu.models import JointDenoiser, SilenceDetector
from sos_tpu.models.torch_import import (
    denoiser_torch_to_flax,
    detector_torch_to_flax,
    strip_data_parallel,
)

from tests.torch_oracles import DetectorOracle, JointOracle, randomize_bn_stats

SPECS = (
    ((1, 7), (1, 1)),
    ((7, 1), (1, 1)),
    ((5, 5), (2, 1)),
    ((5, 5), (4, 4)),
    ((5, 5), (8, 8)),
)
KS = tuple(s[0] for s in SPECS)
DILS = tuple(s[1] for s in SPECS)


def _state_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_detector_parity(rng):
    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(7)
    freq, t_in, frames = 64, 50, 20
    oracle = DetectorOracle(SPECS, freq_bins=freq, nf=8, outf=4,
                            hidden=16, fc_hidden=12)
    with torch.no_grad():
        randomize_bn_stats(oracle, gen)
    oracle.eval()

    x = rng.standard_normal((2, 2, freq, t_in)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x), v_num_frames=frames).numpy()

    cfg = DetectorModelConfig(freq_bins=freq, nf=8, outf=4, kernel_sizes=KS,
                              dilations=DILS, lstm_hidden=16, fc_hidden=12,
                              num_frames=frames)
    model = SilenceDetector(cfg)
    variables = detector_torch_to_flax(_state_np(oracle))
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))  # (B, F, T, 2)
    ours = np.asarray(model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        x_nhwc, num_frames=frames))
    assert ours.shape == ref.shape == (2, frames)
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


def test_denoiser_parity(rng):
    torch.manual_seed(1)
    gen = torch.Generator().manual_seed(8)
    freq, t_in = 96, 72  # after two stride-2 downs: 24x18 > dilation-16 pad
    oracle = JointOracle(SPECS, freq_bins=freq, ch=(8, 12, 16), nf=16,
                         hidden=16, fc_hidden=24)
    with torch.no_grad():
        randomize_bn_stats(oracle, gen)
    oracle.eval()

    mixed = rng.standard_normal((2, 2, freq, t_in)).astype(np.float32)
    gated = rng.standard_normal((2, 2, freq, t_in)).astype(np.float32)
    with torch.no_grad():
        ref_noise, ref_mask = oracle(torch.from_numpy(mixed), torch.from_numpy(gated))

    cfg = DenoiserModelConfig(freq_bins=freq, nf_mixed=16, nf_noise=8,
                              outf_mixed=8, outf_noise=4, kernel_sizes=KS,
                              dilations=DILS, lstm_hidden=16, fc_hidden=24,
                              inpaint_ch=(8, 12, 16))
    model = JointDenoiser(cfg)
    variables = denoiser_torch_to_flax(_state_np(oracle))
    m_nhwc = jnp.asarray(mixed.transpose(0, 2, 3, 1))
    g_nhwc = jnp.asarray(gated.transpose(0, 2, 3, 1))
    our_noise, our_mask = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        m_nhwc, g_nhwc)
    our_noise = np.asarray(our_noise).transpose(0, 3, 1, 2)
    our_mask = np.asarray(our_mask).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(our_noise, ref_noise.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(our_mask, ref_mask.numpy(), atol=1e-4, rtol=1e-3)


def test_strip_data_parallel():
    state = {"module.encoder_audio.0.block.0.weight": np.zeros(1), "plain": np.ones(1)}
    out = strip_data_parallel(state)
    assert "encoder_audio.0.block.0.weight" in out and "plain" in out


@pytest.mark.slow
def test_full_size_shapes():
    """Full-config shape smoke test (no torch; init only on tiny batch)."""
    import jax

    model = SilenceDetector(DetectorModelConfig())
    x = jnp.zeros((1, 256, 178, 2))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 60)

    den = JointDenoiser(DenoiserModelConfig())
    mixed = jnp.zeros((1, 256, 178, 2))
    variables = den.init(jax.random.PRNGKey(1), mixed, mixed)
    n_pred, mask = den.apply(variables, mixed, mixed)
    assert n_pred.shape == (1, 256, 178, 2)
    assert mask.shape == (1, 256, 178, 2)


def test_detector_parity_padded(rng):
    """Widened (nf padded) import still matches torch bit-for-bit."""
    torch.manual_seed(3)
    gen = torch.Generator().manual_seed(9)
    freq, t_in, frames = 64, 50, 20
    oracle = DetectorOracle(SPECS, freq_bins=freq, nf=6, outf=4,
                            hidden=16, fc_hidden=12)
    with torch.no_grad():
        randomize_bn_stats(oracle, gen)
    oracle.eval()
    x = rng.standard_normal((2, 2, freq, t_in)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x), v_num_frames=frames).numpy()

    cfg = DetectorModelConfig(freq_bins=freq, nf=8, outf=4, kernel_sizes=KS,
                              dilations=DILS, lstm_hidden=16, fc_hidden=12,
                              num_frames=frames)
    model = SilenceDetector(cfg)
    variables = detector_torch_to_flax(_state_np(oracle), nf=8)
    ours = np.asarray(model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), num_frames=frames))
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


def test_denoiser_parity_padded(rng):
    """nf_noise-padded denoiser import matches torch (fast profile is lossless)."""
    torch.manual_seed(4)
    gen = torch.Generator().manual_seed(10)
    freq, t_in = 96, 72
    oracle = JointOracle(SPECS, freq_bins=freq, ch=(8, 12, 16), nf=12,
                         hidden=16, fc_hidden=24)
    with torch.no_grad():
        randomize_bn_stats(oracle, gen)
    oracle.eval()
    mixed = rng.standard_normal((1, 2, freq, t_in)).astype(np.float32)
    gated = rng.standard_normal((1, 2, freq, t_in)).astype(np.float32)
    with torch.no_grad():
        ref_noise, ref_mask = oracle(torch.from_numpy(mixed), torch.from_numpy(gated))

    cfg = DenoiserModelConfig(freq_bins=freq, nf_mixed=12, nf_noise=8,
                              outf_mixed=8, outf_noise=4, kernel_sizes=KS,
                              dilations=DILS, lstm_hidden=16, fc_hidden=24,
                              inpaint_ch=(8, 12, 16))
    model = JointDenoiser(cfg)
    variables = denoiser_torch_to_flax(_state_np(oracle), nf_noise=8)
    our_noise, our_mask = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(mixed.transpose(0, 2, 3, 1)),
        jnp.asarray(gated.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(our_mask).transpose(0, 3, 1, 2), ref_mask.numpy(),
        atol=1e-4, rtol=1e-3)


def test_detector_smoke_parity_vs_reference_networks_py(rng):
    """Fast-tier smoke against the reference's OWN networks.py (not a
    transcribed oracle): the full-size AudioVisualNet on a SHORT input
    (T=40 instead of 178), so the default `pytest` gate always
    exercises at least one direct reference-code comparison — the
    full-length versions live in the slow tier
    (tests/test_reference_parity.py)."""
    import importlib.util

    path = ("/root/reference/model_1_silent_interval_detection/"
            "audioonly_model/networks.py")
    spec = importlib.util.spec_from_file_location("ref_m1_smoke", path)
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    torch.manual_seed(42)
    net = ref_mod.AudioVisualNet()  # full widths: 11 blocks, nf=48
    gen = torch.Generator().manual_seed(43)
    with torch.no_grad():
        randomize_bn_stats(net, gen)
    net.eval()
    x = rng.standard_normal((1, 2, 256, 40)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()

    model = SilenceDetector(DetectorModelConfig())
    variables = detector_torch_to_flax(_state_np(net))
    ours = np.asarray(model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), num_frames=ref.shape[1]))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)
