"""AOT serving artifacts: export -> serialize -> deserialize -> bit-match."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.random as jr

from sos_tpu.config import (DataConfig, DenoiserModelConfig,
                            DetectorModelConfig, ExperimentConfig)
from sos_tpu.infer.export import (export_denoise_program,
                                  load_denoise_program)
from sos_tpu.infer.fused import FusedDenoisePipeline
from sos_tpu.models import JointDenoiser, SilenceDetector


@pytest.fixture(scope="module")
def env():
    det_cfg = DetectorModelConfig(nf=4, outf=2, kernel_sizes=((1, 7), (5, 5)),
                                  dilations=((1, 1), (2, 2)),
                                  lstm_hidden=4, fc_hidden=4)
    den_cfg = DenoiserModelConfig(
        nf_mixed=8, nf_noise=4, outf_mixed=4, outf_noise=2,
        kernel_sizes=((1, 7), (5, 5)), dilations=((1, 1), (2, 2)),
        lstm_hidden=8, fc_hidden=16, inpaint_ch=(4, 6, 8))
    cfg = ExperimentConfig(detector=det_cfg, denoiser=den_cfg,
                           data=DataConfig())
    det = SilenceDetector(det_cfg)
    den = JointDenoiser(den_cfg)
    dummy = jnp.zeros((1, 256, 178, 2))
    dv = det.init(jr.PRNGKey(1), dummy)
    nv = den.init(jr.PRNGKey(2), dummy, dummy)
    mixed = np.asarray(jr.normal(jr.PRNGKey(3), (2, 28000))) * 0.2
    return cfg, dv, nv, mixed.astype(np.float32)


def test_export_roundtrip_f32(env, tmp_path):
    cfg, dv, nv, mixed = env
    path = str(tmp_path / "denoise_b2.jaxprog")
    out = export_denoise_program(cfg, dv, nv, path, batch=2,
                                 platforms=("cpu",))
    assert os.path.exists(out) and os.path.getsize(out) > 0
    meta = json.load(open(out + ".json"))
    assert meta["batch"] == 2 and meta["clip_samples"] == 28000

    serve = load_denoise_program(out)
    denoised, bits = serve(mixed)

    ref_pipe = FusedDenoisePipeline(cfg, dv, nv)
    ref_out, ref_bits = ref_pipe(mixed)
    np.testing.assert_allclose(np.asarray(denoised), np.asarray(ref_out),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(ref_bits))


def test_export_int8_requires_calibration(env, tmp_path):
    cfg, dv, nv, mixed = env
    with pytest.raises(ValueError, match="calibration"):
        export_denoise_program(cfg, dv, nv, str(tmp_path / "x.jaxprog"),
                               batch=2, profile="int8", platforms=("cpu",))


@pytest.mark.slow
def test_export_int8_with_calibration(env, tmp_path):
    cfg, dv, nv, mixed = env
    calib = str(tmp_path / "calib.json")
    pipe = FusedDenoisePipeline(cfg, dv, nv, profile="int8",
                                calibration_path=calib)
    ref_out, ref_bits = pipe(mixed)  # self-calibrates + writes the file

    path = str(tmp_path / "denoise_int8.jaxprog")
    export_denoise_program(cfg, dv, nv, path, batch=2, profile="int8",
                           calibration_path=calib, platforms=("cpu",))
    serve = load_denoise_program(path)
    denoised, bits = serve(mixed)
    np.testing.assert_allclose(np.asarray(denoised), np.asarray(ref_out),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(ref_bits))
