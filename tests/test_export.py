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


def test_export_int16_wire_artifact(env, tmp_path):
    """wire_dtype="int16": the artifact takes int16 PCM chunks and
    returns int16 denoised samples; decoded output matches the f32
    artifact up to the wire contract (int16 LSB + full-scale clamp +
    near-threshold drift, see test_infer's wire test)."""
    from sos_tpu.infer.fused import wire_decode, wire_encode

    cfg, dv, nv, mixed = env
    # PCM-exact input so the dequantized waveform matches mixed itself
    mixed = wire_decode(wire_encode(mixed))

    path = str(tmp_path / "denoise_i16.jaxprog")
    export_denoise_program(cfg, dv, nv, path, batch=2, platforms=("cpu",),
                           wire_dtype="int16")
    assert json.load(open(path + ".json"))["wire_dtype"] == "int16"

    serve = load_denoise_program(path)
    denoised, bits = serve(wire_encode(mixed))
    assert np.asarray(denoised).dtype == np.int16

    ref_out, ref_bits = FusedDenoisePipeline(cfg, dv, nv)(mixed)
    flips = np.mean(np.asarray(bits) != np.asarray(ref_bits))
    assert flips <= 0.02
    if flips == 0:
        clipped = np.clip(np.asarray(ref_out), -1.0, 32767.0 / 32768.0)
        assert np.max(np.abs(wire_decode(denoised) - clipped)) <= 5e-4


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
