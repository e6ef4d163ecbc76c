"""Int8 post-training quantization: folding exactness + drift bounds.

The int8 profile (sos_tpu/models/quant.py) is the bench headline; these
tests pin its quality contract on CPU:
  * BN folding is mathematically exact;
  * the packed (re,im) serving entry is bit-identical to the NHWC int8
    path (layout change only);
  * the quantized mask drifts from the f32 reference by far less than
    the certified bf16 budget (tests/test_reference_parity.py: <0.05);
  * inputs beyond the calibrated range degrade gracefully (clip), never
    produce non-finite outputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.random as jr

from sos_tpu.config import DenoiserModelConfig
from sos_tpu.models import JointDenoiser
from sos_tpu.models.quant import (
    QuantizedDenoiser,
    fold_conv_bn,
    quantize_weight,
)


def _tiny_cfg():
    return DenoiserModelConfig(
        nf_mixed=8, nf_noise=4, outf_mixed=4, outf_noise=2,
        kernel_sizes=((1, 7), (5, 5)), dilations=((1, 1), (2, 2)),
        lstm_hidden=8, fc_hidden=16, inpaint_ch=(4, 6, 8))


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny_cfg()
    model = JointDenoiser(cfg)
    rng = jr.PRNGKey(0)
    x = jr.normal(rng, (2, 256, 64, 2)) * 0.3
    y = jr.normal(jr.PRNGKey(5), (2, 256, 64, 2)) * 0.3
    v = model.init(jr.PRNGKey(1), x, x)
    return cfg, model, v, x, y


def test_fold_conv_bn_exact(rng):
    k = rng.standard_normal((3, 3, 4, 8)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    bias = rng.standard_normal(8).astype(np.float32)
    mean = rng.standard_normal(8).astype(np.float32) * 0.3
    var = rng.uniform(0.4, 2.0, 8).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32))

    def conv(w):
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(w), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ref = (conv(k) - mean) / np.sqrt(var + 1e-5) * scale + bias
    w_f, b_f = fold_conv_bn(k, scale, bias, mean, var)
    folded = conv(w_f) + b_f
    np.testing.assert_allclose(np.asarray(folded), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_quantize_weight_bounds(rng):
    k = rng.standard_normal((5, 5, 8, 16)).astype(np.float32)
    w_q, s = quantize_weight(k)
    assert w_q.dtype == np.int8 and s.shape == (16,)
    recon = w_q.astype(np.float32) * s[None, None, None, :]
    # per-channel symmetric int8: error <= scale/2 everywhere
    assert np.all(np.abs(recon - k) <= s[None, None, None, :] * 0.5 + 1e-7)


@pytest.mark.slow
def test_packed_entry_matches_nhwc(setup):
    cfg, model, v, x, y = setup
    q = QuantizedDenoiser(cfg, v, inpaint_dtype="int8")
    q.calibrate([(x, y)])
    _, crm = jax.jit(q.__call__)(x, y)
    mr, mi = jnp.swapaxes(x[..., 0], -1, -2), jnp.swapaxes(x[..., 1], -1, -2)
    gr, gi = jnp.swapaxes(y[..., 0], -1, -2), jnp.swapaxes(y[..., 1], -1, -2)
    cr, ci = jax.jit(q.crm_packed)(mr, mi, gr, gi)
    np.testing.assert_array_equal(
        np.asarray(cr), np.asarray(jnp.swapaxes(crm[..., 0], -1, -2)))
    np.testing.assert_array_equal(
        np.asarray(ci), np.asarray(jnp.swapaxes(crm[..., 1], -1, -2)))


def test_int8_mask_drift_bounded(setup):
    cfg, model, v, x, y = setup
    ref_noise, ref_crm = model.apply(v, x, y, train=False)
    assert float(jnp.std(ref_crm)) > 1e-4  # non-degenerate check target
    q = QuantizedDenoiser(cfg, v, inpaint_dtype="int8")
    q.calibrate([(x, y)])
    qn, qc = jax.jit(q.__call__)(x, y)
    drift = float(jnp.abs(qc - ref_crm).max())
    assert drift < 5e-3, drift  # certified budget; measured ~1e-4
    assert float(jnp.abs(qn - ref_noise).max()) < 5e-2


def test_bf16_head_proj_drift_bounded(setup):
    """The default bf16 LSTM input projection (the int8 profile's only
    non-f32 head op) vs the exact-f32 head: crm drift must stay well
    under the int8 profile's own 5e-3 budget. On-chip measurement:
    9.4e-6 crm / 0 detector decision flips, +2.9% two-stage throughput
    (experiments/bf16_lstm_proj.py)."""
    cfg, model, v, x, y = setup
    qb = QuantizedDenoiser(cfg, v, inpaint_dtype="int8")  # default bf16
    assert qb.bf16_head_proj
    qb.calibrate([(x, y)])
    qf = QuantizedDenoiser(cfg, v, inpaint_dtype="int8",
                           bf16_head_proj=False)
    qf.calibrate([(x, y)])
    _, cb = jax.jit(qb.__call__)(x, y)
    _, cf = jax.jit(qf.__call__)(x, y)
    drift = float(jnp.abs(cb - cf).max())
    assert drift < 1e-3, drift


def test_out_of_range_inputs_clip_gracefully(setup):
    cfg, model, v, x, y = setup
    q = QuantizedDenoiser(cfg, v, inpaint_dtype="int8")
    q.calibrate([(x, y)])
    qn, qc = jax.jit(q.__call__)(x * 10.0, y * 10.0)  # 10x calibration range
    assert np.isfinite(np.asarray(qc)).all()
    assert np.isfinite(np.asarray(qn)).all()
    assert float(jnp.min(qc)) >= 0.0 and float(jnp.max(qc)) <= 1.0


def test_calibrate_required(setup):
    cfg, model, v, x, y = setup
    q = QuantizedDenoiser(cfg, v, inpaint_dtype="int8")
    with pytest.raises(AssertionError):
        q(x, y)


@pytest.mark.slow
def test_bf16_inpaint_mode(setup):
    """inpaint_dtype='bfloat16' keeps InpaintNet float while the trunks
    quantize — the intermediate profile."""
    cfg, model, v, x, y = setup
    q = QuantizedDenoiser(cfg, v, inpaint_dtype="bfloat16")
    q.calibrate([(x, y)])
    _, ref_crm = model.apply(v, x, y, train=False)
    _, qc = jax.jit(q.__call__)(x, y)
    assert float(jnp.abs(qc - ref_crm).max()) < 5e-3


def test_quantized_detector_drift_and_packed(setup):
    """Detector int8 trunk: bounded prob drift vs f32, packed entry
    bit-identical to NHWC."""
    from sos_tpu.config import DetectorModelConfig
    from sos_tpu.models import SilenceDetector
    from sos_tpu.models.quant import QuantizedDetector

    cfg = DetectorModelConfig(nf=4, outf=2, kernel_sizes=((1, 7), (5, 5)),
                              dilations=((1, 1), (2, 2)),
                              lstm_hidden=4, fc_hidden=4)
    model = SilenceDetector(cfg)
    x = jr.normal(jr.PRNGKey(3), (2, 256, 64, 2)) * 0.3
    v = model.init(jr.PRNGKey(4), x)
    ref = np.asarray(model.apply(v, x, num_frames=40))
    q = QuantizedDetector(cfg, v)
    q.calibrate([x])
    got = np.asarray(jax.jit(lambda s: q(s, 40))(x))
    p_ref = 1 / (1 + np.exp(-ref))
    p_q = 1 / (1 + np.exp(-got))
    assert np.abs(p_ref - p_q).max() < 5e-3  # measured ~1e-4
    re = jnp.swapaxes(x[..., 0], -1, -2)
    im = jnp.swapaxes(x[..., 1], -1, -2)
    gp = np.asarray(jax.jit(lambda r, i: q.logits_packed(r, i, 40))(re, im))
    np.testing.assert_array_equal(gp, got)


@pytest.mark.slow
def test_fused_pipeline_int8_profile(setup):
    """End-to-end int8 fused pipeline (quant detector + quant denoiser)
    produces finite audio + bits close to the f32 pipeline's."""
    from sos_tpu.config import (DataConfig, DetectorModelConfig,
                                ExperimentConfig)
    from sos_tpu.infer.fused import FusedDenoisePipeline
    from sos_tpu.models import SilenceDetector

    cfg_d, model, v, x, y = setup
    det_cfg = DetectorModelConfig(nf=4, outf=2, kernel_sizes=((1, 7), (5, 5)),
                                  dilations=((1, 1), (2, 2)),
                                  lstm_hidden=4, fc_hidden=4)
    cfg = ExperimentConfig(detector=det_cfg, denoiser=cfg_d,
                           data=DataConfig())
    det = SilenceDetector(det_cfg)
    dummy = jnp.zeros((1, 256, 90, 2))
    dv = det.init(jr.PRNGKey(9), dummy)
    mixed = jr.normal(jr.PRNGKey(10), (2, 28000)) * 0.2

    f32 = FusedDenoisePipeline(cfg, dv, v, profile="f32")
    out_f, bits_f = f32(mixed)
    q = FusedDenoisePipeline(cfg, dv, v, profile="int8")
    out_q, bits_q = q(mixed)
    assert np.isfinite(np.asarray(out_q)).all()
    assert np.asarray(out_q).shape == np.asarray(out_f).shape
    # bits may differ only where f32 confidence sits at the threshold
    assert np.mean(np.asarray(bits_f) != np.asarray(bits_q)) <= 0.05


@pytest.mark.slow
def test_odd_time_length_drift(setup):
    """Odd T (no bucket padding) keeps the quantized drift bound."""
    cfg = DenoiserModelConfig(
        nf_mixed=8, nf_noise=4, outf_mixed=4, outf_noise=2,
        kernel_sizes=((1, 7), (5, 5)), dilations=((1, 1), (4, 1)),
        lstm_hidden=8, fc_hidden=16, inpaint_ch=(4, 6, 8))
    model = JointDenoiser(cfg)
    x = jr.normal(jr.PRNGKey(14), (2, 256, 63, 2)) * 0.3  # odd T
    y = jr.normal(jr.PRNGKey(15), (2, 256, 63, 2)) * 0.3
    v = model.init(jr.PRNGKey(16), x, x)
    ref_noise, ref_crm = model.apply(v, x, y, train=False)
    q = QuantizedDenoiser(cfg, v, inpaint_dtype="int8")
    q.calibrate([(x, y)])
    qn, qc = jax.jit(q.__call__)(x, y)
    assert float(jnp.abs(qc - ref_crm).max()) < 5e-3



def test_calibration_roundtrip(setup):
    """Persisted calibration scales reproduce the exact same quantized
    program: calibrate -> save -> load into a FRESH instance -> outputs
    bit-identical."""
    cfg, model, v, x, y = setup
    q1 = QuantizedDenoiser(cfg, v, inpaint_dtype="int8")
    q1.calibrate([(x, y)])
    state = q1.calibration_state()
    import json
    state = json.loads(json.dumps(state))  # through-JSON fidelity

    q2 = QuantizedDenoiser(cfg, v, inpaint_dtype="int8")
    q2.load_calibration(state)
    n1, c1 = jax.jit(q1.__call__)(x, y)
    n2, c2 = jax.jit(q2.__call__)(x, y)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


def test_fused_pipeline_calibration_file(setup, tmp_path):
    """FusedDenoisePipeline writes the calibration JSON on first use and
    a second instance loads it without self-calibrating."""
    import json as _json

    from sos_tpu.config import (DataConfig, DetectorModelConfig,
                                ExperimentConfig)
    from sos_tpu.infer.fused import FusedDenoisePipeline
    from sos_tpu.models import SilenceDetector

    cfg_d, model, v, x, y = setup
    det_cfg = DetectorModelConfig(nf=4, outf=2, kernel_sizes=((1, 7), (5, 5)),
                                  dilations=((1, 1), (2, 2)),
                                  lstm_hidden=4, fc_hidden=4)
    cfg = ExperimentConfig(detector=det_cfg, denoiser=cfg_d,
                           data=DataConfig())
    det = SilenceDetector(det_cfg)
    dv = det.init(jr.PRNGKey(9), jnp.zeros((1, 256, 90, 2)))
    mixed = jr.normal(jr.PRNGKey(10), (2, 28000)) * 0.2

    path = str(tmp_path / "calib.json")
    p1 = FusedDenoisePipeline(cfg, dv, v, profile="int8",
                              calibration_path=path)
    out1, bits1 = p1(mixed)
    blob = _json.load(open(path))
    assert "denoiser" in blob and "detector" in blob

    p2 = FusedDenoisePipeline(cfg, dv, v, profile="int8",
                              calibration_path=path)
    # different first batch -- must NOT affect the loaded scales
    out2, bits2 = p2(mixed * 3.0)
    assert p2._quant.calibration_state() == p1._quant.calibration_state()
    out2b, _ = p2(mixed)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2b))


def test_calibration_file_bad_schema_recovers(setup, tmp_path):
    """A malformed calibration file logs and self-calibrates (serving),
    but raises a clear error under strict loading (export)."""
    from sos_tpu.config import (DataConfig, DetectorModelConfig,
                                ExperimentConfig)
    from sos_tpu.infer.fused import FusedDenoisePipeline
    from sos_tpu.models import SilenceDetector

    cfg_d, model, v, x, y = setup
    det_cfg = DetectorModelConfig(nf=4, outf=2, kernel_sizes=((1, 7), (5, 5)),
                                  dilations=((1, 1), (2, 2)),
                                  lstm_hidden=4, fc_hidden=4)
    cfg = ExperimentConfig(detector=det_cfg, denoiser=cfg_d,
                           data=DataConfig())
    det = SilenceDetector(det_cfg)
    dv = det.init(jr.PRNGKey(9), jnp.zeros((1, 256, 90, 2)))
    mixed = jr.normal(jr.PRNGKey(10), (2, 28000)) * 0.2

    bad = tmp_path / "bad_calib.json"
    bad.write_text('{"oops": 1}')
    p = FusedDenoisePipeline(cfg, dv, v, profile="int8",
                             calibration_path=str(bad))
    out, bits = p(mixed)  # recovers: self-calibrates + rewrites the file
    assert np.isfinite(np.asarray(out)).all()
    import json as _json
    rewritten = _json.load(open(bad))
    assert "denoiser" in rewritten and "detector" in rewritten

    truncated = tmp_path / "trunc.json"
    truncated.write_text('{"denoiser": {"enc_x"')
    p2 = FusedDenoisePipeline(cfg, dv, v, profile="int8",
                              calibration_path=str(truncated))
    with pytest.raises(ValueError, match="trunc.json"):
        p2.load_calibration_file(str(truncated), strict=True)


def test_calibration_race_converges_on_winner(setup, tmp_path):
    """Two serving processes racing to self-calibrate converge on ONE
    scale set: publish is first-writer-wins (atomic hardlink of a
    complete file) and the loser adopts the winner's scales."""
    from sos_tpu.config import (DataConfig, DetectorModelConfig,
                                ExperimentConfig)
    from sos_tpu.infer.fused import FusedDenoisePipeline
    from sos_tpu.models import SilenceDetector

    cfg_d, model, v, x, y = setup
    det_cfg = DetectorModelConfig(nf=4, outf=2, kernel_sizes=((1, 7), (5, 5)),
                                  dilations=((1, 1), (2, 2)),
                                  lstm_hidden=4, fc_hidden=4)
    cfg = ExperimentConfig(detector=det_cfg, denoiser=cfg_d,
                           data=DataConfig())
    det = SilenceDetector(det_cfg)
    dv = det.init(jr.PRNGKey(9), jnp.zeros((1, 256, 90, 2)))
    mixed = jr.normal(jr.PRNGKey(10), (2, 28000)) * 0.2

    path = str(tmp_path / "calib.json")
    p1 = FusedDenoisePipeline(cfg, dv, v, profile="int8",
                              calibration_path=path)
    p1(mixed)  # winner: publishes the file

    p2 = FusedDenoisePipeline(cfg, dv, v, profile="int8",
                              calibration_path=path)
    # Simulate the race: p2 checked the path BEFORE p1 published (sees
    # nothing), self-calibrates on DIFFERENT data, then collides at
    # publish time.
    orig = p2.load_calibration_file
    raced = []

    def load_after_race(p, strict=False):
        if not raced:
            raced.append(1)
            return False  # file "absent" at p2's check time
        return orig(p, strict=strict)

    p2.load_calibration_file = load_after_race
    p2(mixed * 5.0)
    assert raced, "race branch must have been exercised"
    assert p2._quant.calibration_state() == p1._quant.calibration_state()
    assert (p2._quant_det.calibration_state()
            == p1._quant_det.calibration_state())


def test_calibration_rejected_file_restores_scales(setup, tmp_path):
    """Rejecting a calibration file must not leave a partial load behind:
    a file with valid denoiser scales but missing detector scales is
    rejected WITHOUT replacing the pipeline's good self-calibrated
    denoiser scales (the adopt-on-publish-collision path depends on
    this: otherwise a process would serve scales that differ from the
    file it then publishes)."""
    import json as _json

    from sos_tpu.config import (DataConfig, DetectorModelConfig,
                                ExperimentConfig)
    from sos_tpu.infer.fused import FusedDenoisePipeline
    from sos_tpu.models import SilenceDetector

    cfg_d, model, v, x, y = setup
    det_cfg = DetectorModelConfig(nf=4, outf=2, kernel_sizes=((1, 7), (5, 5)),
                                  dilations=((1, 1), (2, 2)),
                                  lstm_hidden=4, fc_hidden=4)
    cfg = ExperimentConfig(detector=det_cfg, denoiser=cfg_d,
                           data=DataConfig())
    det = SilenceDetector(det_cfg)
    dv = det.init(jr.PRNGKey(9), jnp.zeros((1, 256, 90, 2)))
    mixed = jr.normal(jr.PRNGKey(10), (2, 28000)) * 0.2

    good_path = str(tmp_path / "good.json")
    p = FusedDenoisePipeline(cfg, dv, v, profile="int8",
                             calibration_path=good_path)
    p(mixed)  # self-calibrates and publishes
    good_den = p._quant.calibration_state()
    good_det = p._quant_det.calibration_state()

    # denoiser-only file (e.g. published by a denoiser-only process):
    # valid "denoiser" scales that DIFFER from p's, no "detector" key
    other = FusedDenoisePipeline(cfg, dv, v, profile="int8")
    other._maybe_calibrate(np.asarray(mixed) * 7.0)
    partial = tmp_path / "partial.json"
    partial.write_text(_json.dumps(
        {"denoiser": other._quant.calibration_state()}))
    assert other._quant.calibration_state() != good_den

    assert p.load_calibration_file(str(partial)) is False
    assert p._quant.calibration_state() == good_den
    assert p._quant_det.calibration_state() == good_det

    # a never-calibrated pipeline rejecting the same file must stay
    # uncalibrated on BOTH models (so self-calibration covers both)
    p2 = FusedDenoisePipeline(cfg, dv, v, profile="int8")
    assert p2.load_calibration_file(str(partial)) is False
    assert not p2._quant._calibrated
    assert not p2._quant_det._calibrated


@pytest.mark.slow
def test_quantized_valid_t_bucketed_exact(setup):
    """The int8 pipeline's length-bucketed path (valid_t) matches the
    fixed-shape int8 program on the valid region: the padded tail +
    dynamic-boundary reflection reproduce the natural-length program's
    boundary handling exactly (int8 trunks bitwise; float head to fp
    tolerance)."""
    cfg, model, v, x, y = setup
    q = QuantizedDenoiser(cfg, v, inpaint_dtype="int8")
    q.calibrate([(x, y)])
    ref_noise, ref_crm = jax.jit(q.__call__)(x, y)

    t = x.shape[2]
    pad_t = 96  # bucket wider than the natural 64
    fill = jr.normal(jr.PRNGKey(7), (2, 256, pad_t - t, 2))  # garbage tail
    xp = jnp.concatenate([x, fill], axis=2)
    yp = jnp.concatenate([y, fill * 0.5], axis=2)
    qn, qc = jax.jit(lambda a, b, vt: q(a, b, valid_t=vt))(
        xp, yp, jnp.int32(t))
    np.testing.assert_allclose(np.asarray(qn[:, :, :t]),
                               np.asarray(ref_noise), atol=3e-5)
    np.testing.assert_allclose(np.asarray(qc[:, :, :t]),
                               np.asarray(ref_crm), atol=3e-5)


@pytest.mark.slow
def test_quantized_detector_valid_t_bucketed_exact(setup):
    """QuantizedDetector's valid_t path == its fixed-shape path on the
    valid region (bits identical, confidences to fp tolerance)."""
    from sos_tpu.config import DetectorModelConfig
    from sos_tpu.models import SilenceDetector
    from sos_tpu.models.quant import QuantizedDetector

    det_cfg = DetectorModelConfig(nf=8, outf=2,
                                  kernel_sizes=((1, 7), (5, 5)),
                                  dilations=((1, 1), (2, 2)),
                                  lstm_hidden=8, fc_hidden=8)
    det = SilenceDetector(det_cfg)
    spec = jr.normal(jr.PRNGKey(3), (2, 256, 64, 2)) * 0.3
    dv = det.init(jr.PRNGKey(4), spec)
    qd = QuantizedDetector(det_cfg, dv)
    qd.calibrate([spec])
    ref = jax.jit(lambda s: qd(s, 60))(spec)

    fill = jr.normal(jr.PRNGKey(8), (2, 256, 32, 2))
    spec_p = jnp.concatenate([spec, fill], axis=2)
    got = jax.jit(lambda s, vt: qd(s, 60, valid_t=vt, valid_frames=60))(
        spec_p, jnp.int32(64))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_calibration_file_non_dict_scales_recovers(setup, tmp_path):
    """A calibration file whose scale mapping is a non-dict (e.g.
    "inpaint": [...]) must be rejected with the warn-and-self-calibrate
    fallback, not crash with AttributeError ('.items' on a list)."""
    import json as _json

    from sos_tpu.config import (DataConfig, DetectorModelConfig,
                                ExperimentConfig)
    from sos_tpu.infer.fused import FusedDenoisePipeline
    from sos_tpu.models import SilenceDetector
    from sos_tpu.models.quant import (QuantizedDenoiser,
                                      load_persisted_calibration)

    cfg_d, model, v, x, y = setup
    det_cfg = DetectorModelConfig(nf=4, outf=2, kernel_sizes=((1, 7), (5, 5)),
                                  dilations=((1, 1), (2, 2)),
                                  lstm_hidden=4, fc_hidden=4)
    cfg = ExperimentConfig(detector=det_cfg, denoiser=cfg_d,
                           data=DataConfig())
    det = SilenceDetector(det_cfg)
    dv = det.init(jr.PRNGKey(9), jnp.zeros((1, 256, 90, 2)))

    bad = tmp_path / "bad.json"
    bad.write_text(_json.dumps(
        {"denoiser": {"enc_x": [1.0], "enc_n": [1.0], "inpaint": [1.0]},
         "detector": {"trunk": [1.0]}}))

    p = FusedDenoisePipeline(cfg, dv, v, profile="int8")
    assert p.load_calibration_file(str(bad)) is False
    assert not p._quant._calibrated

    q = QuantizedDenoiser(cfg_d, v, inpaint_dtype="int8")
    assert load_persisted_calibration(q, str(bad), "denoiser") is False
    assert not q._calibrated
