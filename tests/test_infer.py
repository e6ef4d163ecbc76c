"""Inference-layer tests: predictors, fused pipeline, streaming overlap-add."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sos_tpu.config import (
    DataConfig,
    DenoiserModelConfig,
    DetectorModelConfig,
    ExperimentConfig,
)
from sos_tpu.infer.denoise import DenoiserPredictor
from sos_tpu.infer.detect import DetectorPredictor
from sos_tpu.infer.fused import FusedDenoisePipeline
from sos_tpu.infer.streaming import StreamingDenoiser
from sos_tpu.models import JointDenoiser, SilenceDetector


@pytest.fixture(scope="module")
def tiny():
    cfg = ExperimentConfig(
        detector=DetectorModelConfig(
            nf=4, outf=2, kernel_sizes=((1, 7), (5, 5)),
            dilations=((1, 1), (2, 2)), lstm_hidden=4, fc_hidden=4),
        denoiser=DenoiserModelConfig(
            nf_mixed=4, nf_noise=2, outf_mixed=2, outf_noise=2,
            kernel_sizes=((1, 7), (5, 5)), dilations=((1, 1), (2, 2)),
            lstm_hidden=4, fc_hidden=8, inpaint_ch=(4, 6, 8)),
        data=DataConfig(),
    )
    det = SilenceDetector(cfg.detector)
    den = JointDenoiser(cfg.denoiser)
    dummy = jnp.zeros((1, 256, 90, 2))
    det_vars = det.init(jax.random.PRNGKey(0), dummy)
    den_vars = den.init(jax.random.PRNGKey(1), dummy, dummy)
    return cfg, det_vars, den_vars


def test_detector_predictor(tiny, rng):
    cfg, det_vars, _ = tiny
    pred = DetectorPredictor(cfg, det_vars)
    wav = rng.standard_normal(28000).astype(np.float32) * 0.2
    bits, conf = pred.predict_waveform(wav, num_frames=60)
    assert bits.shape == conf.shape == (60,)
    assert set(np.unique(bits)) <= {0, 1}
    assert np.all((conf >= 0) & (conf <= 1))


def test_denoiser_predictor_lengths(tiny, rng):
    cfg, _, den_vars = tiny
    pred = DenoiserPredictor(cfg, den_vars)
    wav = rng.standard_normal(30000).astype(np.float32) * 0.2
    bits = "".join(rng.choice(list("01"), 64))
    outs = pred.denoise_waveform(wav, bits)
    expected = (1 + 30000 // 158 - 1) * 158
    assert outs["denoised"].shape == (expected,)
    assert np.isfinite(outs["denoised"]).all()


def test_fused_pipeline(tiny, rng):
    cfg, det_vars, den_vars = tiny
    pipe = FusedDenoisePipeline(cfg, det_vars, den_vars, clip_seconds=2.0)
    mixed = jnp.asarray(rng.standard_normal((2, 28000)).astype(np.float32) * 0.2)
    denoised, bits = pipe(mixed)
    assert denoised.shape == (2, (28000 // 158) * 158)
    assert bits.shape == (2, 60)
    assert np.isfinite(np.asarray(denoised)).all()


def test_streaming_matches_fused_on_short_input(tiny, rng):
    cfg, det_vars, den_vars = tiny
    stream = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                               overlap_seconds=0.5)
    wav = rng.standard_normal(20000).astype(np.float32) * 0.2
    out = stream.denoise(wav)
    assert len(out) <= 20000 and len(out) > 0
    assert np.isfinite(out).all()


def test_streaming_int16_transfer_matches_f32(tiny, rng):
    """transfer_dtype="int16" (half the wire bytes each way): for a
    16-bit-PCM-exact input (floats k/32768, what audio_io decodes) the
    wire round trip is lossless, detection decisions match up to rare
    near-threshold flips (XLA fuses the in-graph dequant scale into the
    STFT matmul, perturbing float rounding — the same drift class as
    the bf16/int8 profiles), and with SHARED bits the denoised output
    differs only by that rounding plus the output's int16 LSB."""
    cfg, det_vars, den_vars = tiny
    from sos_tpu.infer.fused import wire_decode, wire_encode

    # exact 16-bit PCM grid, several chunks' worth
    pcm = rng.integers(-6000, 6000, size=14000 * 5).astype(np.int16)
    wav = wire_decode(pcm)
    assert np.array_equal(wire_encode(wav), pcm)  # lossless round trip

    kw = dict(chunk_seconds=2.0, overlap_seconds=0.5, batch_chunks=4)
    f32 = StreamingDenoiser(cfg, det_vars, den_vars, **kw)
    s16 = StreamingDenoiser(cfg, det_vars, den_vars,
                            transfer_dtype="int16", **kw)

    # chunk layout identical to denoise(): isolate the wire path
    starts = list(range(0, len(wav), f32.stride))
    chunks = np.zeros((len(starts), f32.chunk), dtype=np.float32)
    for i, s in enumerate(starts):
        seg = wav[s:s + f32.chunk]
        chunks[i, : len(seg)] = seg

    bits_f = f32._batched(f32.pipeline.detect_bits, [chunks])
    bits_i = s16._batched(s16.pipeline.detect_bits, [chunks])
    assert np.mean(bits_f != bits_i) <= 0.02  # near-threshold flips only

    # shared bits: the remaining delta is float rounding + output LSB.
    # The wire clamps to int16 range exactly as a 16-bit WAV write
    # would, so samples the model pushes past full scale compare
    # against the clipped reference.
    out_f = f32._batched(f32.pipeline.denoise_with_bits, [chunks, bits_f])
    out_i = s16._batched(s16.pipeline.denoise_with_bits, [chunks, bits_f])
    assert out_i.dtype == np.float32  # decoded back off the wire
    clipped = np.clip(out_f, -1.0, 32767.0 / 32768.0)
    assert np.max(np.abs(out_i - clipped)) <= 5e-4

    # end to end: same shape, finite, and close in aggregate (exact
    # sample equality is not the contract when a bit may flip)
    out_full_f, out_full_i = f32.denoise(wav), s16.denoise(wav)
    assert out_full_i.shape == out_full_f.shape
    assert np.isfinite(out_full_i).all()
    assert np.mean(np.abs(
        out_full_i - np.clip(out_full_f, -1.0, 32767.0 / 32768.0))) <= 1e-3

    # one-pass (non-consistent) mode covers the fused __call__ entry
    s16_np = StreamingDenoiser(cfg, det_vars, den_vars,
                               consistent_boundaries=False,
                               transfer_dtype="int16", **kw)
    out_np = s16_np.denoise(wav)
    assert np.isfinite(out_np).all() and out_np.dtype == np.float32

    with pytest.raises(ValueError):
        StreamingDenoiser(cfg, det_vars, den_vars, transfer_dtype="int8")


def test_streaming_detector_context_halo(tiny, rng):
    """detector_context_seconds: detection windows prepend left context
    (cropped before reconciliation), the denoiser still runs on plain
    chunks, lengths/geometry are unchanged, and the incremental session
    replays the offline halo path exactly."""
    cfg, det_vars, den_vars = tiny
    sr = cfg.data.sample_rate
    kw = dict(chunk_seconds=2.0, overlap_seconds=0.5, batch_chunks=4)
    base = StreamingDenoiser(cfg, det_vars, den_vars, **kw)
    halo = StreamingDenoiser(cfg, det_vars, den_vars,
                             detector_context_seconds=4.0, **kw)
    assert halo.det_halo == 2 * sr and halo.det_halo_frames == 60

    wav = rng.standard_normal(sr * 7).astype(np.float32) * 0.2
    out = halo.denoise(wav)
    assert len(out) == len(wav) and np.isfinite(out).all()

    # window construction: the head window is zero-padded context, an
    # interior window is literally the preceding audio + the chunk
    starts = list(range(0, len(wav), halo.stride))
    wins = halo._det_windows(wav, starts)
    assert wins.shape == (len(starts), halo.det_halo + halo.chunk)
    assert not wins[0][: halo.det_halo].any()
    np.testing.assert_array_equal(wins[0][halo.det_halo:],
                                  wav[: halo.chunk])
    s = starts[2]
    np.testing.assert_array_equal(
        wins[2], wav[s - halo.det_halo: s + halo.chunk])

    # degenerate context == chunk is EXACTLY the base path
    same = StreamingDenoiser(cfg, det_vars, den_vars,
                             detector_context_seconds=2.0, **kw)
    assert same.det_halo == 0
    np.testing.assert_array_equal(same.denoise(wav), base.denoise(wav))

    # incremental session == offline halo path (same equality contract
    # as the no-halo session test; width-1 vs bucketed dispatch may
    # perturb reductions at the ulp level)
    from sos_tpu.infer.streaming import StreamingSession

    sess = StreamingSession(halo)
    outs, i = [], 0
    rng2 = np.random.default_rng(7)
    while i < len(wav):
        n = int(rng2.integers(900, 9000))
        outs.append(sess.push(wav[i: i + n]))
        i += n
    outs.append(sess.flush())
    got = np.concatenate(outs)
    ref = halo.denoise(wav)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)

    # validation: one-pass mode, context < chunk, non-frame-aligned
    with pytest.raises(ValueError):
        StreamingDenoiser(cfg, det_vars, den_vars,
                          detector_context_seconds=4.0,
                          consistent_boundaries=False, **kw)
    with pytest.raises(ValueError):
        StreamingDenoiser(cfg, det_vars, den_vars,
                          detector_context_seconds=1.0, **kw)
    with pytest.raises(ValueError):
        StreamingDenoiser(cfg, det_vars, den_vars,
                          detector_context_seconds=2.0301, **kw)


def test_streaming_long_form(tiny, rng):
    cfg, det_vars, den_vars = tiny
    stream = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                               overlap_seconds=0.5, batch_chunks=4)
    seconds = 10
    wav = rng.standard_normal(14000 * seconds).astype(np.float32) * 0.2
    out = stream.denoise(wav)
    assert len(out) == len(wav)
    assert np.isfinite(out).all()
    # interior continuity: no dead zones where crossfades meet
    assert np.abs(out[14000:14000 * (seconds - 1)]).mean() > 0


@pytest.mark.slow
def test_streaming_consistent_interior(tiny, rng):
    """A chunk-interior region should roughly match single-shot denoising."""
    cfg, det_vars, den_vars = tiny
    stream = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                               overlap_seconds=0.5)
    wav = rng.standard_normal(28000).astype(np.float32) * 0.2
    out_stream = stream.denoise(wav)
    pipe = FusedDenoisePipeline(cfg, det_vars, den_vars, clip_seconds=2.0)
    out_single = np.asarray(pipe(jnp.asarray(wav)[None])[0][0])
    n = min(len(out_stream), len(out_single))
    np.testing.assert_allclose(out_stream[:n], out_single[:n], atol=1e-4)


def test_fused_pipeline_sharded_over_mesh(tiny, rng):
    """Batch-sharded SPMD inference matches single-device results."""
    import jax
    from sos_tpu.parallel import make_mesh

    cfg, det_vars, den_vars = tiny
    n = min(4, len(jax.devices()))
    mixed = jnp.asarray(rng.standard_normal((n, 28000)).astype(np.float32) * 0.2)

    pipe = FusedDenoisePipeline(cfg, det_vars, den_vars, clip_seconds=2.0)
    ref_out, ref_bits = pipe(mixed)

    mesh = make_mesh(num_devices=n)
    sharded = FusedDenoisePipeline(cfg, det_vars, den_vars,
                                   clip_seconds=2.0).shard(mesh)
    with mesh:
        out, bits = sharded(mixed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(ref_bits))


@pytest.mark.slow
def test_split_entries_sharded_over_mesh(tiny, rng):
    """shard() must also cover detect_bits/denoise_with_bits — the pair
    StreamingDenoiser's boundary-consistent mode dispatches — not just
    the fused __call__ (regression: the old shard() wrapped only _run,
    so the split path silently ran unsharded)."""
    import jax
    from jax.sharding import PartitionSpec as P
    from sos_tpu.parallel import make_mesh

    cfg, det_vars, den_vars = tiny
    n = min(4, len(jax.devices()))
    mixed = jnp.asarray(
        rng.standard_normal((n, 28000)).astype(np.float32) * 0.2)

    pipe = FusedDenoisePipeline(cfg, det_vars, den_vars, clip_seconds=2.0)
    ref_bits = pipe.detect_bits(mixed)
    ref_out = pipe.denoise_with_bits(mixed, ref_bits)

    mesh = make_mesh(num_devices=n)
    sharded = FusedDenoisePipeline(cfg, det_vars, den_vars,
                                   clip_seconds=2.0).shard(mesh)
    with mesh:
        bits = sharded.detect_bits(mixed)
        out = sharded.denoise_with_bits(mixed, bits)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(ref_bits))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-5)
    # the committed inputs really are batch-sharded over the mesh
    committed = sharded._commit(mixed)
    assert committed.sharding.spec == P("data")


def test_detector_bucketed_exact(tiny, rng):
    """Bucketed inference (one program per bucket) is numerically exact:
    identical bits and confidences vs per-length compilation."""
    cfg, det_vars, _ = tiny
    exact = DetectorPredictor(cfg, det_vars, buckets=None)
    bucketed = DetectorPredictor(cfg, det_vars, buckets=(256, 512))
    for length, frames in ((28000, 60), (20000, 43), (33000, 71)):
        wav = rng.standard_normal(length).astype(np.float32) * 0.2
        bits_e, conf_e = exact.predict_waveform(wav, num_frames=frames)
        bits_b, conf_b = bucketed.predict_waveform(wav, num_frames=frames)
        np.testing.assert_allclose(conf_b, conf_e, atol=2e-5), length
        np.testing.assert_array_equal(bits_b, bits_e)
    # all three lengths share the same two compiled programs
    n_bucketed = sum(1 for k in bucketed._programs if k[0] == "bucketed")
    assert n_bucketed <= 2


@pytest.mark.slow
def test_denoiser_bucketed_exact(tiny, rng):
    """Bucketed full-utterance denoising == per-length compilation exactly
    (valid-aware reflection pads, masked BiLSTM, masked-envelope iSTFT)."""
    cfg, _, den_vars = tiny
    exact = DenoiserPredictor(cfg, den_vars, buckets=None)
    bucketed = DenoiserPredictor(cfg, den_vars, buckets=(256,))
    for length in (28000, 22000, 31000):
        wav = rng.standard_normal(length).astype(np.float32) * 0.2
        bits = "".join(rng.choice(list("01"), int(length / 14000 * 30)))
        ref = exact.denoise_waveform(wav, bits)
        got = bucketed.denoise_waveform(wav, bits)
        for key in ("denoised", "predicted_noise", "gated_noise"):
            assert got[key].shape == ref[key].shape, (key, length)
            np.testing.assert_allclose(got[key], ref[key], atol=3e-5,
                                       err_msg=f"{key}@{length}")
    n_bucketed = sum(1 for k in bucketed._programs if k[0] == "bucketed")
    assert n_bucketed == 1


def test_streaming_boundary_straddling_silence(tiny, rng):
    """A silent interval straddling a chunk boundary gets ONE consistent
    classification on both sides of the crossfade (VERDICT r1 Weak #9):
    after reconciliation, every frame in the leading half of a chunk's
    overlap carries the previous chunk's decision for that absolute time."""
    cfg, det_vars, den_vars = tiny
    stream = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                               overlap_seconds=0.5, batch_chunks=4)
    sr = cfg.data.sample_rate
    wav = rng.standard_normal(sr * 5).astype(np.float32) * 0.3
    # silence straddling the first chunk boundary (stride boundary at
    # stream.stride samples): zero 0.4 s on each side
    b = stream.stride
    wav[b - int(0.4 * sr): b + int(0.4 * sr)] = 0.0

    out = stream.denoise(wav)
    assert len(out) == len(wav) and np.isfinite(out).all()

    # inspect the reconciled bits directly
    starts = list(range(0, len(wav), stream.stride))
    chunks = np.zeros((len(starts), stream.chunk), np.float32)
    for i, s in enumerate(starts):
        seg = wav[s:s + stream.chunk]
        chunks[i, : len(seg)] = seg
    raw = np.asarray(stream._batched(stream.pipeline.detect_bits, [chunks]))
    rec = stream.reconcile_bits(raw, starts)
    fps = cfg.data.frame_rate
    centers = (np.arange(rec.shape[1]) + 0.5) / fps
    half_ov = 0.5 * stream.overlap / sr
    for i in range(1, len(starts)):
        delta = (starts[i] - starts[i - 1]) / sr
        for j in np.nonzero(centers < half_ov)[0]:
            prev = int(round((centers[j] + delta) * fps - 0.5))
            if 0 <= prev < rec.shape[1]:
                assert rec[i, j] == rec[i - 1, prev], (i, j)


def test_streaming_one_pass_mode_still_works(tiny, rng):
    cfg, det_vars, den_vars = tiny
    stream = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                               overlap_seconds=0.5, batch_chunks=4,
                               consistent_boundaries=False)
    wav = rng.standard_normal(14000 * 5).astype(np.float32) * 0.2
    out = stream.denoise(wav)
    assert len(out) == len(wav) and np.isfinite(out).all()


def test_overlap_add_matches_naive_loop(tiny, rng):
    """The vectorized phase-block overlap-add equals the per-chunk loop."""
    from sos_tpu.infer.streaming import StreamingDenoiser

    cfg, det_vars, den_vars = tiny
    s = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=0.5,
                          overlap_seconds=0.2, batch_chunks=2)
    n_chunks = 7
    w = s._weights()
    chunks = rng.standard_normal((n_chunks, s.valid)).astype(np.float32)
    total = (n_chunks - 1) * s.stride + s.valid

    naive = np.zeros(total, np.float32)
    for i in range(n_chunks):
        naive[i * s.stride : i * s.stride + s.valid] += chunks[i] * w
    np.testing.assert_allclose(s._overlap_add(chunks * w, total), naive,
                               rtol=1e-6, atol=1e-7)


def test_detector_predictor_int8_bucketed_exact(tiny, rng):
    """--profile int8 on the faithful eval driver: bucketed inference
    equals per-length compilation WITHIN the int8 profile (the profile's
    drift vs f32 is bounded separately in tests/test_quant.py)."""
    cfg, det_vars, _ = tiny
    exact = DetectorPredictor(cfg, det_vars, buckets=None, profile="int8")
    bucketed = DetectorPredictor(cfg, det_vars, buckets=(256, 512),
                                 profile="int8")
    for length, frames in ((28000, 60), (20000, 43)):
        wav = rng.standard_normal(length).astype(np.float32) * 0.2
        bits_e, conf_e = exact.predict_waveform(wav, num_frames=frames)
        bits_b, conf_b = bucketed.predict_waveform(wav, num_frames=frames)
        np.testing.assert_allclose(conf_b, conf_e, atol=2e-5)
        np.testing.assert_array_equal(bits_b, bits_e)


@pytest.mark.slow
def test_denoiser_predictor_int8_bucketed_exact(tiny, rng):
    """--profile int8 full-utterance denoising: bucketed == per-length
    within the profile."""
    cfg, _, den_vars = tiny
    exact = DenoiserPredictor(cfg, den_vars, buckets=None, profile="int8")
    bucketed = DenoiserPredictor(cfg, den_vars, buckets=(256,),
                                 profile="int8")
    for length in (28000, 22000):
        wav = rng.standard_normal(length).astype(np.float32) * 0.2
        bits = "".join(rng.choice(list("01"), int(length / 14000 * 30)))
        ref = exact.denoise_waveform(wav, bits)
        got = bucketed.denoise_waveform(wav, bits)
        for key in ("denoised", "predicted_noise", "gated_noise"):
            np.testing.assert_allclose(got[key], ref[key], atol=3e-5,
                                       err_msg=f"{key}@{length}")


@pytest.mark.slow
def test_denoiser_predictor_profiles_close_to_f32(tiny, rng):
    """bf16/int8 driver outputs stay within the certified drift budgets
    of the f32 driver on the same utterance."""
    cfg, _, den_vars = tiny
    wav = rng.standard_normal(28000).astype(np.float32) * 0.2
    bits = "".join(rng.choice(list("01"), 60))
    ref = DenoiserPredictor(cfg, den_vars).denoise_waveform(wav, bits)
    for profile in ("bf16", "int8"):
        got = DenoiserPredictor(cfg, den_vars,
                                profile=profile).denoise_waveform(wav, bits)
        err = np.abs(got["denoised"] - ref["denoised"]).max()
        assert err < 0.1, (profile, err)
        assert np.isfinite(got["denoised"]).all()


@pytest.mark.slow
def test_denoise_many_matches_per_utterance(tiny, rng):
    """Cross-request chunk batching returns exactly what per-utterance
    denoise() returns, for mixed lengths and both boundary modes."""
    cfg, det_vars, den_vars = tiny
    for consistent in (True, False):
        s = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                              overlap_seconds=0.5, batch_chunks=4,
                              consistent_boundaries=consistent)
        waves = [rng.standard_normal(n).astype(np.float32) * 0.2
                 for n in (20000, 45000, 70000)]
        singles = [s.denoise(w) for w in waves]
        many = s.denoise_many(waves)
        for got, want in zip(many, singles):
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, atol=1e-5,
                                       err_msg=str(consistent))


def test_batched_pads_to_pow2_bucket_not_full_width(tiny, rng):
    """A short request must not pay a full batch_chunks-wide dispatch:
    _batched pads partial batches to the next power-of-two bucket only
    (width 1 for the serve loop's common single-chunk request)."""
    cfg, det_vars, den_vars = tiny
    s = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                          overlap_seconds=0.5, batch_chunks=16)
    widths = []

    def probe(m):
        widths.append(m.shape[0])
        return m

    for n_chunks, want in ((1, 1), (3, 4), (5, 8), (16, 16), (17, [16, 1])):
        widths.clear()
        chunks = rng.standard_normal(
            (n_chunks, s.chunk)).astype(np.float32) * 0.1
        out = s._batched(probe, [chunks])
        assert out.shape == chunks.shape
        np.testing.assert_allclose(out, chunks, atol=0)
        assert widths == (want if isinstance(want, list) else [want])


def test_denoise_many_async_matches_sync(tiny, rng):
    """denoise_many_async's finalize returns exactly denoise_many's
    outputs (the pipelined serve path must not change results)."""
    cfg, det_vars, den_vars = tiny
    s = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                          overlap_seconds=0.5, batch_chunks=4)
    waves = [rng.standard_normal(n).astype(np.float32) * 0.2
             for n in (9000, 70000, 30000)]
    sync = s.denoise_many(waves)
    fin = s.denoise_many_async(waves)
    for a, b in zip(sync, fin()):
        np.testing.assert_array_equal(a, b)
    assert s.denoise_many_async([])() == []


class _LazyFetch:
    """Stand-in device result: records WHEN the host fetches it."""

    def __init__(self, arr, tag, log):
        self.arr, self.tag, self.log = np.asarray(arr), tag, log

    def __array__(self, dtype=None, copy=None):
        self.log.append(("fetch", self.tag))
        return self.arr if dtype is None else self.arr.astype(dtype)


def test_batched_async_pipelines_dispatch_before_fetch(tiny, rng):
    """_batched_async enqueues bucket N+1 BEFORE fetching bucket N
    (bounded by pipeline_depth), instead of the old strictly sequential
    dispatch -> fetch per bucket — the overlap that keeps the chip busy
    during host transfers. Results keep bucket order regardless."""
    cfg, det_vars, den_vars = tiny
    s = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                          overlap_seconds=0.5, batch_chunks=2,
                          pipeline_depth=2)
    log = []

    def probe(m):
        i = len([e for e in log if e[0] == "dispatch"])
        log.append(("dispatch", i))
        return _LazyFetch(np.asarray(m), i, log)

    chunks = rng.standard_normal((8, s.chunk)).astype(np.float32) * 0.1
    fin = s._batched_async(probe, [chunks])
    # 4 buckets of width 2; with depth 2: d0, d1, d2 -> f0, d3 -> f1;
    # finalize drains f2, f3. The pin: bucket 1's dispatch precedes
    # bucket 0's fetch, and fetches stay in order.
    assert log.index(("dispatch", 1)) < log.index(("fetch", 0))
    pre_finalize_fetches = len([e for e in log if e[0] == "fetch"])
    assert pre_finalize_fetches == 2  # window bound: depth in flight
    out = fin()
    fetches = [t for k, t in log if k == "fetch"]
    assert fetches == sorted(fetches)
    np.testing.assert_array_equal(out, chunks)


def test_batched_async_depth_one_is_sequential(tiny, rng):
    """pipeline_depth=1 degrades to at most one in-flight dispatch
    (memory-constrained hosts) with identical results."""
    cfg, det_vars, den_vars = tiny
    s = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                          overlap_seconds=0.5, batch_chunks=2,
                          pipeline_depth=1)
    log = []

    def probe(m):
        i = len([e for e in log if e[0] == "dispatch"])
        log.append(("dispatch", i))
        return _LazyFetch(np.asarray(m), i, log)

    chunks = rng.standard_normal((6, s.chunk)).astype(np.float32) * 0.1
    out = s._batched(probe, [chunks])
    np.testing.assert_array_equal(out, chunks)
    # never more than 1 un-fetched dispatch
    in_flight = 0
    for kind, _ in log:
        in_flight += 1 if kind == "dispatch" else -1
        assert in_flight <= 2  # the just-dispatched + at most depth(1)


@pytest.mark.slow
def test_warmup_precompiles_buckets_and_denoise_still_exact(tiny, rng):
    """warmup() compiles every pow2 bucket width and changes nothing
    about subsequent results; the int8 profile without calibration
    scales refuses to warm (calibration would retrace everything)."""
    cfg, det_vars, den_vars = tiny
    s = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                          overlap_seconds=0.5, batch_chunks=4)
    wav = rng.standard_normal(45000).astype(np.float32) * 0.2
    before = s.denoise(wav)
    assert s.warmup() == [1, 2, 4]
    np.testing.assert_allclose(s.denoise(wav), before, atol=0)

    s8 = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                           overlap_seconds=0.5, batch_chunks=4,
                           profile="int8",
                           calibration_path="/nonexistent/calib.json")
    assert s8.warmup() == []


def test_reconcile_bits_agrees_across_whole_overlap(tiny, rng):
    """Two-way reconciliation: after the sync, both chunks covering an
    overlap carry the SAME decision for every overlapped frame (leading
    half owned by the earlier chunk, trailing half by the later one)."""
    cfg, det_vars, den_vars = tiny
    # 0.9 s is near the overlap ceiling (half the iSTFT-valid span of a
    # 2 s chunk, ~0.9988 s); 1.0 s would let 3 chunks cover one sample
    s = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                          overlap_seconds=0.9)
    n_frames = int(2.0 * cfg.data.frame_rate)
    bits = rng.integers(0, 2, (3, n_frames)).astype(np.float32)
    starts = [0, s.stride, 2 * s.stride]
    rec = s.reconcile_bits(bits, starts)

    sr = cfg.data.sample_rate
    fps = cfg.data.frame_rate
    centers = (np.arange(n_frames) + 0.5) / fps
    for i in range(1, len(starts)):
        delta = (starts[i] - starts[i - 1]) / sr
        for k, c in enumerate(centers):  # frame k of chunk i
            if not (0 <= c < s.overlap / sr):
                continue  # not in the overlap with chunk i-1
            prev = int(round((c + delta) * fps - 0.5))
            if 0 <= prev < n_frames:
                assert rec[i, k] == rec[i - 1, prev], (i, k, prev)


def test_streaming_weights_strictly_positive_and_complementary(tiny):
    """No output sample may carry zero total crossfade weight (a zero at
    position 0 forced output[0] to 0); aligned ramp pairs sum to 1."""
    cfg, det_vars, den_vars = tiny
    s = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                          overlap_seconds=0.5)
    w = s._weights()
    assert (w > 0).all()
    ov = s.overlap
    np.testing.assert_allclose(w[:ov] + w[-ov:], 1.0, atol=1e-6)


def test_streaming_zero_overlap_and_bad_overlap(tiny, rng):
    cfg, det_vars, den_vars = tiny
    s = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                          overlap_seconds=0.0)
    wav = rng.standard_normal(60000).astype(np.float32) * 0.2
    out = s.denoise(wav)
    assert len(out) == len(wav) and np.isfinite(out).all()
    with pytest.raises(AssertionError, match="iSTFT-valid"):
        StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                          overlap_seconds=1.999)


@pytest.mark.slow
def test_warmup_includes_non_pow2_full_width(tiny):
    cfg, det_vars, den_vars = tiny
    s = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                          overlap_seconds=0.5, batch_chunks=3)
    assert s.warmup() == [1, 2, 3]


@pytest.mark.slow
def test_streaming_length_contract_geometry_sweep(tiny, rng):
    """Output-length contract across lengths straddling every boundary:
    a single-chunk utterance yields min(n, valid) samples (the iSTFT's
    valid span, < chunk by up to hop-1); a multi-chunk utterance yields
    exactly n. Everything finite; both modes agree on length."""
    cfg, det_vars, den_vars = tiny
    for consistent in (True, False):
        stream = StreamingDenoiser(cfg, det_vars, den_vars,
                                   chunk_seconds=2.0, overlap_seconds=0.5,
                                   batch_chunks=4,
                                   consistent_boundaries=consistent)
        chunk, valid = stream.chunk, stream.valid
        assert valid < chunk  # the boundary this sweep straddles
        lengths = [1, 157, 158, valid - 1, valid, valid + 1, chunk,
                   chunk + 1, chunk + stream.stride,
                   3 * stream.stride + 17]
        wavs = [rng.standard_normal(n).astype(np.float32) * 0.2
                for n in lengths]
        outs = stream.denoise_many(wavs)
        for n, out in zip(lengths, outs):
            expected = min(n, valid) if n <= chunk else n
            assert len(out) == expected, (consistent, n, len(out))
            assert np.isfinite(out).all(), (consistent, n)


@pytest.mark.slow
def test_streaming_int8_profile_end_to_end(tiny, rng, tmp_path):
    """StreamingDenoiser under the int8 serving profile: self-calibrates,
    persists the scale file, stays close to the f32 stream on identical
    input, and a second instance LOADING the persisted scales matches the
    calibrating instance exactly."""
    cfg, det_vars, den_vars = tiny
    calib = str(tmp_path / "calib.json")
    wav = rng.standard_normal(14000 * 5).astype(np.float32) * 0.2

    f32 = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                            overlap_seconds=0.5, batch_chunks=4)
    q = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                          overlap_seconds=0.5, batch_chunks=4,
                          profile="int8", calibration_path=calib)
    out_f32 = f32.denoise(wav)
    out_q = q.denoise(wav)
    import os

    assert os.path.exists(calib)  # self-calibration persisted
    assert len(out_q) == len(out_f32) and np.isfinite(out_q).all()
    # int8 drift stays small relative to the signal scale
    denom = np.abs(out_f32).mean() + 1e-9
    assert np.abs(out_q - out_f32).mean() / denom < 0.35

    q2 = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                           overlap_seconds=0.5, batch_chunks=4,
                           profile="int8", calibration_path=calib)
    np.testing.assert_allclose(q2.denoise(wav), out_q, atol=1e-6)


@pytest.mark.slow
def test_streaming_session_push_equals_offline(tiny, rng):
    """Incremental push/flush == offline denoise() on the same audio,
    across geometries and irregular push sizes; emitted sample count
    respects the documented latency bound."""
    from sos_tpu.infer.streaming import StreamingSession

    cfg, det_vars, den_vars = tiny
    for seconds, chunk_s, ov_s, consistent in (
            (7.3, 2.0, 0.5, True), (4.0, 2.0, 0.0, True),
            (5.1, 1.0, 0.25, True), (6.2, 2.0, 0.5, False)):
        stream = StreamingDenoiser(cfg, det_vars, den_vars,
                                   chunk_seconds=chunk_s,
                                   overlap_seconds=ov_s,
                                   consistent_boundaries=consistent)
        n = int(seconds * cfg.data.sample_rate)
        wav = (rng.standard_normal(n) * 0.2).astype(np.float32)
        want = stream.denoise(wav)

        sess = StreamingSession(stream)
        outs, pos = [], 0
        push_rng = np.random.default_rng(42)
        # naive mode has no cross-chunk bit dependency -> tighter bound
        bound = stream.chunk + (2 if consistent else 1) * stream.stride
        while pos < n:
            step = int(push_rng.integers(1000, 9000))
            outs.append(sess.push(wav[pos:pos + step]))
            pos = min(pos + step, n)
            emitted = sum(len(o) for o in outs)
            assert pos - emitted <= bound
        outs.append(sess.flush())
        got = np.concatenate(outs)
        # same chunking/reconciliation/crossfade arithmetic; the only
        # difference is device dispatch width (offline batches chunks in
        # power-of-2 buckets, the session dispatches width-1), which
        # perturbs XLA reductions at the ulp level (measured max 5e-7)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-6, rtol=0)


def test_streaming_session_single_chunk_and_empty(tiny, rng):
    """A stream that fits one chunk takes the offline single-chunk path
    (min(n, valid) samples); an empty stream flushes to empty."""
    from sos_tpu.infer.streaming import StreamingSession

    cfg, det_vars, den_vars = tiny
    stream = StreamingDenoiser(cfg, det_vars, den_vars, chunk_seconds=2.0,
                               overlap_seconds=0.5)
    n = 20000  # < chunk (28000)
    wav = (rng.standard_normal(n) * 0.2).astype(np.float32)
    want = stream.denoise(wav)
    sess = StreamingSession(stream)
    a = sess.push(wav[:9000])
    b = sess.push(wav[9000:])
    assert len(a) == len(b) == 0  # nothing final before flush
    got = np.concatenate([a, b, sess.flush()])
    # single-chunk flush delegates to the identical offline call
    np.testing.assert_array_equal(got, want)

    sess2 = StreamingSession(stream)
    assert len(sess2.flush()) == 0
