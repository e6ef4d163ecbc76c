"""Data layer tests: index schema, windowing recipes, batchers, device stages."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from sos_tpu.config import DataConfig
from sos_tpu.data import (
    DatasetIndex,
    DenoiserBatcher,
    DetectorBatcher,
    NoiseBank,
    denoiser_windows,
    detector_windows,
    device_mix_and_stft_denoiser,
    device_mix_and_stft_detector,
    subsample_windows,
)
from sos_tpu.data.index import FileRecord
from sos_tpu.dsp import audio_io

REF_JSON = "/root/reference/data/sounds_of_silence_audioonly/sos_1.json"


def _make_fixture(tmp_path, n_files=2, seconds=5.0, sr=14000, fps=30.0, seed=0):
    rng = np.random.default_rng(seed)
    files = []
    for i in range(n_files):
        n = int(seconds * sr)
        y = (rng.standard_normal(n) * 0.2).astype(np.float32)
        path = str(tmp_path / f"clip_{i}.wav")
        audio_io.write_wav(path, y, sr)
        nf = int(seconds * fps)
        bits = "".join(rng.choice(list("01"), nf, p=[0.3, 0.7]))
        files.append(FileRecord(
            path=path, audio_path=path, framerate=fps, audio_sample_rate=sr,
            audio_samples=n, duration=seconds, num_frames=nf, bit_stream=bits))
    return DatasetIndex(dataset_path=str(tmp_path), files=files)


def _noise_bank(sr=14000, seed=3):
    rng = np.random.default_rng(seed)
    tracks = [rng.standard_normal(sr * 4).astype(np.float32) * 0.4
              for _ in range(3)]
    return NoiseBank.from_arrays(tracks, sr)


@pytest.mark.skipif(not os.path.exists(REF_JSON), reason="reference data absent")
def test_index_roundtrip_reference_schema(tmp_path):
    idx = DatasetIndex.load(REF_JSON)
    assert idx.num_files == 1
    f = idx[0]
    assert f.framerate == 30 and f.audio_sample_rate == 44100
    assert set(f.bit_stream) <= {"0", "1", "2"}
    out = str(tmp_path / "round.json")
    idx.save(out)
    again = DatasetIndex.load(out)
    assert again[0].bit_stream == f.bit_stream
    assert again[0].num_frames == f.num_frames


def test_detector_windows_overlap(tmp_path):
    idx = _make_fixture(tmp_path, seconds=6.0)
    wins = detector_windows(idx.files, clip_frames=60)
    # 180 frames -> starts at 0,30,60,90,120 (window must fit): 5 per file
    per_file = [w for w in wins if w.file_index == 0]
    assert [w.start_frame for w in per_file] == [0, 30, 60, 90, 120]
    assert all(len(w.bits) == 60 for w in wins)
    pred = detector_windows(idx.files, clip_frames=60, pred=True)
    assert len(pred) == 2 and len(pred[0].bits) == 180


def test_denoiser_windows_seconds(tmp_path):
    idx = _make_fixture(tmp_path, seconds=6.0)
    wins = denoiser_windows(idx.files, 2.0, 1.0)
    one = [w for w in wins if w.file_index == 0]
    assert [w.start_sec for w in one] == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert all(len(w.bits) == 60 for w in one)


def test_subsample_deterministic(tmp_path):
    idx = _make_fixture(tmp_path, seconds=6.0)
    wins = detector_windows(idx.files, clip_frames=60)
    a = subsample_windows(wins, num=4, seed=10)
    b = subsample_windows(wins, num=4, seed=10)
    assert [w.start_frame for w in a] == [w.start_frame for w in b]
    frac = subsample_windows(wins, fraction=0.5, seed=10)
    assert len(frac) == len(wins) // 2


def test_detector_batcher_and_device_stage(tmp_path):
    idx = _make_fixture(tmp_path)
    cfg = DataConfig()
    wins = detector_windows(idx.files, cfg.clip_frames)
    batcher = DetectorBatcher(wins, _noise_bank(), cfg, batch_size=2,
                              shuffle=True, seed=5)
    batch = next(iter(batcher))
    assert batch["clean"].shape == (2, 28000)
    assert batch["bits"].shape == (2, 60)
    out = device_mix_and_stft_detector(
        jnp.asarray(batch["clean"]), jnp.asarray(batch["noise"]),
        jnp.asarray(batch["snr"]), jnp.asarray(batch["bits"]))
    assert out["audio"].shape == (2, 256, 178, 2)
    assert out["label"].shape == (2, 60)
    # mixture peak-normalized to 0.5 => spectrogram magnitudes finite
    assert np.isfinite(np.asarray(out["audio"])).all()


def test_denoiser_device_stage_additivity(tmp_path):
    idx = _make_fixture(tmp_path)
    cfg = DataConfig()
    wins = denoiser_windows(idx.files, cfg.clip_seconds, cfg.overlap_seconds)
    batcher = DenoiserBatcher(wins, _noise_bank(), cfg, batch_size=2,
                              shuffle=False, seed=5)
    batch = next(iter(batcher))
    out = device_mix_and_stft_denoiser(
        jnp.asarray(batch["clean"]), jnp.asarray(batch["noise"]),
        jnp.asarray(batch["snr"]), jnp.asarray(batch["bits"]))
    for key in ("mixed", "clean", "noise", "full_noise", "mask"):
        assert out[key].shape == (2, 256, 178, 2), key
    # STFT linearity: mixed = clean + full_noise in the spectral domain
    np.testing.assert_allclose(
        np.asarray(out["mixed"]),
        np.asarray(out["clean"]) + np.asarray(out["full_noise"]),
        atol=1e-4)
    # gt cRM is a valid compressed mask
    crm = np.asarray(out["mask"])
    assert ((crm > 0) & (crm < 1)).all()


def test_batcher_epoch_reshuffle(tmp_path):
    idx = _make_fixture(tmp_path, seconds=8.0)
    cfg = DataConfig()
    wins = detector_windows(idx.files, cfg.clip_frames)
    batcher = DetectorBatcher(wins, _noise_bank(), cfg, batch_size=4,
                              shuffle=True, seed=1)
    first = next(iter(batcher))["bits"].copy()
    batcher.set_epoch(1)
    second = next(iter(batcher))["bits"].copy()
    assert not np.array_equal(first, second)
    batcher.set_epoch(0)
    again = next(iter(batcher))["bits"].copy()
    # noise/snr draws differ per epoch but window order is seed-deterministic
    np.testing.assert_array_equal(first, again)


def test_wav_decode_stereo_24bit(tmp_path, rng):
    """Hand-built 24-bit stereo RIFF decodes with channel-mean downmix."""
    import struct

    sr, n = 8000, 1000
    left = (rng.standard_normal(n) * 0.4).clip(-1, 1)
    right = (rng.standard_normal(n) * 0.4).clip(-1, 1)

    def pcm24(x):
        v = int(x * (1 << 23))
        v = max(-(1 << 23), min((1 << 23) - 1, v)) & 0xFFFFFF
        return struct.pack("<I", v)[:3]

    frames = b"".join(pcm24(l) + pcm24(r) for l, r in zip(left, right))
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(frames)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, sr, sr * 6, 6, 24)
           + b"data" + struct.pack("<I", len(frames)))
    path = str(tmp_path / "s24.wav")
    with open(path, "wb") as fp:
        fp.write(hdr + frames)

    y, got_sr = audio_io.load(path)
    assert got_sr == sr and len(y) == n
    np.testing.assert_allclose(y, (left + right) / 2, atol=2e-7)


def test_combine_datasets(tmp_path):
    from sos_tpu.data.index import combine_datasets

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    a = _make_fixture(tmp_path / "a", n_files=2)
    b = _make_fixture(tmp_path / "b", n_files=1, seed=9)
    pa, pb = str(tmp_path / "a.json"), str(tmp_path / "b.json")
    a.save(pa)
    b.save(pb)
    merged = combine_datasets([pa, pb])
    assert merged.num_files == 3
    assert {f.path for f in merged} == (
        {f.path for f in a} | {f.path for f in b})


def test_media_tools_gating():
    import shutil

    from sos_tpu.data import media

    if shutil.which("ffprobe") is None:
        with pytest.raises(RuntimeError, match="not found"):
            media.get_duration("/nonexistent.mp4")
        assert media.media_tools_available() in (False,)
    else:
        assert media.media_tools_available()


def test_snr_suffix_formats():
    from sos_tpu.infer.evaluate import snr_suffix

    assert snr_suffix(None) == ""
    assert snr_suffix(0) == "_snr0"
    assert snr_suffix(-7) == "_snr-7"
    assert snr_suffix(2.5) == "_snr2_5"
    assert snr_suffix(10.0) == "_snr10"


def test_noise_bank_empty_roots_clear_error(tmp_path):
    """Empty/missing noise roots fail at construction with the roots in
    the message (not later with 'high <= 0' inside the batch loop)."""
    from sos_tpu.data.sampling import NoiseBank

    empty = tmp_path / "no_noise_here"
    empty.mkdir()
    with pytest.raises(ValueError, match="no noise WAVs"):
        NoiseBank.from_roots([str(empty)], 14000)
    with pytest.raises(ValueError, match="noise root"):
        NoiseBank.from_roots([str(tmp_path / "missing")], 14000)


def test_dataset_index_schema_error(tmp_path):
    from sos_tpu.data.index import DatasetIndex

    bad = tmp_path / "bad.json"
    bad.write_text('{"oops": 1}')
    with pytest.raises(ValueError, match="dataset JSON"):
        DatasetIndex.load(str(bad))


def test_wav_cache_lru_eviction(tmp_path, monkeypatch):
    """The decode cache is least-recently-USED: a hot file survives a
    stream of one-shot files that exceeds capacity (FIFO would evict it
    and re-decode every epoch at real-corpus scale)."""
    from sos_tpu.data.pipeline import _WavCache

    sr = 14000
    paths = []
    for i in range(6):
        p = str(tmp_path / f"c{i}.wav")
        audio_io.write_wav(p, np.full(100, 0.01 * (i + 1), np.float32), sr)
        paths.append(p)

    cache = _WavCache(sr, capacity=3, use_native=False)
    decodes = []
    real_load = audio_io.load
    monkeypatch.setattr(audio_io, "load",
                        lambda p, sr=None: decodes.append(p) or real_load(p, sr=sr))

    hot = paths[0]
    cache.get(hot)
    for p in paths[1:]:
        cache.get(hot)   # refresh recency
        cache.get(p)     # one-shot fill
    assert decodes.count(hot) == 1, "LRU must keep the hot file resident"
    # capacity is respected
    assert len(cache._store) <= 3


def test_wav_cache_prefetch_paths_native(tmp_path):
    """Bulk prefetch decodes misses via the threaded native engine and
    the cached waveforms match per-file decodes exactly — INCLUDING the
    full length (clips are multi-second and at a non-processing sample
    rate, so any max_samples miscalculation would truncate them)."""
    from sos_tpu.data.pipeline import _WavCache
    from sos_tpu.runtime import native_available

    if not native_available():
        pytest.skip("native engine unavailable")
    sr = 14000
    rng = np.random.default_rng(1)
    paths = []
    for i in range(4):
        p = str(tmp_path / f"p{i}.wav")
        # 2-3 s at 44.1 kHz: resampled length >> sr so a swapped
        # (samples, rate) unpack or undersized buffer truncates visibly
        n = 44100 * 2 + 22050 * i
        audio_io.write_wav(p, (rng.standard_normal(n) * 0.2
                               ).astype(np.float32), 44100)
        paths.append(p)
    cache = _WavCache(sr, capacity=8)
    cache.prefetch_paths(paths)
    assert set(cache._store) == set(paths)
    ref = _WavCache(sr, capacity=8)
    for i, p in enumerate(paths):
        got, want = cache.get(p), ref.get(p)
        assert len(got) == len(want) and len(got) >= sr * 2 - 2, (
            len(got), len(want))
        np.testing.assert_allclose(got, want, atol=0)


def test_batcher_iter_from_matches_full_iteration(tmp_path):
    """iter_from(k) yields bit-for-bit the batches k.. of a full epoch
    (exact mid-epoch resume without assembling the skipped prefix)."""
    idx = _make_fixture(tmp_path, seconds=8.0)
    cfg = DataConfig()
    wins = detector_windows(idx.files, cfg.clip_frames)
    mk = lambda: DetectorBatcher(wins, _noise_bank(), cfg, batch_size=2,
                                 shuffle=True, seed=5)
    full = list(mk())
    assert len(full) >= 3
    resumed = list(mk().iter_from(2))
    assert len(resumed) == len(full) - 2
    for a, b in zip(full[2:], resumed):
        for k in ("clean", "noise", "snr", "bits"):
            np.testing.assert_array_equal(a[k], b[k])


def test_wav_cache_capacity_zero_disables_caching(tmp_path, monkeypatch):
    """capacity <= 0 means 'no caching': every get() decodes, nothing is
    stored, and nothing crashes (the eviction loop used to popitem an
    empty store)."""
    from sos_tpu.data.pipeline import _WavCache

    sr = 14000
    p = str(tmp_path / "c.wav")
    audio_io.write_wav(p, np.full(100, 0.01, np.float32), sr)
    cache = _WavCache(sr, capacity=0, use_native=False)
    decodes = []
    real_load = audio_io.load
    monkeypatch.setattr(audio_io, "load",
                        lambda q, sr=None: decodes.append(q) or real_load(q, sr=sr))
    a = cache.get(p)
    b = cache.get(p)
    np.testing.assert_array_equal(a, b)
    assert decodes.count(p) == 2 and len(cache._store) == 0


def test_batcher_rejects_mismatched_framerate(tmp_path):
    """The device mix/STFT stage builds its frame->sample mask with the
    CONFIGURED frame rate; a training window whose file framerate differs
    would silently misalign labels against the sliced audio — the
    batcher must refuse it loudly."""
    from sos_tpu.data.pipeline import DetectorBatcher

    idx = _make_fixture(tmp_path, seconds=4.0, fps=25.0)
    wins = detector_windows(idx.files, clip_frames=60)
    cfg = DataConfig()  # frame_rate 30
    with pytest.raises(ValueError, match="framerate"):
        DetectorBatcher(wins, _noise_bank(), cfg, batch_size=2, shuffle=False)
