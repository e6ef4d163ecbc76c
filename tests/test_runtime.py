"""Native C++ audio runtime parity vs the Python/scipy path."""

import numpy as np
import pytest

from sos_tpu.dsp import audio_io
from sos_tpu.dsp.mixing import mix_at_snr_np
from sos_tpu.runtime import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++/libsosaudio unavailable")


@pytest.fixture(scope="module")
def engine():
    from sos_tpu.runtime import NativeAudioEngine

    return NativeAudioEngine(num_threads=2)


def test_decode_matches_python(tmp_path, engine, rng):
    y = (rng.standard_normal(44100) * 0.3).astype(np.float32)
    path = str(tmp_path / "a.wav")
    audio_io.write_wav(path, y, 44100)
    ours, sr = engine.load(path)
    ref, ref_sr = audio_io.load(path)
    assert sr == ref_sr == 44100
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_resample_matches_scipy(tmp_path, engine, rng):
    y = (np.sin(2 * np.pi * 440 * np.arange(44100) / 44100) * 0.5).astype(np.float32)
    path = str(tmp_path / "tone.wav")
    audio_io.write_wav(path, y, 44100)
    ours, _ = engine.load(path, sr=14000)
    ref, _ = audio_io.load(path, sr=14000)
    assert abs(len(ours) - len(ref)) <= 1
    n = min(len(ours), len(ref))
    np.testing.assert_allclose(ours[:n], ref[:n], atol=2e-4)


def test_load_batch_threaded(tmp_path, engine, rng):
    paths = []
    refs = []
    for i in range(5):
        y = (rng.standard_normal(30000) * 0.2).astype(np.float32)
        p = str(tmp_path / f"b{i}.wav")
        audio_io.write_wav(p, y, 44100)
        paths.append(p)
        refs.append(audio_io.load(p, sr=14000)[0])
    out, lengths = engine.load_batch(paths, target_sr=14000, max_samples=12000)
    for i in range(5):
        n = min(int(lengths[i]), 12000, len(refs[i]))
        np.testing.assert_allclose(out[i, :n], refs[i][:n], atol=2e-4)


def test_native_mix_matches_python(engine, rng):
    clean = rng.standard_normal(8000).astype(np.float32)
    noise = rng.standard_normal(8000).astype(np.float32)
    m, c, n = engine.mix_at_snr(clean, noise, snr_db=3.0, norm=0.5)
    rm, rc, rn = mix_at_snr_np(clean.astype(np.float64),
                               noise.astype(np.float64), 3.0, norm=0.5)
    np.testing.assert_allclose(m, rm, atol=1e-5)
    np.testing.assert_allclose(c, rc, atol=1e-5)
    np.testing.assert_allclose(n, rn, atol=1e-5)
