"""STFT/iSTFT fidelity tests against torch.stft (librosa-convention oracle).

torch.stft / torch.istft with center=True, reflect padding and a periodic
hann window zero-padded (centered) to n_fft implement the same math as
librosa.stft/istft with the reference constants (transform.py:6-8), so
they serve as the parity oracle here (librosa itself is not installed).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from sos_tpu.config import HOP_LENGTH, N_FFT, WIN_LENGTH
from sos_tpu.dsp import stft, istft
from sos_tpu.dsp.stft import frame_signal, overlap_add, num_frames, padded_window


def torch_stft_ri(y: np.ndarray) -> np.ndarray:
    """Oracle STFT -> (F, T, 2) float32."""
    win = torch.hann_window(WIN_LENGTH, periodic=True, dtype=torch.float64)
    z = torch.stft(
        torch.from_numpy(y.astype(np.float64)),
        n_fft=N_FFT,
        hop_length=HOP_LENGTH,
        win_length=WIN_LENGTH,
        window=win,
        center=True,
        pad_mode="reflect",
        return_complex=True,
    ).numpy()
    return np.stack([z.real, z.imag], axis=-1).astype(np.float32)


def torch_istft(spec_ri: np.ndarray) -> np.ndarray:
    win = torch.hann_window(WIN_LENGTH, periodic=True, dtype=torch.float64)
    z = torch.from_numpy(
        (spec_ri[..., 0] + 1j * spec_ri[..., 1]).astype(np.complex128))
    y = torch.istft(
        z, n_fft=N_FFT, hop_length=HOP_LENGTH, win_length=WIN_LENGTH,
        window=win, center=True)
    return y.numpy().astype(np.float32)


@pytest.mark.parametrize("length", [28000, 14000, 5000])
def test_stft_matches_torch(rng, length):
    y = rng.standard_normal(length).astype(np.float32) * 0.3
    ours = np.asarray(stft(jnp.asarray(y)[None])[0])
    ref = torch_stft_ri(y)
    assert ours.shape == ref.shape == (256, num_frames(length), 2)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_stft_batched_consistency(rng):
    y = rng.standard_normal((3, 14000)).astype(np.float32)
    batched = np.asarray(stft(jnp.asarray(y)))
    for i in range(3):
        single = np.asarray(stft(jnp.asarray(y[i])[None])[0])
        np.testing.assert_allclose(batched[i], single, atol=1e-6)


def test_istft_matches_torch(rng):
    y = rng.standard_normal(28000).astype(np.float32) * 0.3
    spec = torch_stft_ri(y)
    ours = np.asarray(istft(jnp.asarray(spec)[None])[0])
    ref = torch_istft(spec)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_roundtrip_reconstruction(rng):
    """stft -> istft reproduces the signal (minus the librosa tail truncation)."""
    y = rng.standard_normal(28000).astype(np.float32) * 0.3
    rec = np.asarray(istft(stft(jnp.asarray(y)[None]))[0])
    t = num_frames(28000)
    assert rec.shape == ((t - 1) * HOP_LENGTH,)  # 27966: reference-exact length
    np.testing.assert_allclose(rec, y[: len(rec)], atol=1e-4)


def test_istft_nonhermitian_mask_output(rng):
    """Predicted masks produce specs with nonzero imag at DC/Nyquist; the
    synthesis must drop those exactly like np.fft.irfft does."""
    spec = rng.standard_normal((256, 50, 2)).astype(np.float32)
    ours = np.asarray(istft(jnp.asarray(spec)[None])[0])
    # numpy-based oracle replicating librosa istft math
    w = padded_window(N_FFT, WIN_LENGTH)
    frames = np.fft.irfft(spec[..., 0] + 1j * spec[..., 1], n=N_FFT, axis=0).T
    frames = frames * w[None, :]
    total = (50 - 1) * HOP_LENGTH + N_FFT
    acc = np.zeros(total)
    env = np.zeros(total)
    for t in range(50):
        acc[t * HOP_LENGTH:t * HOP_LENGTH + N_FFT] += frames[t]
        env[t * HOP_LENGTH:t * HOP_LENGTH + N_FFT] += w ** 2
    nz = env > np.finfo(np.float32).tiny
    acc[nz] /= env[nz]
    ref = acc[N_FFT // 2:-(N_FFT // 2)].astype(np.float32)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_frame_overlap_add_inverse(rng):
    y = rng.standard_normal((2, 2000)).astype(np.float32)
    frames = frame_signal(jnp.asarray(y), 510, 158)
    t = (2000 - 510) // 158 + 1
    assert frames.shape == (2, t, 510)
    # frame contents are exact slices
    fr = np.asarray(frames)
    for i in (0, 3, t - 1):
        np.testing.assert_array_equal(fr[0, i], y[0, i * 158:i * 158 + 510])
    # overlap_add of disjointly-supported frames reassembles
    ones = overlap_add(jnp.asarray(fr), 158)
    assert ones.shape[-1] == (t - 1) * 158 + 510


def test_packed_stft_matches_nhwc(rng):
    """stft_packed/istft_packed: identical math to stft/istft, packed
    (re, im) (B, T, F) layout (the serving path's layout fix)."""
    import jax.numpy as jnp
    from sos_tpu.dsp.stft import istft, istft_packed, stft, stft_packed

    y = jnp.asarray(rng.standard_normal((2, 20000)).astype(np.float32) * 0.3)
    ref = stft(y)  # (B, F, T, 2)
    re, im = stft_packed(y)
    np.testing.assert_array_equal(np.asarray(re),
                                  np.asarray(jnp.swapaxes(ref[..., 0], -1, -2)))
    np.testing.assert_array_equal(np.asarray(im),
                                  np.asarray(jnp.swapaxes(ref[..., 1], -1, -2)))
    a = np.asarray(istft(ref))
    b = np.asarray(istft_packed(re, im))
    np.testing.assert_allclose(a, b, atol=1e-6)
