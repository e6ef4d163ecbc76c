"""librosa-convention STFT / iSTFT as MXU-friendly XLA programs.

Reference behavior being reproduced (transform.py:188-202 in both model
dirs): `librosa.stft(y, n_fft=510, hop_length=158, win_length=400)` with
center=True reflect padding and a periodic Hann window zero-padded
(centered) to n_fft, and the matching `librosa.istft`.

TPU-native design
-----------------
n_fft = 510 is not a power of two; generic FFTs of that size are slow on
TPU. Instead the analysis/synthesis transforms are *dense DFT matmuls*:

  STFT:  frames (B*T, 510) @ A (510, 512)  -> real/imag bins, on the MXU
  iSTFT: bins   (B*T, 512) @ S (512, 510)  -> windowed time frames

Framing and overlap-add are expressed with strided reshapes and shifted
adds (no gather/scatter), so XLA lays everything out statically. The whole
transform fuses into surrounding programs (mask application, the model's
first conv, ...).

Layout convention: spectrograms are `(..., F, T, 2)` with F=256 frequency
bins, T frames and a trailing real/imag channel pair — the NHWC analogue
of the reference's `(2, 256, T)` tensors (m1 dataset.py:288-289).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sos_tpu.config import HOP_LENGTH, N_FFT, WIN_LENGTH

_HIGHEST = jax.lax.Precision.HIGHEST


def hann_window(win_length: int, dtype=np.float64) -> np.ndarray:
    """Periodic (fftbins=True) Hann window, == scipy.get_window('hann', n)."""
    n = np.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)


def padded_window(n_fft: int = N_FFT, win_length: int = WIN_LENGTH) -> np.ndarray:
    """Hann(win_length) centered inside n_fft zeros (librosa util.pad_center)."""
    w = hann_window(win_length)
    lpad = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=np.float64)
    out[lpad:lpad + win_length] = w
    return out


@functools.lru_cache(maxsize=8)
def _analysis_matrix(n_fft: int, win_length: int) -> np.ndarray:
    """(n_fft, 2*bins) real matrix: windowed frame -> [real bins | imag bins]."""
    bins = n_fft // 2 + 1
    w = padded_window(n_fft, win_length)  # (n_fft,)
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    a_re = w[:, None] * np.cos(ang)
    a_im = -w[:, None] * np.sin(ang)
    return np.concatenate([a_re, a_im], axis=1).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _synthesis_matrix(n_fft: int, win_length: int) -> np.ndarray:
    """(2*bins, n_fft) real matrix: [real|imag] bins -> windowed time frame.

    Matches `window * np.fft.irfft(Z, n_fft)`: Hermitian reconstruction in
    which the imaginary parts of bin 0 and the Nyquist bin do not reach the
    real output.
    """
    bins = n_fft // 2 + 1
    w = padded_window(n_fft, win_length)
    k = np.arange(bins, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    c = np.full((bins, 1), 2.0)
    c[0, 0] = 1.0
    if n_fft % 2 == 0:
        c[-1, 0] = 1.0
    s_re = c * np.cos(ang) / n_fft
    s_im = -c * np.sin(ang) / n_fft
    s_im[0, :] = 0.0
    if n_fft % 2 == 0:
        s_im[-1, :] = 0.0
    m = np.concatenate([s_re, s_im], axis=0)  # (2*bins, n_fft)
    return (m * w[None, :]).astype(np.float32)


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Frame `(..., L)` into `(..., T, n_fft)` with stride `hop`, T = (L-n_fft)//hop + 1.

    Gather-free: built from `ceil(n_fft/hop)` strided reshapes of the
    signal, concatenated along the frame axis.
    """
    length = y.shape[-1]
    num_frames = (length - n_fft) // hop + 1
    n_chunks = -(-n_fft // hop)  # ceil
    # Pad so every strided view has num_frames full chunks.
    pad_to = (num_frames + n_chunks) * hop
    pad = pad_to - length
    if pad > 0:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, pad)])
    pieces = []
    for j in range(n_chunks):
        width = min(hop, n_fft - j * hop)
        # chunk j of frame t occupies samples [(t+j)*hop, (t+j)*hop + width)
        view = y[..., j * hop:(num_frames + j) * hop]
        view = view.reshape(y.shape[:-1] + (num_frames, hop))
        pieces.append(view[..., :width])
    return jnp.concatenate(pieces, axis=-1)


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add `(..., T, n_fft)` frames at stride `hop` -> `(..., (T-1)*hop + n_fft)`.

    Scatter-free: frames are split into hop-sized chunks; chunk j of every
    frame lands on the regular grid at offset j, so each chunk stream is a
    plain reshape followed by a shifted add.
    """
    *lead, num_frames, n_fft = frames.shape
    n_chunks = -(-n_fft // hop)
    pad_f = n_chunks * hop - n_fft
    if pad_f > 0:
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, pad_f)])
    chunks = frames.reshape(*lead, num_frames, n_chunks, hop)
    total = (num_frames + n_chunks) * hop
    out = jnp.zeros((*lead, total), dtype=frames.dtype)
    for j in range(n_chunks):
        stream = chunks[..., :, j, :].reshape(*lead, num_frames * hop)
        out = out.at[..., j * hop:(num_frames + j) * hop].add(stream)
    return out[..., : (num_frames - 1) * hop + n_fft]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length",
                                             "win_length", "center"))
def stft(
    y: jnp.ndarray,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    win_length: int = WIN_LENGTH,
    center: bool = True,
) -> jnp.ndarray:
    """Centered STFT of `(..., L)` -> `(..., F, T, 2)` (real/imag last).

    Matches `librosa.stft(y, n_fft, hop_length, win_length)` followed by
    the reference's `real_imag_expand` channel packing (transform.py:10-22),
    modulo the layout transpose documented in the module docstring.
    `center=False` skips the reflect padding (caller pre-padded — used by
    the exact length-bucketing path).
    """
    bins = n_fft // 2 + 1
    pad = n_fft // 2
    y = y.astype(jnp.float32)
    if center:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(y, n_fft, hop_length)  # (..., T, n_fft)
    mat = jnp.asarray(_analysis_matrix(n_fft, win_length))
    spec = jnp.matmul(frames, mat, precision=_HIGHEST)  # (..., T, 2*bins)
    re, im = spec[..., :bins], spec[..., bins:]
    out = jnp.stack([re, im], axis=-1)  # (..., T, F, 2)
    return jnp.swapaxes(out, -3, -2)  # (..., F, T, 2)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length"))
def istft(
    spec: jnp.ndarray,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    win_length: int = WIN_LENGTH,
    valid_t: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Inverse of :func:`stft`: `(..., F, T, 2)` -> `(..., (T-1)*hop)` samples.

    Matches `librosa.istft(..., hop_length, win_length)` with center=True:
    windowed inverse frames are overlap-added, normalized by the Hann
    window-square envelope, and n_fft//2 samples are trimmed per side.

    `valid_t` (traced scalar): exact length-bucketed mode — frames >=
    valid_t are dropped and the normalization envelope is built from the
    valid frames only, so samples below (valid_t-1)*hop match an unpadded
    istft exactly (the caller slices to that length).
    """
    bins = n_fft // 2 + 1
    spec = jnp.swapaxes(spec.astype(jnp.float32), -3, -2)  # (..., T, F, 2)
    num_frames = spec.shape[-3]
    frame_mask = None
    if valid_t is not None:
        frame_mask = (jnp.arange(num_frames) < valid_t).astype(jnp.float32)
        spec = spec * frame_mask[:, None, None]
    z = jnp.concatenate([spec[..., 0], spec[..., 1]], axis=-1)  # (..., T, 2*bins)
    mat = jnp.asarray(_synthesis_matrix(n_fft, win_length))
    frames = jnp.matmul(z, mat, precision=_HIGHEST)  # (..., T, n_fft)
    y = overlap_add(frames, hop_length)

    # Window-square envelope (constant for a given T; folded by XLA).
    wsq = jnp.asarray(padded_window(n_fft, win_length).astype(np.float32) ** 2)
    tiled = jnp.tile(wsq, (num_frames, 1))
    if frame_mask is not None:
        tiled = tiled * frame_mask[:, None]
    env = overlap_add(tiled, hop_length)
    tiny = jnp.asarray(np.finfo(np.float32).tiny)
    y = jnp.where(env > tiny, y / jnp.where(env > tiny, env, 1.0), y)

    pad = n_fft // 2
    return y[..., pad:-pad] if pad else y


def stft_packed(
    y: jnp.ndarray,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    win_length: int = WIN_LENGTH,
    center: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """STFT in the TPU-friendly packed layout: `(..., L)` -> (re, im),
    each `(..., T, F)`.

    Identical math to :func:`stft`; avoids materialising the `(F, T, 2)`
    layout whose 2-wide trailing dim pads to 128 lanes (64x memory
    inflation — measured 10 ms of an 11.8 ms batch-128 STFT on v5e). The
    serving path (bench.py, QuantizedDenoiser) stays packed end to end.
    """
    bins = n_fft // 2 + 1
    pad = n_fft // 2
    y = y.astype(jnp.float32)
    if center:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(y, n_fft, hop_length)
    mat = jnp.asarray(_analysis_matrix(n_fft, win_length))
    spec = jnp.matmul(frames, mat, precision=_HIGHEST)  # (..., T, 2*bins)
    return spec[..., :bins], spec[..., bins:]


def istft_packed(
    re: jnp.ndarray,
    im: jnp.ndarray,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    win_length: int = WIN_LENGTH,
) -> jnp.ndarray:
    """Inverse of :func:`stft_packed`: (re, im) `(..., T, F)` -> samples.

    Same math as :func:`istft` without the layout unpack/transpose."""
    num_frames = re.shape[-2]
    z = jnp.concatenate([re.astype(jnp.float32),
                         im.astype(jnp.float32)], axis=-1)
    mat = jnp.asarray(_synthesis_matrix(n_fft, win_length))
    frames = jnp.matmul(z, mat, precision=_HIGHEST)
    y = overlap_add(frames, hop_length)
    wsq = jnp.asarray(padded_window(n_fft, win_length).astype(np.float32) ** 2)
    env = overlap_add(jnp.tile(wsq, (num_frames, 1)), hop_length)
    tiny = jnp.asarray(np.finfo(np.float32).tiny)
    y = jnp.where(env > tiny, y / jnp.where(env > tiny, env, 1.0), y)
    pad = n_fft // 2
    return y[..., pad:-pad] if pad else y


def stft_1d(y: jnp.ndarray, **kw) -> jnp.ndarray:
    """STFT of a single 1-D signal -> (F, T, 2)."""
    return stft(y[None], **kw)[0]


def istft_1d(spec: jnp.ndarray, **kw) -> jnp.ndarray:
    """iSTFT of a single (F, T, 2) spectrogram -> (L,)."""
    return istft(spec[None], **kw)[0]


def num_frames(num_samples: int, n_fft: int = N_FFT, hop: int = HOP_LENGTH) -> int:
    """Frame count of a centered STFT (librosa: 1 + L // hop)."""
    return 1 + num_samples // hop


def power_law(data: jnp.ndarray, power: float = 0.3) -> jnp.ndarray:
    """Signed power-law compression (reference transform.py:178-185)."""
    return jnp.sign(data) * jnp.power(jnp.abs(data), power)
