"""Waveform / spectrogram rendering (reference visualization.py:15-41,157-190).

`draw_waveform` / `draw_spectrum` render stacked subplot panels to a BGR
uint8 ndarray (cv2.imwrite-ready) — used by the denoiser eval to save
side-by-side comparisons (m2 predict.py:485-516) and by the tensorboard
batch visualizer (m2 agent.py:206-233).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _fig_to_bgr(fig) -> np.ndarray:
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return buf[..., ::-1].copy()  # RGB -> BGR


def draw_waveform(signals: Sequence[np.ndarray], sr: int = 14000,
                  titles: Optional[List[str]] = None) -> np.ndarray:
    n = len(signals)
    fig, axes = plt.subplots(n, 1, figsize=(10, 2 * n), squeeze=False)
    for i, sig in enumerate(signals):
        ax = axes[i][0]
        t = np.arange(len(sig)) / sr
        ax.plot(t, sig, linewidth=0.4)
        ax.set_xlim(0, max(t[-1], 1e-3) if len(t) else 1)
        ax.set_ylim(-1, 1)
        if titles and i < len(titles):
            ax.set_title(titles[i], fontsize=9)
    fig.tight_layout()
    return _fig_to_bgr(fig)


def draw_spectrum(signals: Sequence[np.ndarray], sr: int = 14000,
                  titles: Optional[List[str]] = None,
                  n_fft: int = 510, hop_length: int = 158,
                  win_length: int = 400) -> np.ndarray:
    from sos_tpu.dsp.stft import stft_1d
    import jax.numpy as jnp

    n = len(signals)
    fig, axes = plt.subplots(n, 1, figsize=(10, 2 * n), squeeze=False)
    for i, sig in enumerate(signals):
        ax = axes[i][0]
        spec = np.asarray(stft_1d(jnp.asarray(np.asarray(sig, np.float32)),
                                  n_fft=n_fft, hop_length=hop_length,
                                  win_length=win_length))
        mag = np.sqrt(spec[..., 0] ** 2 + spec[..., 1] ** 2)
        db = 20 * np.log10(np.maximum(mag, 1e-8))
        db -= db.max()
        ax.imshow(db, origin="lower", aspect="auto", cmap="magma",
                  vmin=-80, vmax=0)
        if titles and i < len(titles):
            ax.set_title(titles[i], fontsize=9)
    fig.tight_layout()
    return _fig_to_bgr(fig)


def save_image(path: str, bgr: np.ndarray) -> None:
    try:
        import cv2

        cv2.imwrite(path, bgr)
    except ImportError:  # matplotlib fallback
        plt.imsave(path, bgr[..., ::-1])
