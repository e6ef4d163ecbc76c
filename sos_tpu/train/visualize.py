"""Training-time visualization: tensorboard spectrogram panels.

Equivalent of the reference's `MyAgent.visualize_batch`
(m2 agent.py:206-233): every `visualize_frequency` steps, render the
mixed / gated-noise / full-noise / predicted-noise / clean / denoised
sextet as stacked spectrograms and log the image to tensorboard.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from sos_tpu.dsp.crm import apply_compressed_crm
from sos_tpu.dsp.stft import istft


def visualize_denoiser_batch(writer, prepared: Dict, noise_pred, mask,
                             step: int, sr: int = 14000, n: int = 1) -> None:
    """Log spectrogram panels for the first `n` items of a batch.

    `prepared` is the device_mix_and_stft_denoiser output dict; noise_pred
    and mask are the model outputs (all (B, F, T, 2))."""
    if writer is None:
        return
    from sos_tpu.utils.visualization import draw_spectrum

    rec = apply_compressed_crm(prepared["mixed"][:n], mask[:n])
    panels = {
        "noisy_input": prepared["mixed"][:n],
        "noise_intervals": prepared["noise"][:n],
        "gt_full_noise": prepared["full_noise"][:n],
        "pred_full_noise": noise_pred[:n],
        "gt_clean": prepared["clean"][:n],
        "denoised": rec,
    }
    waves = {k: np.asarray(istft(v)) for k, v in panels.items()}
    for i in range(n):
        img = draw_spectrum([waves[k][i] for k in panels], sr=sr,
                            titles=list(panels))
        # (H, W, BGR) -> CHW RGB for tensorboardX
        writer.add_image(f"spectrum_{i}", img.transpose(2, 0, 1)[::-1],
                         global_step=step)
