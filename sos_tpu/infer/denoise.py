"""Stage-2 inference: full-utterance denoising from predicted silent intervals.

Equivalent of m2 predict.py:255-526 but fused: where the reference
bounces host<->device (numpy STFT -> GPU net -> numpy icRM/iSTFT,
SURVEY.md §3.5), here waveform -> STFT -> JointDenoiser -> cRM inverse ->
iSTFT is ONE jitted program per length bucket; only WAV decode and the
bitstream -> sample-mask prep stay on host.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sos_tpu.config import ExperimentConfig
from sos_tpu.dsp.crm import apply_compressed_crm
from sos_tpu.dsp.mixing import bitstream_to_sample_mask_np
from sos_tpu.dsp.stft import istft, stft
from sos_tpu.models import JointDenoiser

DEFAULT_BUCKETS = (256, 512, 1024, 2048, 4096, 8192)


class DenoiserPredictor:
    def __init__(self, cfg: ExperimentConfig, variables: Dict,
                 buckets: Optional[Sequence[int]] = None):
        self.cfg = cfg
        self.model = JointDenoiser(cfg.denoiser)
        self.variables = variables
        self.buckets = tuple(buckets) if buckets else None

    @functools.lru_cache(maxsize=64)
    def _compiled(self, num_samples: int):
        model = self.model
        scfg = self.cfg.stft

        @jax.jit
        def run(variables, mixed, mask):
            mixed_stft = stft(mixed, scfg.n_fft, scfg.hop_length, scfg.win_length)
            gated_stft = stft(mixed * mask, scfg.n_fft, scfg.hop_length,
                              scfg.win_length)
            noise_pred, crm = model.apply(variables, mixed_stft, gated_stft,
                                          train=False)
            out_stft = apply_compressed_crm(mixed_stft, crm)
            return (istft(out_stft, scfg.n_fft, scfg.hop_length, scfg.win_length),
                    istft(noise_pred, scfg.n_fft, scfg.hop_length, scfg.win_length),
                    istft(gated_stft, scfg.n_fft, scfg.hop_length, scfg.win_length))

        return run

    def _bucket_samples(self, num_samples: int) -> int:
        if self.buckets is None:
            return num_samples
        hop = self.cfg.stft.hop_length
        t = 1 + num_samples // hop
        for b in self.buckets:
            if t <= b:
                return (b - 1) * hop
        return num_samples

    def denoise_waveform(
        self, mixed: np.ndarray, bits: str, framerate: float = 30.0,
    ) -> Dict[str, np.ndarray]:
        """Denoise one utterance given its (predicted) silence bitstream.

        Returns waveforms: denoised, predicted full noise, gated noise
        observation — all iSTFT-length ((T-1)*hop), like the reference's
        outputs (m2 predict.py:422-426).
        """
        sr = self.cfg.data.sample_rate
        ratio = float(sr) / framerate
        mask = bitstream_to_sample_mask_np(
            np.asarray([0 if c == "0" else 1 for c in bits], np.float32),
            ratio, len(mixed), self.cfg.data.despeckle_min_run)
        padded = self._bucket_samples(len(mixed))
        mbuf = np.zeros(padded, np.float32)
        mbuf[: len(mixed)] = mixed
        kbuf = np.zeros(padded, np.float32)
        kbuf[: len(mask)] = mask
        run = self._compiled(padded)
        den, noi, gat = run(self.variables, jnp.asarray(mbuf)[None],
                            jnp.asarray(kbuf)[None])
        out_len = (1 + len(mixed) // self.cfg.stft.hop_length - 1) \
            * self.cfg.stft.hop_length
        return {
            "denoised": np.asarray(den[0])[:out_len],
            "predicted_noise": np.asarray(noi[0])[:out_len],
            "gated_noise": np.asarray(gat[0])[:out_len],
        }
