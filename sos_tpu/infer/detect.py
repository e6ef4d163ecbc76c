"""Stage-1 inference: full-utterance silent-interval detection.

Equivalent of the reference predict path (m1 predict.py:106-149): the
full-length mixed spectrogram goes through the conv+BiLSTM stack with
`num_frames = len(file bitstream)`, sigmoid confidences are thresholded
at 0.5 into predicted bits.

TPU notes: utterances are variable-length, so programs are compiled per
*bucket* — the spectrogram time axis is zero-padded up to the next bucket
boundary and the (fully-convolutional) trunk runs on the padded length,
while the label grid stays exact. Padding does perturb the BiLSTM's
backward pass near the tail, so `buckets=None` (reference-exact: one
compile per distinct length) is the default; pass explicit buckets for
throughput-oriented serving where the approximation is acceptable.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sos_tpu.config import ExperimentConfig
from sos_tpu.dsp.stft import stft
from sos_tpu.models import SilenceDetector

DEFAULT_BUCKETS = (256, 512, 1024, 2048, 4096, 8192)


class DetectorPredictor:
    def __init__(self, cfg: ExperimentConfig, variables: Dict,
                 threshold: float = 0.5,
                 buckets: Optional[Sequence[int]] = None):
        self.cfg = cfg
        self.model = SilenceDetector(cfg.detector)
        self.variables = variables
        self.threshold = threshold
        self.buckets = tuple(buckets) if buckets else None

    @functools.lru_cache(maxsize=64)
    def _compiled(self, padded_samples: int, num_frames: int):
        # padded_samples participates only as the compile-cache key — the
        # actual length is captured from the traced waveform shape.
        model = self.model

        @jax.jit
        def run(variables, waveform):
            spec = stft(waveform, self.cfg.stft.n_fft,
                        self.cfg.stft.hop_length, self.cfg.stft.win_length)
            logits = model.apply(variables, spec, num_frames=num_frames,
                                 train=False)
            return jax.nn.sigmoid(logits)

        return run

    def _bucket_len(self, num_samples: int) -> int:
        t = 1 + num_samples // self.cfg.stft.hop_length
        if self.buckets is None:
            return num_samples
        for b in self.buckets:
            if t <= b:
                return (b - 1) * self.cfg.stft.hop_length
        return num_samples

    def predict_waveform(self, waveform: np.ndarray,
                         num_frames: int) -> Tuple[np.ndarray, np.ndarray]:
        """(mixed waveform @14kHz, #video frames) -> (bits, confidences)."""
        padded_len = self._bucket_len(len(waveform))
        buf = np.zeros(padded_len, dtype=np.float32)
        buf[: len(waveform)] = waveform
        run = self._compiled(padded_len, num_frames)
        conf = np.asarray(run(self.variables, jnp.asarray(buf)[None])[0])
        bits = (conf >= self.threshold).astype(np.int64)
        return bits, conf
