"""Stage-1 inference: full-utterance silent-interval detection.

Equivalent of the reference predict path (m1 predict.py:106-149): the
full-length mixed spectrogram goes through the conv+BiLSTM stack with
`num_frames = len(file bitstream)`, sigmoid confidences are thresholded
at 0.5 into predicted bits.

TPU note — variable-length programs: with `buckets=None` (default) every
distinct (length, num_frames) pair compiles its own program, which is the
simplest reference-exact mode. With `buckets`, lengths round up to bucket
boundaries and ONE program per bucket serves all shorter utterances while
remaining *numerically exact*: the host applies the centered-STFT reflect
padding before zero-extension, spectrogram frames beyond the valid count
are re-zeroed after every conv (so SAME padding behaves like the unpadded
program), the frame-grid resample indexes only the valid region, and the
BiLSTM masks padded steps (see sos_tpu.ops.lstm.lstm_scan).
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
FRAMES_GRANULARITY = 64  # video-frame grid rounds up to multiples of this


class DetectorPredictor:
    def __init__(self, cfg: ExperimentConfig, variables: Dict,
                 threshold: float = 0.5,
                 buckets: Optional[Sequence[int]] = None):
        self.cfg = cfg
        self.model = SilenceDetector(cfg.detector)
        self.variables = variables
        self.threshold = threshold
        self.buckets = tuple(sorted(buckets)) if buckets else None

    # -- exact (per-length) mode --------------------------------------------

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

    # -- bucketed-exact mode --------------------------------------------------

    @functools.lru_cache(maxsize=32)
    def _compiled_bucketed(self, bucket_t: int, frames_bucket: int):
        model = self.model
        scfg = self.cfg.stft

        @jax.jit
        def run(variables, padded_signal, valid_t, valid_frames):
            spec = stft(padded_signal, scfg.n_fft, scfg.hop_length,
                        scfg.win_length, center=False)
            logits = model.apply(variables, spec, num_frames=frames_bucket,
                                 train=False, valid_t=valid_t,
                                 valid_frames=valid_frames)
            return jax.nn.sigmoid(logits)

        return run

    def _bucket_t(self, valid_t: int) -> int:
        for b in self.buckets:
            if valid_t <= b:
                return b
        return valid_t

    def predict_waveform(self, waveform: np.ndarray,
                         num_frames: int) -> Tuple[np.ndarray, np.ndarray]:
        """(mixed waveform @14kHz, #video frames) -> (bits, confidences)."""
        hop = self.cfg.stft.hop_length
        n_fft = self.cfg.stft.n_fft
        if self.buckets is None:
            run = self._compiled(len(waveform), num_frames)
            conf = np.asarray(run(self.variables,
                                  jnp.asarray(waveform)[None])[0])
        else:
            valid_t = 1 + len(waveform) // hop
            bucket_t = self._bucket_t(valid_t)
            frames_bucket = -(-num_frames // FRAMES_GRANULARITY) \
                * FRAMES_GRANULARITY
            # centered-STFT padding applied on host, then zero-extension
            pad = n_fft // 2
            reflected = np.pad(waveform.astype(np.float32), pad,
                               mode="reflect")
            need = (bucket_t - 1) * hop + n_fft
            buf = np.zeros(need, dtype=np.float32)
            buf[: len(reflected)] = reflected[:need]
            run = self._compiled_bucketed(bucket_t, frames_bucket)
            conf = np.asarray(run(self.variables, jnp.asarray(buf)[None],
                                  jnp.int32(valid_t),
                                  jnp.int32(num_frames))[0])
            conf = conf[:num_frames]
        bits = (conf >= self.threshold).astype(np.int64)
        return bits, conf
