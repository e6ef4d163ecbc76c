"""Long-form streaming denoise: chunked inference with overlap-add crossfade.

The reference processes whole utterances in one pass (unbounded memory in
T). For long-form audio (BASELINE.json config[4]: 60 s+), this module
slices the waveform into fixed-size chunks (so ONE compiled program
serves any duration), batches them through the fused pipeline, and
overlap-adds the results with triangular crossfades. Chunking also bounds
the BiLSTM's sequential depth, keeping the scan short and the MXU busy
across the chunk batch dimension.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from sos_tpu.config import ExperimentConfig
from sos_tpu.infer.fused import FusedDenoisePipeline


class StreamingDenoiser:
    def __init__(self, cfg: ExperimentConfig, detector_vars: Dict,
                 denoiser_vars: Dict, chunk_seconds: float = 2.0,
                 overlap_seconds: float = 0.5, batch_chunks: int = 16,
                 threshold: float = 0.5, compute_dtype: str = "float32"):
        assert overlap_seconds < chunk_seconds
        self.cfg = cfg
        self.pipeline = FusedDenoisePipeline(
            cfg, detector_vars, denoiser_vars, threshold=threshold,
            clip_seconds=chunk_seconds, compute_dtype=compute_dtype)
        sr = cfg.data.sample_rate
        hop = cfg.stft.hop_length
        self.chunk = self.pipeline.clip_samples
        # iSTFT yields floor(L/hop)*hop samples per chunk
        self.valid = (self.chunk // hop) * hop
        self.overlap = int(overlap_seconds * sr)
        self.stride = self.valid - self.overlap
        self.batch_chunks = batch_chunks

    def _weights(self) -> np.ndarray:
        w = np.ones(self.valid, dtype=np.float32)
        ramp = np.linspace(0.0, 1.0, self.overlap, endpoint=False,
                           dtype=np.float32)
        w[: self.overlap] = ramp
        w[-self.overlap:] = ramp[::-1] + (1.0 / self.overlap)
        return w

    def denoise(self, waveform: np.ndarray) -> np.ndarray:
        """Denoise arbitrary-length audio at the processing sample rate."""
        n = len(waveform)
        if n <= self.chunk:
            buf = np.zeros(self.chunk, dtype=np.float32)
            buf[:n] = waveform
            out, _ = self.pipeline(jnp.asarray(buf)[None])
            return np.asarray(out[0])[: min(n, self.valid)]

        starts = list(range(0, n, self.stride))
        chunks = np.zeros((len(starts), self.chunk), dtype=np.float32)
        for i, s in enumerate(starts):
            seg = waveform[s:s + self.chunk]
            chunks[i, : len(seg)] = seg

        outs = []
        for b in range(0, len(starts), self.batch_chunks):
            batch = chunks[b:b + self.batch_chunks]
            real = len(batch)
            if real < self.batch_chunks:
                # pad to the fixed batch: ONE compiled program serves any
                # duration (a ragged tail batch would compile a second one)
                batch = np.concatenate(
                    [batch, np.zeros((self.batch_chunks - real, self.chunk),
                                     dtype=np.float32)])
            out, _ = self.pipeline(jnp.asarray(batch))
            outs.append(np.asarray(out)[:real])
        denoised_chunks = np.concatenate(outs, axis=0)  # (C, valid)

        total = starts[-1] + self.valid
        acc = np.zeros(total, dtype=np.float32)
        wsum = np.zeros(total, dtype=np.float32)
        w = self._weights()
        for i, s in enumerate(starts):
            acc[s:s + self.valid] += denoised_chunks[i] * w
            wsum[s:s + self.valid] += w
        nz = wsum > 1e-8
        acc[nz] /= wsum[nz]
        return acc[:n]
