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

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sos_tpu.config import ExperimentConfig
from sos_tpu.dsp.stft import stft
from sos_tpu.models import SilenceDetector

DEFAULT_BUCKETS = (256, 512, 1024, 2048, 4096, 8192)
FRAMES_GRANULARITY = 64  # video-frame grid rounds up to multiples of this



def _instance_memo(obj, key, build):
    """Per-instance compiled-program cache.

    functools.lru_cache on methods is class-level: it counts programs
    across ALL instances and keeps every instance alive via the cached
    `self` keys (a leak for long-lived servers). This keys programs on
    the instance itself.
    """
    cache = obj.__dict__.setdefault("_programs", {})
    if key not in cache:
        cache[key] = build()
    return cache[key]


class DetectorPredictor:
    def __init__(self, cfg: ExperimentConfig, variables: Dict,
                 threshold: float = 0.5,
                 buckets: Optional[Sequence[int]] = None,
                 profile: Optional[str] = None,
                 calibration_path: Optional[str] = None):
        """`profile`: None/"f32", "bf16" (bf16 conv trunk; prob drift
        < 0.05, <=2% decision flips — tests/test_reference_parity.py) or
        "int8" (quantized trunk). Every profile runs the same exact
        length-bucketed machinery (int8 via the quantized valid_t path,
        test_quantized_detector_valid_t_bucketed_exact). `calibration_path`
        loads persisted int8 scales (FusedDenoisePipeline's schema); else
        the predictor self-calibrates on its first utterance."""
        self.cfg = cfg
        compute_dtype = "bfloat16" if profile == "bf16" else "float32"
        self.model = SilenceDetector(cfg.detector,
                                     compute_dtype=compute_dtype)
        self.variables = variables
        self.threshold = threshold
        self.buckets = tuple(sorted(buckets)) if buckets else None
        self.profile = profile or "f32"
        self._quant = None
        self._calibration_path = calibration_path
        if profile == "int8":
            from sos_tpu.models.quant import QuantizedDetector

            self._quant = QuantizedDetector(cfg.detector, variables)

    def _apply_conf(self, variables, spec, num_frames, valid_t=None,
                    valid_frames=None):
        if self._quant is not None:
            logits = self._quant(spec, num_frames, valid_t=valid_t,
                                 valid_frames=valid_frames)
        else:
            logits = self.model.apply(variables, spec,
                                      num_frames=num_frames, train=False,
                                      valid_t=valid_t,
                                      valid_frames=valid_frames)
        return jax.nn.sigmoid(logits)

    def _maybe_calibrate(self, waveform: np.ndarray) -> None:
        if self._quant is None or self._quant._calibrated:
            return
        if self._calibration_path:
            from sos_tpu.models.quant import load_persisted_calibration

            if load_persisted_calibration(self._quant,
                                          self._calibration_path,
                                          "detector"):
                return
        scfg = self.cfg.stft
        spec = stft(jnp.asarray(waveform, jnp.float32)[None], scfg.n_fft,
                    scfg.hop_length, scfg.win_length)
        self._quant.calibrate([spec])

    # -- exact (per-length) mode --------------------------------------------

    def _compiled(self, *key):
        return _instance_memo(self, ("exact",) + key,
                              lambda: self._build_compiled(*key))

    def _build_compiled(self, padded_samples: int, num_frames: int):
        # padded_samples participates only as the compile-cache key — the
        # actual length is captured from the traced waveform shape.

        @jax.jit
        def run(variables, waveform):
            spec = stft(waveform, self.cfg.stft.n_fft,
                        self.cfg.stft.hop_length, self.cfg.stft.win_length)
            return self._apply_conf(variables, spec, num_frames)

        return run

    # -- bucketed-exact mode --------------------------------------------------

    def _compiled_bucketed(self, *key):
        return _instance_memo(self, ("bucketed",) + key,
                              lambda: self._build_compiled_bucketed(*key))

    def _build_compiled_bucketed(self, bucket_t: int, frames_bucket: int):
        scfg = self.cfg.stft

        @jax.jit
        def run(variables, padded_signal, valid_t, valid_frames):
            spec = stft(padded_signal, scfg.n_fft, scfg.hop_length,
                        scfg.win_length, center=False)
            return self._apply_conf(variables, spec, frames_bucket,
                                    valid_t=valid_t,
                                    valid_frames=valid_frames)

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
        self._maybe_calibrate(waveform)
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

    # -- batched bucketed mode ------------------------------------------------

    def _compiled_bucketed_vmapped(self, *key):
        return _instance_memo(self, ("vmapped",) + key,
                              lambda: self._build_compiled_bucketed_vmapped(*key))

    def _build_compiled_bucketed_vmapped(self, bucket_t: int, frames_bucket: int,
                                   batch: int):
        """One program per (bucket, frame-bucket, batch tile): vmap of the
        single-item bucketed program with per-item valid lengths."""
        scfg = self.cfg.stft

        def one(variables, padded_signal, valid_t, valid_frames):
            spec = stft(padded_signal[None], scfg.n_fft, scfg.hop_length,
                        scfg.win_length, center=False)
            return self._apply_conf(variables, spec, frames_bucket,
                                    valid_t=valid_t,
                                    valid_frames=valid_frames)[0]

        return jax.jit(jax.vmap(one, in_axes=(None, 0, 0, 0)))

    def predict_batch(
        self,
        waveforms: Sequence[np.ndarray],
        num_frames: Sequence[int],
        batch_size: int = 16,
    ) -> list:
        """Batched full-utterance detection (m1 predict.py runs batch-1;
        here same-bucket utterances share one device dispatch).

        Items are grouped by (length bucket, frame bucket), padded into
        (batch_size, need) tiles (short tiles repeat the last row), and
        dispatched through a vmapped bucketed-exact program — per-item
        outputs equal `predict_waveform`'s. Requires `buckets`; without
        them this falls back to the per-item exact path.

        Returns a list of (bits, confidences) in input order.
        """
        if self.buckets is None:
            return [self.predict_waveform(w, n)
                    for w, n in zip(waveforms, num_frames)]
        if waveforms:
            self._maybe_calibrate(np.asarray(waveforms[0], np.float32))
        hop = self.cfg.stft.hop_length
        n_fft = self.cfg.stft.n_fft
        pad = n_fft // 2

        groups: Dict[Tuple[int, int], list] = {}
        for i, (w, nf) in enumerate(zip(waveforms, num_frames)):
            valid_t = 1 + len(w) // hop
            bucket_t = self._bucket_t(valid_t)
            frames_bucket = -(-nf // FRAMES_GRANULARITY) * FRAMES_GRANULARITY
            groups.setdefault((bucket_t, frames_bucket), []).append(i)

        results: list = [None] * len(waveforms)
        pending = []  # dispatch every tile async, fetch at the end
        for (bucket_t, frames_bucket), idxs in groups.items():
            need = (bucket_t - 1) * hop + n_fft
            run = self._compiled_bucketed_vmapped(bucket_t, frames_bucket,
                                                  batch_size)
            for s in range(0, len(idxs), batch_size):
                tile = idxs[s: s + batch_size]
                buf = np.zeros((batch_size, need), np.float32)
                vts = np.zeros(batch_size, np.int32)
                vfs = np.zeros(batch_size, np.int32)
                for row, i in enumerate(tile):
                    reflected = np.pad(
                        np.asarray(waveforms[i], np.float32), pad,
                        mode="reflect")
                    buf[row, : min(len(reflected), need)] = reflected[:need]
                    vts[row] = 1 + len(waveforms[i]) // hop
                    vfs[row] = num_frames[i]
                for row in range(len(tile), batch_size):  # repeat last row
                    buf[row] = buf[len(tile) - 1]
                    vts[row] = vts[len(tile) - 1]
                    vfs[row] = vfs[len(tile) - 1]
                outs = run(self.variables, jnp.asarray(buf),
                           jnp.asarray(vts), jnp.asarray(vfs))
                pending.append((tile, outs))
        for tile, outs in pending:
            conf_all = np.asarray(outs)
            for row, i in enumerate(tile):
                conf = conf_all[row, : num_frames[i]]
                bits = (conf >= self.threshold).astype(np.int64)
                results[i] = (bits, conf)
        return results
