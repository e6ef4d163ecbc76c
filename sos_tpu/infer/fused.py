"""Fused end-to-end pipeline: ONE XLA program from noisy waveform to clean waveform.

The TPU-only capability called out in BASELINE.json's north star: the
reference runs stage 1 and stage 2 as separate CLIs glued by JSON/WAV
files, with STFT/iSTFT on host. Here

  STFT -> SilenceDetector -> threshold -> frame->sample mask (matmul +
  despeckle) -> gated-noise STFT -> JointDenoiser -> cRM inverse -> iSTFT

compiles into a single program over a fixed-size batch of clips: no host
round-trips, every stage fused by XLA, MXU-resident throughout.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sos_tpu.config import ExperimentConfig
from sos_tpu.dsp.crm import apply_compressed_crm
from sos_tpu.dsp.mixing import bitstream_to_sample_mask
from sos_tpu.dsp.stft import istft, stft
from sos_tpu.models import JointDenoiser, SilenceDetector

# -- int16 wire format -----------------------------------------------------
# 16-bit PCM sources decode to exact multiples of 1/32768 (audio_io.py:47),
# so shipping waveform chunks as int16 (k = round(y*32768)) HALVES the
# host<->device transfer bytes with zero input error for unresampled
# 16-bit audio; outputs rounded the same way sit within half an LSB of
# what a 16-bit WAV write stores anyway. Transfer dominates the serving
# wall clock on remote/tunneled TPUs (docs/ROADMAP.md streaming
# decomposition), and halving it is free quality-wise at PCM precision.
WIRE_SCALE = 32768.0


def wire_encode(y: np.ndarray) -> np.ndarray:
    """Host side: f32 waveform -> int16 wire chunks (round-to-nearest;
    exact inverse of audio_io's int16 decode for values k/32768)."""
    return np.clip(np.round(np.asarray(y, np.float32) * WIRE_SCALE),
                   -32768.0, 32767.0).astype(np.int16)


def wire_decode(y) -> np.ndarray:
    """Host side: int16 wire chunks -> f32 waveform."""
    return np.asarray(y, np.float32) * np.float32(1.0 / WIRE_SCALE)


def _wire_in(mixed: jnp.ndarray) -> jnp.ndarray:
    """In-graph ingest: accept f32 chunks or int16 wire chunks. jit
    retraces per input dtype, so both wire formats coexist in the
    program cache without configuration."""
    if mixed.dtype == jnp.int16:
        return mixed.astype(jnp.float32) * (1.0 / WIRE_SCALE)
    return mixed


def _wire_out(y: jnp.ndarray) -> jnp.ndarray:
    """In-graph emit: f32 waveform -> int16 wire samples."""
    return jnp.clip(jnp.round(y * WIRE_SCALE),
                    -32768.0, 32767.0).astype(jnp.int16)


class FusedDenoisePipeline:
    """Batched fixed-length clip denoising with in-graph silence detection."""

    def __init__(self, cfg: ExperimentConfig, detector_vars: Dict,
                 denoiser_vars: Dict, threshold: float = 0.5,
                 clip_seconds: float = 2.0, compute_dtype: str = "float32",
                 profile: str = None, calibration_path: str = None,
                 wire_dtype: str = "float32", bf16_head_proj: bool = True):
        """`profile`: "f32" | "bf16" | "int8" — the bench.py profiles.
        f32/bf16 map onto `compute_dtype`; "int8" swaps the denoiser for
        the quantized packed pipeline (models/quant.py; detector runs
        bf16). The int8 profile self-calibrates on the FIRST batch it
        sees (static activation scales; mixed spectra are an upper bound
        for the gated-noise observation, so the scales are safe).

        `calibration_path`: JSON file persisting the int8 activation
        scales — loaded when present (skips self-calibration so every
        serving process uses identical scales), written after the first
        self-calibration otherwise.

        `wire_dtype`: "float32" | "int16" — the dtype the DENOISED
        waveform leaves the device in. int16 halves the output transfer
        (see the wire-format note above); callers decode with
        `wire_decode`. Input chunks may be int16 wire samples in either
        mode (the programs ingest both dtypes).

        `bf16_head_proj` (bf16/int8 profiles; the f32 profile always
        keeps the exact head): run the LSTM input projection in bf16
        (int8: +2.9% two-stage, certified quality-neutral on trained
        checkpoints — docs/EXPERIMENTS.md). False restores the exact-f32
        head (exposed as --exact_f32_head on the serve/denoise/
        export_serving CLIs)."""
        if wire_dtype not in ("float32", "int16"):
            raise ValueError(f"wire_dtype must be float32|int16, "
                             f"got {wire_dtype!r}")
        self.wire_dtype = wire_dtype
        if profile:
            compute_dtype = {"f32": "float32", "bf16": "bfloat16",
                             "int8": "bfloat16"}[profile]
        self.profile = profile or (
            "bf16" if compute_dtype == "bfloat16" else "f32")
        self.cfg = cfg
        self.threshold = threshold
        # the bf16 serving profile also takes the bf16 head projection
        # (same knob as int8; certified on trained checkpoints). The f32
        # profile NEVER does — it is the reference-exact one.
        float_head_bf16 = bf16_head_proj and self.profile == "bf16"
        self.detector = SilenceDetector(cfg.detector,
                                        compute_dtype=compute_dtype,
                                        bf16_head_proj=float_head_bf16)
        self.denoiser = JointDenoiser(cfg.denoiser,
                                      compute_dtype=compute_dtype,
                                      bf16_head_proj=float_head_bf16)
        self.detector_vars = detector_vars
        self.denoiser_vars = denoiser_vars
        self.clip_samples = int(clip_seconds * cfg.data.sample_rate)
        self.num_frames = int(clip_seconds * cfg.data.frame_rate)
        self._calibration_path = calibration_path
        # serializes first-batch int8 calibration: with the r5 pipelined
        # serve path, dispatches run concurrently from the main loop and
        # the writer's finalize thread — two uncalibrated entries racing
        # would each fold scales and retrace
        import threading

        self._calibration_lock = threading.Lock()
        # set by shard(): a NamedSharding committing the batch dim over a
        # mesh; applied to EVERY entry point's array inputs (__call__,
        # detect_bits, denoise_with_bits) so StreamingDenoiser's
        # boundary-consistent split path is sharded too
        self._batch_sh = None
        self._quant = None
        self._quant_det = None
        if self.profile == "int8":
            from sos_tpu.models.quant import (QuantizedDenoiser,
                                              QuantizedDetector)

            self._quant = QuantizedDenoiser(cfg.denoiser, denoiser_vars,
                                            inpaint_dtype="int8",
                                            bf16_head_proj=bf16_head_proj)
            self._quant_det = QuantizedDetector(cfg.detector, detector_vars,
                                                bf16_head_proj=bf16_head_proj)
            self._run = self._build_int8()
        else:
            self._run = self._build()

    def _build(self):
        cfg = self.cfg
        scfg = cfg.stft
        ratio = cfg.data.sample_rate / cfg.data.frame_rate
        clip_samples = self.clip_samples
        num_frames = self.num_frames
        threshold = self.threshold
        detector, denoiser = self.detector, self.denoiser

        emit = _wire_out if self.wire_dtype == "int16" else (lambda y: y)

        @jax.jit
        def run(det_vars, den_vars, mixed):
            mixed = _wire_in(mixed)
            mixed_stft = stft(mixed, scfg.n_fft, scfg.hop_length, scfg.win_length)
            logits = detector.apply(det_vars, mixed_stft,
                                    num_frames=num_frames, train=False)
            bits = (jax.nn.sigmoid(logits) >= threshold).astype(jnp.float32)
            mask = bitstream_to_sample_mask(bits, ratio, clip_samples,
                                            cfg.data.despeckle_min_run)
            gated_stft = stft(mixed * mask, scfg.n_fft, scfg.hop_length,
                              scfg.win_length)
            noise_pred, crm = denoiser.apply(den_vars, mixed_stft, gated_stft,
                                             train=False)
            clean_stft = apply_compressed_crm(mixed_stft, crm)
            denoised = istft(clean_stft, scfg.n_fft, scfg.hop_length,
                             scfg.win_length)
            return emit(denoised), bits

        return run

    def _build_int8(self):
        cfg = self.cfg
        scfg = cfg.stft
        ratio = cfg.data.sample_rate / cfg.data.frame_rate
        clip_samples = self.clip_samples
        num_frames = self.num_frames
        threshold = self.threshold
        quant, quant_det = self._quant, self._quant_det
        from sos_tpu.dsp.crm import crm_sigmoid_recover
        from sos_tpu.dsp.stft import istft_packed, stft_packed

        # int8 programs take ONLY the waveform: the folded int8 weights
        # live inside the quant objects and close over as jit constants,
        # so passing the float checkpoint pytrees would cost per-call
        # flatten/hash dispatch on hundreds of arrays the traced program
        # never reads (the serve hot path pays that per request).
        emit = _wire_out if self.wire_dtype == "int16" else (lambda y: y)

        @jax.jit
        def run(mixed):
            mixed = _wire_in(mixed)
            # ONE packed STFT feeds both the quantized detector and the
            # denoiser's mixed branch.
            mr, mi = stft_packed(mixed, scfg.n_fft, scfg.hop_length,
                                 scfg.win_length)
            logits = quant_det.logits_packed(mr, mi, num_frames)
            bits = (jax.nn.sigmoid(logits) >= threshold).astype(jnp.float32)
            mask = bitstream_to_sample_mask(bits, ratio, clip_samples,
                                            cfg.data.despeckle_min_run)
            gr, gi = stft_packed(mixed * mask, scfg.n_fft, scfg.hop_length,
                                 scfg.win_length)
            cr, ci = quant.crm_packed(mr, mi, gr, gi)
            rr, ri = crm_sigmoid_recover(cr), crm_sigmoid_recover(ci)
            denoised = istft_packed(rr * mr - ri * mi, rr * mi + ri * mr,
                                    scfg.n_fft, scfg.hop_length,
                                    scfg.win_length)
            return emit(denoised), bits

        return run

    def _commit(self, arr: jnp.ndarray) -> jnp.ndarray:
        """Apply the shard() batch sharding (no-op when unsharded)."""
        if self._batch_sh is None:
            return arr
        return jax.device_put(arr, self._batch_sh)

    def __call__(self, mixed: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """mixed: (B, clip_samples) -> (denoised (B, (T-1)*hop), bits (B, frames))."""
        assert mixed.shape[-1] == self.clip_samples, (
            mixed.shape, self.clip_samples)
        self._maybe_calibrate(mixed)
        mixed = self._commit(mixed)
        if self._quant is not None:
            return self._run(mixed)
        return self._run(self.detector_vars, self.denoiser_vars, mixed)

    # -- split entries (used by StreamingDenoiser's boundary-consistent
    #    mode: detect all chunks first, reconcile bits across overlaps,
    #    then denoise with the reconciled bits) -----------------------------

    def _build_split(self):
        cfg = self.cfg
        scfg = cfg.stft
        ratio = cfg.data.sample_rate / cfg.data.frame_rate
        clip_samples = self.clip_samples
        threshold = self.threshold
        detector, denoiser = self.detector, self.denoiser
        emit = _wire_out if self.wire_dtype == "int16" else (lambda y: y)

        # Detection windows may be LONGER than clip_samples (the
        # StreamingDenoiser detector-context halo prepends left context
        # so low-SNR detection sees more history than one chunk) — the
        # bit count follows the traced input length (static under jit:
        # a new window length is just another cached program shape).
        # The standard shape keeps the pinned num_frames verbatim, so
        # no existing program can change by a rounding edge case.
        num_frames = self.num_frames

        def _nf(n_samples: int) -> int:
            if n_samples == clip_samples:
                return num_frames
            return int(round(n_samples * cfg.data.frame_rate
                             / cfg.data.sample_rate))

        quant_det = self._quant_det

        if quant_det is not None:
            from sos_tpu.dsp.stft import stft_packed as _sp

            # int8 variants take only arrays (weights are jit constants;
            # see _build_int8)
            @jax.jit
            def detect(mixed):
                mixed = _wire_in(mixed)
                mr, mi = _sp(mixed, scfg.n_fft, scfg.hop_length,
                             scfg.win_length)
                logits = quant_det.logits_packed(mr, mi,
                                                 _nf(mixed.shape[-1]))
                return (jax.nn.sigmoid(logits) >= threshold
                        ).astype(jnp.float32)
        else:
            @jax.jit
            def detect(det_vars, mixed):
                mixed = _wire_in(mixed)
                mixed_stft = stft(mixed, scfg.n_fft, scfg.hop_length,
                                  scfg.win_length)
                logits = detector.apply(det_vars, mixed_stft,
                                        num_frames=_nf(mixed.shape[-1]),
                                        train=False)
                return (jax.nn.sigmoid(logits) >= threshold
                        ).astype(jnp.float32)

        quant = self._quant

        if quant is not None:  # int8 profile: packed quantized denoiser
            from sos_tpu.dsp.crm import crm_sigmoid_recover
            from sos_tpu.dsp.stft import istft_packed, stft_packed

            @jax.jit
            def denoise_bits(mixed, bits):
                mixed = _wire_in(mixed)
                mask = bitstream_to_sample_mask(
                    bits, ratio, clip_samples, cfg.data.despeckle_min_run)
                mr, mi = stft_packed(mixed, scfg.n_fft, scfg.hop_length,
                                     scfg.win_length)
                gr, gi = stft_packed(mixed * mask, scfg.n_fft,
                                     scfg.hop_length, scfg.win_length)
                cr, ci = quant.crm_packed(mr, mi, gr, gi)
                rr, ri = crm_sigmoid_recover(cr), crm_sigmoid_recover(ci)
                return emit(istft_packed(rr * mr - ri * mi,
                                         rr * mi + ri * mr,
                                         scfg.n_fft, scfg.hop_length,
                                         scfg.win_length))
        else:
            @jax.jit
            def denoise_bits(den_vars, mixed, bits):
                mixed = _wire_in(mixed)
                mixed_stft = stft(mixed, scfg.n_fft, scfg.hop_length,
                                  scfg.win_length)
                mask = bitstream_to_sample_mask(bits, ratio, clip_samples,
                                                cfg.data.despeckle_min_run)
                gated_stft = stft(mixed * mask, scfg.n_fft, scfg.hop_length,
                                  scfg.win_length)
                _, crm = denoiser.apply(den_vars, mixed_stft, gated_stft,
                                        train=False)
                clean_stft = apply_compressed_crm(mixed_stft, crm)
                return emit(istft(clean_stft, scfg.n_fft, scfg.hop_length,
                                  scfg.win_length))

        return detect, denoise_bits

    def detect_bits(self, mixed: jnp.ndarray) -> jnp.ndarray:
        """(B, n) -> thresholded bits (B, round(n * frame_rate / sr)).

        n is normally clip_samples (bits == num_frames); the streaming
        detector-context halo passes longer windows (chunk + left
        context) and crops the leading context frames itself."""
        self._maybe_calibrate(mixed)
        if not hasattr(self, "_detect"):
            self._detect, self._denoise_bits = self._build_split()
        mixed = self._commit(mixed)
        if self._quant_det is not None:
            return self._detect(mixed)
        return self._detect(self.detector_vars, mixed)

    def denoise_with_bits(self, mixed: jnp.ndarray,
                          bits: jnp.ndarray) -> jnp.ndarray:
        """Denoise with externally supplied (e.g. reconciled) bits."""
        self._maybe_calibrate(mixed)
        if not hasattr(self, "_denoise_bits"):
            self._detect, self._denoise_bits = self._build_split()
        mixed, bits = self._commit(mixed), self._commit(bits)
        if self._quant is not None:
            return self._denoise_bits(mixed, bits)
        return self._denoise_bits(self.denoiser_vars, mixed, bits)

    def ensure_calibrated(self) -> bool:
        """True when the pipeline can run with its final numerics —
        non-quantized profile, already calibrated, or persisted scales
        loaded here. Does NOT self-calibrate (the first real batch owns
        that): warming compiled programs on pre-calibration scales would
        waste the compiles, since calibration re-folds the int8 weights
        and retraces."""
        if self._quant is None or self._quant._calibrated:
            return True
        return bool(self._calibration_path and
                    self.load_calibration_file(self._calibration_path))

    def load_calibration_file(self, path: str, strict: bool = False) -> bool:
        """Load persisted int8 scales. Non-strict (serving): a missing,
        truncated or wrong-schema file logs a warning and returns False —
        the pipeline then self-calibrates and rewrites it. Strict
        (export): raises ValueError naming the file and the problem."""
        import logging

        from sos_tpu.models.quant import (CALIBRATION_SCHEMA_ERRORS,
                                          parse_calibration_file)

        def _fail(msg):
            if strict:
                raise ValueError(f"calibration file {path}: {msg}")
            logging.getLogger(__name__).warning(
                "calibration file %s: %s — self-calibrating instead",
                path, msg)
            return False

        state, problem = parse_calibration_file(path)
        if state is None:
            return _fail(problem)
        if "denoiser" not in state:
            return _fail(
                'missing the "denoiser" key (expected the schema this '
                "pipeline writes: {'denoiser': scales, 'detector': scales})")

        # load_calibration mutates scales before the full schema can be
        # validated, so snapshot first and restore on any rejection —
        # otherwise a rejected file leaves a partial load behind (the
        # adopt-on-publish-collision path below must keep its good
        # self-calibrated scales when the published file is rejected,
        # or it would serve scales that differ from the file it then
        # publishes).
        snap_den = (self._quant.calibration_state()
                    if self._quant._calibrated else None)
        snap_det = (self._quant_det.calibration_state()
                    if self._quant_det is not None
                    and self._quant_det._calibrated else None)

        def _restore():
            if snap_den is not None:
                self._quant.load_calibration(snap_den)
            else:
                self._quant._calibrated = False
            if self._quant_det is not None:
                if snap_det is not None:
                    self._quant_det.load_calibration(snap_det)
                else:
                    self._quant_det._calibrated = False

        try:
            self._quant.load_calibration(state["denoiser"])
            if self._quant_det is not None:
                if "detector" not in state:
                    _restore()
                    return _fail('missing the "detector" scales this '
                                 "two-stage pipeline needs")
                self._quant_det.load_calibration(state["detector"])
        except CALIBRATION_SCHEMA_ERRORS as exc:
            _restore()
            return _fail(f"wrong scale schema ({type(exc).__name__}: {exc})")
        return True

    def _maybe_calibrate(self, mixed) -> None:
        if self._quant is None or self._quant._calibrated:
            return
        with self._calibration_lock:
            if self._quant._calibrated:  # lost the race: already done
                return
            self._calibrate_locked(mixed)

    def _calibrate_locked(self, mixed) -> None:
        import json
        import os
        import tempfile

        path = self._calibration_path
        if path and self.load_calibration_file(path):
            return
        mixed = np.asarray(mixed)
        if mixed.dtype == np.int16:  # int16 wire chunks calibrate too
            mixed = wire_decode(mixed)
        spec = stft(jnp.asarray(mixed), self.cfg.stft.n_fft,
                    self.cfg.stft.hop_length, self.cfg.stft.win_length)
        if not self._quant._calibrated:
            self._quant.calibrate([(spec, spec)])
        if self._quant_det is not None and not self._quant_det._calibrated:
            self._quant_det.calibrate([spec])
        if path:
            state = {"denoiser": self._quant.calibration_state()}
            if self._quant_det is not None:
                state["detector"] = self._quant_det.calibration_state()
            # Publish first-writer-wins: write the complete file to a tmp
            # name, then hardlink it into place — link() fails atomically
            # if another process already published, and the published
            # file is always complete (never truncated mid-write). A
            # loser ADOPTS the winner's scales so every concurrent
            # serving process converges on one identical scale set.
            fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                                       suffix=".tmp")
            try:
                with os.fdopen(fd, "w") as fp:
                    json.dump(state, fp, indent=1)
                try:
                    os.link(tmp, path)
                except FileExistsError:
                    if not self.load_calibration_file(path):
                        # the existing file is the unreadable one we
                        # already rejected above — overwrite it
                        os.replace(tmp, path)
                        return
                except OSError:
                    # filesystem without hardlinks (some NFS/FUSE
                    # mounts): fall back to the atomic-but-last-writer-
                    # wins publish, then adopt whatever file won
                    os.replace(tmp, path)
                    self.load_calibration_file(path)
                    return
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)

    def shard(self, mesh, axis: str = "data") -> "FusedDenoisePipeline":
        """Serve batch-sharded over a device mesh (SPMD inference).

        Replicates the variables and marks the batch dim sharded; the same
        jitted programs then scale over however many chips the mesh has
        (each call's batch must divide the mesh size). Covers every entry
        point — the fused __call__ AND the detect_bits/denoise_with_bits
        split pair StreamingDenoiser's boundary-consistent mode uses —
        via the _commit hook on their array inputs.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self._quant is None:
            # float profiles pass the checkpoints as program arguments;
            # int8 programs close over folded constants instead (XLA
            # replicates jit constants itself)
            rep = NamedSharding(mesh, P())
            self.detector_vars = jax.device_put(self.detector_vars, rep)
            self.denoiser_vars = jax.device_put(self.denoiser_vars, rep)
        self._batch_sh = NamedSharding(mesh, P(axis))
        return self
