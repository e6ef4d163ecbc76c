"""Stage-2 inference: full-utterance denoising from predicted silent intervals.

Equivalent of m2 predict.py:255-526 but fused: where the reference
bounces host<->device (numpy STFT -> GPU net -> numpy icRM/iSTFT,
SURVEY.md §3.5), here waveform -> STFT -> JointDenoiser -> cRM inverse ->
iSTFT is ONE jitted program; only WAV decode and the bitstream ->
sample-mask prep stay on host.

Variable lengths: `buckets=None` compiles per length (simplest). With
`buckets` (spectrogram-frame counts), one program per bucket serves all
shorter utterances *numerically exactly*: the model runs its valid-aware
path (dynamic-boundary reflection pads, per-conv tail re-zeroing, masked
BiLSTM) and the iSTFT normalizes with a masked window envelope.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sos_tpu.config import ExperimentConfig
from sos_tpu.dsp.crm import apply_compressed_crm
from sos_tpu.dsp.mixing import bitstream_to_sample_mask_np
from sos_tpu.dsp.stft import istft, stft
from sos_tpu.models import JointDenoiser

DEFAULT_BUCKETS = (256, 512, 1024, 2048, 4096, 8192)



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


class DenoiserPredictor:
    def __init__(self, cfg: ExperimentConfig, variables: Dict,
                 buckets: Optional[Sequence[int]] = None,
                 profile: Optional[str] = None,
                 calibration_path: Optional[str] = None):
        """`profile`: None/"f32" (reference-exact), "bf16" (bf16 conv
        trunks), "int8" (quantized trunks; drift bound ~1e-4 mask scale,
        tests/test_quant.py). All profiles run the same exact
        length-bucketed machinery — for int8 via the quantized valid_t
        path (test_quantized_valid_t_bucketed_exact), so bucket choice
        never changes results WITHIN a profile.

        `calibration_path`: int8 activation-scale JSON (the schema
        FusedDenoisePipeline persists); loaded when present, else the
        predictor self-calibrates on its first utterance (deterministic
        for a fixed eval set)."""
        self.cfg = cfg
        compute_dtype = "bfloat16" if profile == "bf16" else "float32"
        self.model = JointDenoiser(cfg.denoiser, compute_dtype=compute_dtype)
        self.variables = variables
        self.buckets = tuple(buckets) if buckets else None
        self.profile = profile or "f32"
        self._quant = None
        self._calibration_path = calibration_path
        if profile == "int8":
            from sos_tpu.models.quant import QuantizedDenoiser

            self._quant = QuantizedDenoiser(cfg.denoiser, variables,
                                            inpaint_dtype="int8")

    def _apply(self, variables, mixed_stft, gated_stft, valid_t=None):
        if self._quant is not None:
            return self._quant(mixed_stft, gated_stft, valid_t=valid_t)
        return self.model.apply(variables, mixed_stft, gated_stft,
                                train=False, valid_t=valid_t)

    def _maybe_calibrate(self, mixed: np.ndarray, mask: np.ndarray) -> None:
        if self._quant is None or self._quant._calibrated:
            return
        if self._calibration_path:
            from sos_tpu.models.quant import load_persisted_calibration

            if load_persisted_calibration(self._quant,
                                          self._calibration_path,
                                          "denoiser"):
                return
        scfg = self.cfg.stft
        spec = stft(jnp.asarray(mixed)[None], scfg.n_fft, scfg.hop_length,
                    scfg.win_length)
        gated = stft(jnp.asarray(mixed * mask)[None], scfg.n_fft,
                     scfg.hop_length, scfg.win_length)
        self._quant.calibrate([(spec, gated)])

    def _compiled(self, *key):
        return _instance_memo(self, ("exact",) + key,
                              lambda: self._build_compiled(*key))

    def _build_compiled(self, num_samples: int):
        scfg = self.cfg.stft

        @jax.jit
        def run(variables, mixed, mask):
            mixed_stft = stft(mixed, scfg.n_fft, scfg.hop_length, scfg.win_length)
            gated_stft = stft(mixed * mask, scfg.n_fft, scfg.hop_length,
                              scfg.win_length)
            noise_pred, crm = self._apply(variables, mixed_stft, gated_stft)
            out_stft = apply_compressed_crm(mixed_stft, crm)
            return (istft(out_stft, scfg.n_fft, scfg.hop_length, scfg.win_length),
                    istft(noise_pred, scfg.n_fft, scfg.hop_length, scfg.win_length),
                    istft(gated_stft, scfg.n_fft, scfg.hop_length, scfg.win_length))

        return run

    def _compiled_bucketed(self, *key):
        return _instance_memo(self, ("bucketed",) + key,
                              lambda: self._build_compiled_bucketed(*key))

    def _build_compiled_bucketed(self, bucket_t: int):
        scfg = self.cfg.stft

        @jax.jit
        def run(variables, mixed_buf, gated_buf, valid_t):
            mixed_stft = stft(mixed_buf, scfg.n_fft, scfg.hop_length,
                              scfg.win_length, center=False)
            gated_stft = stft(gated_buf, scfg.n_fft, scfg.hop_length,
                              scfg.win_length, center=False)
            noise_pred, crm = self._apply(variables, mixed_stft, gated_stft,
                                          valid_t=valid_t)
            out_stft = apply_compressed_crm(mixed_stft, crm)
            kw = dict(n_fft=scfg.n_fft, hop_length=scfg.hop_length,
                      win_length=scfg.win_length, valid_t=valid_t)
            return (istft(out_stft, **kw), istft(noise_pred, **kw),
                    istft(gated_stft, **kw))

        return run

    def _bucket_t(self, valid_t: int) -> int:
        for b in self.buckets:
            if valid_t <= b:
                return b
        return valid_t

    def denoise_waveform(
        self, mixed: np.ndarray, bits: str, framerate: float = 30.0,
    ) -> Dict[str, np.ndarray]:
        """Denoise one utterance given its (predicted) silence bitstream.

        Returns waveforms: denoised, predicted full noise, gated noise
        observation — all iSTFT-length ((T-1)*hop), like the reference's
        outputs (m2 predict.py:422-426). With `buckets`, one compiled
        program per bucket serves all shorter utterances, numerically
        exactly (valid-aware model + masked-envelope iSTFT).
        """
        sr = self.cfg.data.sample_rate
        hop = self.cfg.stft.hop_length
        n_fft = self.cfg.stft.n_fft
        ratio = float(sr) / framerate
        mask = bitstream_to_sample_mask_np(
            np.asarray([0 if c == "0" else 1 for c in bits], np.float32),
            ratio, len(mixed), self.cfg.data.despeckle_min_run)
        out_len = (1 + len(mixed) // hop - 1) * hop
        mixed = mixed.astype(np.float32)
        self._maybe_calibrate(mixed, mask)

        if self.buckets is None:
            run = self._compiled(len(mixed))
            den, noi, gat = run(self.variables, jnp.asarray(mixed)[None],
                                jnp.asarray(mask)[None])
        else:
            valid_t = 1 + len(mixed) // hop
            bucket_t = self._bucket_t(valid_t)
            need = (bucket_t - 1) * hop + n_fft
            pad = n_fft // 2

            def buf(sig):
                reflected = np.pad(sig, pad, mode="reflect")
                out = np.zeros(need, np.float32)
                out[: len(reflected)] = reflected[:need]
                return jnp.asarray(out)[None]

            run = self._compiled_bucketed(bucket_t)
            den, noi, gat = run(self.variables, buf(mixed),
                                buf(mixed * mask), jnp.int32(valid_t))
        return {
            "denoised": np.asarray(den[0])[:out_len],
            "predicted_noise": np.asarray(noi[0])[:out_len],
            "gated_noise": np.asarray(gat[0])[:out_len],
        }

    # -- batched bucketed mode ------------------------------------------------

    def _compiled_bucketed_vmapped(self, *key):
        return _instance_memo(self, ("vmapped",) + key,
                              lambda: self._build_compiled_bucketed_vmapped(*key))

    def _build_compiled_bucketed_vmapped(self, bucket_t: int, batch: int,
                                   keys: Tuple[str, ...]):
        """vmap of the single-utterance bucketed program with per-item
        valid_t — one compiled program per (bucket, batch tile) serves
        mixed-length utterances in one device dispatch. `keys` selects
        which waveforms are materialised (device->host transfer is the
        bottleneck over a remote chip; eval only needs "denoised" unless
        it saves the intermediate wavs)."""
        scfg = self.cfg.stft

        def one(variables, mixed_buf, gated_buf, valid_t):
            mixed_stft = stft(mixed_buf[None], scfg.n_fft, scfg.hop_length,
                              scfg.win_length, center=False)
            gated_stft = stft(gated_buf[None], scfg.n_fft, scfg.hop_length,
                              scfg.win_length, center=False)
            noise_pred, crm = self._apply(variables, mixed_stft, gated_stft,
                                          valid_t=valid_t)
            out_stft = apply_compressed_crm(mixed_stft, crm)
            kw = dict(n_fft=scfg.n_fft, hop_length=scfg.hop_length,
                      win_length=scfg.win_length, valid_t=valid_t)
            full = {"denoised": lambda: istft(out_stft, **kw)[0],
                    "predicted_noise": lambda: istft(noise_pred, **kw)[0],
                    "gated_noise": lambda: istft(gated_stft, **kw)[0]}
            return tuple(full[k]() for k in keys)

        return jax.jit(jax.vmap(one, in_axes=(None, 0, 0, 0)))

    def denoise_batch(
        self,
        mixed_list: Sequence[np.ndarray],
        bits_list: Sequence[str],
        framerate: float = 30.0,
        batch_size: int = 8,
        keys: Tuple[str, ...] = ("denoised", "predicted_noise",
                                 "gated_noise"),
    ) -> list:
        """Batched full-utterance denoising (m2 predict.py runs batch-1;
        here same-bucket utterances share one device dispatch). Per-item
        outputs match `denoise_waveform` (bucketed-exact + vmap). Requires
        `buckets`; without them, falls back to the per-item path.

        Returns a list of dicts in input order (the requested `keys` of
        denoise_waveform's output).
        """
        keys = tuple(keys)
        if self.buckets is None:
            return [self.denoise_waveform(m, b, framerate)
                    for m, b in zip(mixed_list, bits_list)]
        sr = self.cfg.data.sample_rate
        hop = self.cfg.stft.hop_length
        n_fft = self.cfg.stft.n_fft
        pad = n_fft // 2
        ratio = float(sr) / framerate

        if self._quant is not None and mixed_list:
            m0 = np.asarray(mixed_list[0], np.float32)
            mask0 = bitstream_to_sample_mask_np(
                np.asarray([0 if c == "0" else 1 for c in bits_list[0]],
                           np.float32),
                ratio, len(m0), self.cfg.data.despeckle_min_run)
            self._maybe_calibrate(m0, mask0)

        groups: Dict[int, list] = {}
        for i, m in enumerate(mixed_list):
            groups.setdefault(self._bucket_t(1 + len(m) // hop), []).append(i)

        results: list = [None] * len(mixed_list)
        pending = []  # dispatch every tile async, fetch at the end
        for bucket_t, idxs in groups.items():
            need = (bucket_t - 1) * hop + n_fft
            run = self._compiled_bucketed_vmapped(bucket_t, batch_size, keys)
            for s in range(0, len(idxs), batch_size):
                tile = idxs[s: s + batch_size]
                mixed_buf = np.zeros((batch_size, need), np.float32)
                gated_buf = np.zeros((batch_size, need), np.float32)
                vts = np.zeros(batch_size, np.int32)
                for row, i in enumerate(tile):
                    m = np.asarray(mixed_list[i], np.float32)
                    mask = bitstream_to_sample_mask_np(
                        np.asarray([0 if c == "0" else 1
                                    for c in bits_list[i]], np.float32),
                        ratio, len(m), self.cfg.data.despeckle_min_run)
                    for buf, sig in ((mixed_buf, m), (gated_buf, m * mask)):
                        reflected = np.pad(sig, pad, mode="reflect")
                        buf[row, : min(len(reflected), need)] = \
                            reflected[:need]
                    vts[row] = 1 + len(m) // hop
                for row in range(len(tile), batch_size):  # repeat last row
                    mixed_buf[row] = mixed_buf[len(tile) - 1]
                    gated_buf[row] = gated_buf[len(tile) - 1]
                    vts[row] = vts[len(tile) - 1]
                outs = run(self.variables, jnp.asarray(mixed_buf),
                           jnp.asarray(gated_buf), jnp.asarray(vts))
                pending.append((tile, vts, outs))
        for tile, vts, outs in pending:
            outs = [np.asarray(o) for o in outs]
            for row, i in enumerate(tile):
                out_len = (vts[row] - 1) * hop
                results[i] = {k: o[row][:out_len]
                              for k, o in zip(keys, outs)}
        return results
