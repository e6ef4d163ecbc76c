"""Batched synthetic-mixture quality evaluation (BASELINE config[1]).

Mixes clean test clips with corpus noise at a fixed SNR on device,
denoises them through the batched fused program (ground-truth or
detector-predicted silent intervals), and computes the speech-quality
suite per clip — a single-command quality snapshot per SNR without the
reference's two-stage JSON/WAV file dance. Used for training-time quality
tracking and per-SNR reports.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sos_tpu.config import ExperimentConfig
from sos_tpu.data.pipeline import DenoiserBatcher, device_mix_and_stft_denoiser
from sos_tpu.dsp import audio_io
from sos_tpu.dsp.crm import apply_compressed_crm
from sos_tpu.dsp.stft import istft
from sos_tpu.eval.speech import evaluate_metrics
from sos_tpu.models import JointDenoiser

METRIC_KEYS = ("l1", "stoi", "csig", "cbak", "covl", "pesq", "ssnr_regular",
               "ssnr_shift", "ssnr_clip", "ssnr_exsi", "overall_snr")


def evaluate_synthetic(
    cfg: ExperimentConfig,
    denoiser_vars: Dict,
    batcher: DenoiserBatcher,
    metrics_sr: int = 16000,
    max_batches: Optional[int] = None,
    compute_dtype: str = "float32",
    profile: Optional[str] = None,
    noisy_baseline: bool = False,
    quant_kwargs: Optional[Dict] = None,
    bf16_head_proj: bool = True,
) -> OrderedDict:
    """Run batched mix->denoise->metrics; returns avg_* aggregates.

    The batcher must be built with a pinned snr_idx (cfg.data.snr_idx) for
    a per-SNR report; denoising uses the ground-truth bitstreams (the
    reference's stage-2 eval setting when intervals are known).

    `profile` ("f32"/"bf16"/"int8"): run the eval through a bench.py
    serving profile — THE way to measure a profile's STOI/PESQ delta on
    real data for a given checkpoint (int8 self-calibrates on the first
    batch).

    `noisy_baseline=True` additionally scores the NOISY mixtures against
    clean (`noisy_avg_*` keys) so the report shows the improvement the
    denoiser delivers, not just absolute numbers.

    `quant_kwargs` forwards extra constructor knobs to QuantizedDenoiser
    for the int8 profile (e.g. bf16_head_proj=False to certify the head
    projection's quality delta on a trained checkpoint —
    experiments/bf16_head_trained_cert.py).

    `bf16_head_proj` applies to the bf16 profile (matching serving,
    fused.py: bf16 trunks + bf16 LSTM input projection as of r5); pass
    False to evaluate the pre-r5 exact-f32-head bf16 profile. The f32
    profile is never affected.
    """
    if profile in ("f32", None):
        compute_dtype = "float32"
    elif profile == "bf16":
        compute_dtype = "bfloat16"
    model = JointDenoiser(cfg.denoiser, compute_dtype=compute_dtype,
                          bf16_head_proj=(profile == "bf16"
                                          and bf16_head_proj))
    scfg = cfg.stft
    quant = None
    if profile == "int8":
        from sos_tpu.models.quant import QuantizedDenoiser

        quant = QuantizedDenoiser(cfg.denoiser, denoiser_vars,
                                  inpaint_dtype="int8",
                                  **(quant_kwargs or {}))

    @jax.jit
    def run(variables, clean, noise, snr, bits):
        d = device_mix_and_stft_denoiser(clean, noise, snr, bits,
                                         cfg.data, cfg.stft)
        if quant is not None:
            _, crm = quant(d["mixed"], d["noise"])
        else:
            _, crm = model.apply(variables, d["mixed"], d["noise"],
                                 train=False)
        out_stft = apply_compressed_crm(d["mixed"], crm)
        denoised = istft(out_stft, scfg.n_fft, scfg.hop_length,
                         scfg.win_length)
        clean_sig = istft(d["clean"], scfg.n_fft, scfg.hop_length,
                          scfg.win_length)
        if not noisy_baseline:  # trace-time constant: skip the extra
            return denoised, clean_sig, ()  # iSTFT + host transfer
        mixed_sig = istft(d["mixed"], scfg.n_fft, scfg.hop_length,
                          scfg.win_length)
        return denoised, clean_sig, mixed_sig

    def calibrate_first(batch):
        if quant is None or quant._calibrated:
            return
        d = jax.jit(lambda c, n, s, b: device_mix_and_stft_denoiser(
            c, n, s, b, cfg.data, cfg.stft))(
            jnp.asarray(batch["clean"]), jnp.asarray(batch["noise"]),
            jnp.asarray(batch["snr"]), jnp.asarray(batch["bits"]))
        quant.calibrate([(d["mixed"], d["noise"])])

    per_clip = []
    noisy_clip = []
    sr = cfg.data.sample_rate
    for b_idx, batch in enumerate(batcher):
        if max_batches is not None and b_idx >= max_batches:
            break
        if b_idx == 0:
            calibrate_first(batch)
        denoised, clean_sig, mixed_sig = run(
            denoiser_vars, jnp.asarray(batch["clean"]),
            jnp.asarray(batch["noise"]), jnp.asarray(batch["snr"]),
            jnp.asarray(batch["bits"]))
        denoised = np.asarray(denoised)
        clean_sig = np.asarray(clean_sig)
        mixed_sig = np.asarray(mixed_sig)

        def _one(i):
            out_16k = audio_io.resample(denoised[i], sr, metrics_sr)
            ref_16k = audio_io.resample(clean_sig[i], sr, metrics_sr)
            return evaluate_metrics(out_16k, ref_16k, sr=metrics_sr)

        def _one_noisy(i):
            mix_16k = audio_io.resample(mixed_sig[i], sr, metrics_sr)
            ref_16k = audio_io.resample(clean_sig[i], sr, metrics_sr)
            return evaluate_metrics(mix_16k, ref_16k, sr=metrics_sr)

        # host metric suite threads well (numpy releases the GIL)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=8) as pool:
            per_clip.extend(pool.map(_one, range(denoised.shape[0])))
            if noisy_baseline:
                noisy_clip.extend(pool.map(_one_noisy,
                                           range(denoised.shape[0])))

    agg = OrderedDict()
    agg["num_clips"] = len(per_clip)
    for key in METRIC_KEYS:
        vals = [m[key] for m in per_clip]
        agg[f"avg_{key}"] = float(np.nanmean(vals)) if per_clip else float("nan")
    if noisy_baseline:
        for key in METRIC_KEYS:
            vals = [m[key] for m in noisy_clip]
            agg[f"noisy_avg_{key}"] = (float(np.nanmean(vals))
                                       if noisy_clip else float("nan"))
    return agg
