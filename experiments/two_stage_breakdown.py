"""Locate the two-stage detector tax: measure sub-programs via scan-timing.

Variants (all batch 128, 2 s clips, packed layout, int8 trunks):
  base      : denoiser-only int8 (reference point ~1108 audio-s/s)
  det_trunk : base + detector int8 conv trunk (output consumed via tiny sum)
  det_full  : base + full detector logits (trunk + resize + BiLSTM + FC)
  mask_only : base + mask construction from input-derived bits (no detector)
  two_stage : the real fused program (det_full bits -> mask -> gated stft)
"""
import json
import os
import sys
import time

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from sos_tpu.config import (ExperimentConfig, DetectorModelConfig,
                            fast_denoiser_config)
from sos_tpu.dsp.crm import crm_sigmoid_recover
from sos_tpu.dsp.mixing import bitstream_to_sample_mask
from sos_tpu.dsp.stft import istft_packed, stft, stft_packed
from sos_tpu.models import JointDenoiser, SilenceDetector
from sos_tpu.models.quant import QuantizedDenoiser, QuantizedDetector
from sos_tpu.models.quant import _run_encoder_int8

BATCH = int(__import__("os").environ.get("BATCH", "128"))
ITERS = 4


def measure(step, stack, mask, audio_sec):
    @jax.jit
    def bench_fn(stack, mask):
        def body(carry, m):
            out = step(m, mask)
            return carry + out, None

        total, _ = jax.lax.scan(body, jnp.float32(0), stack)
        return total

    t0 = time.perf_counter()
    float(bench_fn(stack, mask))
    print(f"  compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
    start = time.perf_counter()
    checksum = float(bench_fn(stack, mask))
    elapsed = time.perf_counter() - start
    assert np.isfinite(checksum)
    return audio_sec * ITERS / elapsed, elapsed / ITERS


def main():
    cfg = ExperimentConfig(denoiser=fast_denoiser_config())
    det_cfg = DetectorModelConfig()
    samples = cfg.data.clip_seconds * cfg.data.sample_rate
    num_frames = int(cfg.data.clip_seconds * cfg.data.frame_rate)
    ratio = cfg.data.sample_rate / cfg.data.frame_rate

    rng = jax.random.PRNGKey(0)
    t = 1 + samples // cfg.stft.hop_length
    dummy = jnp.zeros((1, cfg.denoiser.freq_bins, t, 2))
    variables = jax.jit(lambda k: JointDenoiser(cfg.denoiser).init(
        k, dummy, dummy, train=False))(rng)
    det_model = SilenceDetector(det_cfg)
    det_vars = jax.jit(lambda k: det_model.init(
        k, dummy, num_frames=num_frames, train=False))(rng)

    k1, k2 = jax.random.split(rng)
    base = jax.random.normal(k1, (BATCH, samples), jnp.float32) * 0.1
    stack = jnp.stack([base + 1e-4 * i for i in range(ITERS)])
    maskw = (jax.random.uniform(k2, (BATCH, samples)) > 0.5).astype(jnp.float32)
    audio_sec = BATCH * (samples / cfg.data.sample_rate)

    spec8 = stft(base[:8])
    gated8 = stft(base[:8] * maskw[:8])
    quant = QuantizedDenoiser(cfg.denoiser, variables, inpaint_dtype="int8")
    quant.calibrate([(spec8, gated8)])
    qdet = QuantizedDetector(det_cfg, det_vars)
    qdet.calibrate([spec8])

    def denoise_from(mr, mi, smask):
        gr, gi = stft_packed(smask)
        cr, ci = quant.crm_packed(mr, mi, gr, gi)
        rr, ri = crm_sigmoid_recover(cr), crm_sigmoid_recover(ci)
        out = istft_packed(rr * mr - ri * mi, rr * mi + ri * mr)
        return out[:, ::997].sum()

    def step_base(mixed, maskw):
        mr, mi = stft_packed(mixed)
        return denoise_from(mr, mi, mixed * maskw)

    def step_det_trunk(mixed, maskw):
        mr, mi = stft_packed(mixed)
        x = jnp.swapaxes(jnp.stack([mr, mi], axis=1), -1, -2)
        specs = qdet._specs()
        h = _run_encoder_int8(qdet.enc, specs, x, packed=True)
        return denoise_from(mr, mi, mixed * maskw) + h[:, ::31, ::17].sum()

    def step_det_full(mixed, maskw):
        mr, mi = stft_packed(mixed)
        logits = qdet.logits_packed(mr, mi, num_frames)
        return denoise_from(mr, mi, mixed * maskw) + logits.sum() * 1e-6

    def step_mask_only(mixed, maskw):
        mr, mi = stft_packed(mixed)
        # Bits must depend on the scanned input: with closure-constant
        # bits the whole bits->mask construction is loop-invariant and
        # XLA hoists it out of the scan, reporting ~zero cost (the same
        # constant-folding pitfall the old denoiser-only bench had).
        bits = (mixed[:, :num_frames] > 0).astype(jnp.float32)
        smask = bitstream_to_sample_mask(bits, ratio, samples,
                                         cfg.data.despeckle_min_run)
        return denoise_from(mr, mi, mixed * smask)

    def step_two(mixed, _unused):
        mr, mi = stft_packed(mixed)
        logits = qdet.logits_packed(mr, mi, num_frames)
        bits = (jax.nn.sigmoid(logits) >= 0.5).astype(jnp.float32)
        smask = bitstream_to_sample_mask(bits, ratio, samples,
                                         cfg.data.despeckle_min_run)
        return denoise_from(mr, mi, mixed * smask)

    results = {}
    for name, step in [("base", step_base), ("det_trunk", step_det_trunk),
                       ("det_full", step_det_full),
                       ("mask_only", step_mask_only), ("two_stage", step_two)]:
        print(f"{name}:", flush=True)
        thr, per_iter = measure(step, stack, maskw, audio_sec)
        results[name] = {"audio_s_per_s": round(thr, 1),
                         "ms_per_iter": round(per_iter * 1e3, 2)}
        print(f"  -> {results[name]}", flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
