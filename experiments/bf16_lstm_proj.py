"""Measure the bf16 LSTM input projection in the quantized heads.

ROADMAP's last listed headroom: the BiLSTM's hoisted input projection
(C=3072 denoiser / 2048 detector) runs at f32 Precision.HIGHEST —
multi-pass on the MXU. `BiLSTM(bf16_proj=True)` runs that one matmul in
bfloat16 with f32 accumulation (the recurrence stays exact f32).

This measures, per the repo rule that only full-bench deltas decide:
  1. denoiser-only int8 and the full two-stage program, f32-proj vs
     bf16-proj, same scan-timing methodology as two_stage_breakdown.py;
  2. numeric drift: max |crm delta| on the denoiser mask head and
     detector decision flips at threshold 0.5.

BATCH env (default 256 = the recorded two-stage sweet spot), ITERS=4.
"""
import json
import os
import time

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from sos_tpu.config import (DetectorModelConfig, ExperimentConfig,
                            fast_denoiser_config)
from sos_tpu.dsp.crm import crm_sigmoid_recover
from sos_tpu.dsp.mixing import bitstream_to_sample_mask
from sos_tpu.dsp.stft import istft_packed, stft, stft_packed
from sos_tpu.models import JointDenoiser, SilenceDetector
from sos_tpu.models.quant import QuantizedDenoiser, QuantizedDetector

BATCH = int(os.environ.get("BATCH", "256"))
ITERS = 4


def measure(step, stack, mask, audio_sec):
    @jax.jit
    def bench_fn(stack, mask):
        def body(carry, m):
            return carry + step(m, mask), None

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
    det_vars = jax.jit(lambda k: SilenceDetector(det_cfg).init(
        k, dummy, num_frames=num_frames, train=False))(rng)

    k1, k2 = jax.random.split(rng)
    base = jax.random.normal(k1, (BATCH, samples), jnp.float32) * 0.1
    stack = jnp.stack([base + 1e-4 * i for i in range(ITERS)])
    maskw = (jax.random.uniform(k2, (BATCH, samples)) > 0.5).astype(jnp.float32)
    audio_sec = BATCH * (samples / cfg.data.sample_rate)

    spec8 = stft(base[:8])
    gated8 = stft(base[:8] * maskw[:8])

    def build(bf16):
        q = QuantizedDenoiser(cfg.denoiser, variables, inpaint_dtype="int8",
                              bf16_head_proj=bf16)
        q.calibrate([(spec8, gated8)])
        qd = QuantizedDetector(det_cfg, det_vars, bf16_head_proj=bf16)
        qd.calibrate([spec8])
        return q, qd

    results = {}
    for tag, bf16 in (("f32_proj", False), ("bf16_proj", True)):
        quant, qdet = build(bf16)

        def step_den(mixed, maskw):
            mr, mi = stft_packed(mixed)
            gr, gi = stft_packed(mixed * maskw)
            cr, ci = quant.crm_packed(mr, mi, gr, gi)
            rr, ri = crm_sigmoid_recover(cr), crm_sigmoid_recover(ci)
            out = istft_packed(rr * mr - ri * mi, rr * mi + ri * mr)
            return out[:, ::997].sum()

        def step_two(mixed, _unused):
            mr, mi = stft_packed(mixed)
            logits = qdet.logits_packed(mr, mi, num_frames)
            bits = (jax.nn.sigmoid(logits) >= 0.5).astype(jnp.float32)
            smask = bitstream_to_sample_mask(bits, ratio, samples,
                                             cfg.data.despeckle_min_run)
            gr, gi = stft_packed(mixed * smask)
            cr, ci = quant.crm_packed(mr, mi, gr, gi)
            rr, ri = crm_sigmoid_recover(cr), crm_sigmoid_recover(ci)
            out = istft_packed(rr * mr - ri * mi, rr * mi + ri * mr)
            return out[:, ::997].sum()

        for name, step in (("denoiser_int8", step_den),
                           ("two_stage", step_two)):
            print(f"{tag}/{name}:", flush=True)
            thr, per_iter = measure(step, stack, maskw, audio_sec)
            results[f"{tag}/{name}"] = {
                "audio_s_per_s": round(thr, 1),
                "ms_per_iter": round(per_iter * 1e3, 2)}
            print(f"  -> {results[f'{tag}/{name}']}", flush=True)

    # -- drift: same inputs through both heads ---------------------------
    quant_f, qdet_f = build(False)
    quant_b, qdet_b = build(True)
    mr, mi = stft_packed(base[:16])
    gr, gi = stft_packed(base[:16] * maskw[:16])

    @jax.jit
    def crm_pair():
        cf = jnp.stack(quant_f.crm_packed(mr, mi, gr, gi))
        cb = jnp.stack(quant_b.crm_packed(mr, mi, gr, gi))
        return jnp.max(jnp.abs(cf - cb))

    @jax.jit
    def det_pair():
        lf = qdet_f.logits_packed(mr, mi, num_frames)
        lb = qdet_b.logits_packed(mr, mi, num_frames)
        flips = jnp.sum((jax.nn.sigmoid(lf) >= 0.5)
                        != (jax.nn.sigmoid(lb) >= 0.5))
        return jnp.max(jnp.abs(lf - lb)), flips

    results["crm_max_abs_delta"] = float(crm_pair())
    dl, fl = det_pair()
    results["det_logit_max_abs_delta"] = float(dl)
    results["det_decision_flips"] = int(fl)
    results["det_decisions_total"] = 16 * num_frames
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
