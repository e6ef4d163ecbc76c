"""Two-stage fused program for the FLOAT profiles (VERDICT r4 weak #1/#2).

Measures, with bench.py's scan-in-one-program methodology:
  f32_two_stage          — reference-exact numerics end to end
  bf16_two_stage         — bf16 conv trunks, exact-f32 LSTM/mask heads
  bf16_two_stage_bf16h   — + bf16 LSTM input projection in BOTH heads
                           (models/{detector,denoiser}.py bf16_head_proj,
                           the r4 int8-profile win applied to bf16)
  bf16_only_bf16h        — denoiser-only with the bf16 head projection
                           (vs the recorded 600 audio-s/s f32-head number)

BATCHES env (default "128,256") sweeps the batch dimension.
"""
import json
import os
import time

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from sos_tpu.config import ExperimentConfig, fast_denoiser_config
from sos_tpu.dsp.crm import apply_compressed_crm
from sos_tpu.dsp.mixing import bitstream_to_sample_mask
from sos_tpu.dsp.stft import istft, stft
from sos_tpu.models import JointDenoiser, SilenceDetector

BATCHES = [int(b) for b in os.environ.get("BATCHES", "128,256").split(",")]
ITERS = int(os.environ.get("ITERS", "4"))
REPEATS = int(os.environ.get("REPEATS", "3"))


def measure(step, stack, mask, audio_sec):
    @jax.jit
    def bench_fn(stack, mask):
        def body(carry, m):
            out = step(m, mask)
            return carry + out[:, ::997].sum(), None

        total, _ = jax.lax.scan(body, jnp.float32(0), stack)
        return total

    float(bench_fn(stack, mask))  # compile + warm
    rates = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        chk = float(bench_fn(stack, mask))
        rates.append(audio_sec * ITERS / (time.perf_counter() - t0))
        assert np.isfinite(chk)
    return {"median": round(float(np.median(rates)), 2),
            "spread": [round(min(rates), 2), round(max(rates), 2)]}


def main():
    cfg = ExperimentConfig(denoiser=fast_denoiser_config())
    samples = cfg.data.clip_seconds * cfg.data.sample_rate
    num_frames = int(cfg.data.clip_seconds * cfg.data.frame_rate)
    ratio = cfg.data.sample_rate / cfg.data.frame_rate
    scfg = cfg.stft
    t = 1 + samples // scfg.hop_length
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, cfg.denoiser.freq_bins, t, 2))
    den_vars = jax.jit(lambda k: JointDenoiser(cfg.denoiser).init(
        k, dummy, dummy, train=False))(rng)
    det_vars = jax.jit(lambda k: SilenceDetector(cfg.detector).init(
        k, dummy, num_frames=num_frames, train=False))(rng)

    def make_two_stage(dtype, bf16h):
        det = SilenceDetector(cfg.detector, compute_dtype=dtype,
                              bf16_head_proj=bf16h)
        den = JointDenoiser(cfg.denoiser, compute_dtype=dtype,
                            bf16_head_proj=bf16h)

        def step(mixed, _unused):
            mixed_stft = stft(mixed)
            logits = det.apply(det_vars, mixed_stft,
                               num_frames=num_frames, train=False)
            bits = (jax.nn.sigmoid(logits) >= 0.5).astype(jnp.float32)
            smask = bitstream_to_sample_mask(bits, ratio, samples,
                                             cfg.data.despeckle_min_run)
            gated_stft = stft(mixed * smask)
            _, crm = den.apply(den_vars, mixed_stft, gated_stft,
                               train=False)
            return istft(apply_compressed_crm(mixed_stft, crm))

        return step

    def make_den_only(dtype, bf16h):
        den = JointDenoiser(cfg.denoiser, compute_dtype=dtype,
                            bf16_head_proj=bf16h)

        def step(mixed, mask):
            mixed_stft = stft(mixed)
            gated_stft = stft(mixed * mask)
            _, crm = den.apply(den_vars, mixed_stft, gated_stft,
                               train=False)
            return istft(apply_compressed_crm(mixed_stft, crm))

        return step

    variants = {
        "f32_two_stage": make_two_stage("float32", False),
        "bf16_two_stage": make_two_stage("bfloat16", False),
        "bf16_two_stage_bf16h": make_two_stage("bfloat16", True),
        "bf16_only_bf16h": make_den_only("bfloat16", True),
    }
    results = {}
    k1, k2 = jax.random.split(rng)
    for batch in BATCHES:
        base = jax.random.normal(k1, (batch, samples), jnp.float32) * 0.1
        stack = jnp.stack([base + 1e-4 * i for i in range(ITERS)])
        mask = (jax.random.uniform(k2, (batch, samples)) > 0.5
                ).astype(jnp.float32)
        audio_sec = batch * (samples / cfg.data.sample_rate)
        for name, step in variants.items():
            key = f"{name}@{batch}"
            try:
                results[key] = measure(step, stack, mask, audio_sec)
            except Exception as exc:  # e.g. HBM OOM at large batch
                results[key] = {"error": f"{type(exc).__name__}: "
                                         f"{str(exc)[:160]}"}
            print(key, results[key], flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
