"""Headline benchmark: end-to-end denoise inference throughput on one chip.

Measures the fused program waveform -> STFT -> JointDenoiser -> cRM
inverse -> iSTFT -> waveform on batches of 2 s / 14 kHz clips (the
reference's inference unit, m2 predict.py:405-526) and reports
audio-seconds of denoised speech produced per wall-clock second per chip.

Baseline: the driver's north-star target of 500x real-time per chip
(BASELINE.json); `vs_baseline` = value / 500.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import os

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from sos_tpu.config import ExperimentConfig, fast_denoiser_config
    from sos_tpu.dsp.crm import apply_compressed_crm
    from sos_tpu.dsp.stft import istft, stft
    from sos_tpu.models import JointDenoiser

    # TPU-fast profile: bf16 conv trunks (f32 LSTM/mask head) + the noise
    # encoder widened 48->64 channels (measured: 48-ch stacks run at
    # ~26 TFLOP/s on v5e vs ~83 at 64 — 1.8x faster wall-clock; reference
    # checkpoints import losslessly via zero-padding).
    cfg = ExperimentConfig(denoiser=fast_denoiser_config())
    model = JointDenoiser(cfg.denoiser, compute_dtype="bfloat16")
    samples = cfg.data.clip_seconds * cfg.data.sample_rate
    t = 1 + samples // cfg.stft.hop_length
    batch = 128  # throughput scales sublinearly; 128 > 500x real-time

    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, cfg.denoiser.freq_bins, t, 2))
    # NB: eager init is pathologically slow over the remote TPU tunnel
    # (one RPC per param); jit makes it one program.
    variables = jax.jit(
        lambda k: model.init(k, dummy, dummy, train=False))(rng)

    def denoise(params, mixed, mask):
        mixed_stft = stft(mixed)
        gated_stft = stft(mixed * mask)
        _, crm = model.apply(params, mixed_stft, gated_stft, train=False)
        return istft(apply_compressed_crm(mixed_stft, crm))

    # Timing methodology: the remote-TPU runtime's block_until_ready does
    # not reliably wait for execution — only a host data fetch does. So
    # all iterations run inside ONE program (lax.scan over distinct
    # inputs) and the fetched scalar checksum forces completion; the
    # single dispatch round-trip amortizes over `iters` batches.
    iters = 4

    @jax.jit
    def bench_fn(params, stack, mask):
        def body(carry, m):
            out = denoise(params, m, mask)
            return carry + out[:, :: 997].sum(), None

        total, _ = jax.lax.scan(body, jnp.float32(0), stack)
        return total

    k1, k2 = jax.random.split(rng)
    base = jax.random.normal(k1, (batch, samples), jnp.float32) * 0.1
    stack = jnp.stack([base + 1e-4 * i for i in range(iters)])
    mask = (jax.random.uniform(k2, (batch, samples)) > 0.5).astype(jnp.float32)

    float(bench_fn(variables, stack, mask))  # warmup/compile
    start = time.perf_counter()
    checksum = float(bench_fn(variables, stack, mask))
    elapsed = time.perf_counter() - start
    assert np.isfinite(checksum)

    audio_sec = iters * batch * (samples / cfg.data.sample_rate)
    throughput = audio_sec / elapsed
    print(json.dumps({
        "metric": "denoise_throughput",
        "value": round(throughput, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(throughput / 500.0, 4),
    }))


if __name__ == "__main__":
    main()
