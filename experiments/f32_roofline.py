"""f32 roofline (VERDICT r4 weak #1): is the reference-exact f32
profile's 445 audio-s/s speed-of-light on this chip, or is there
headroom that would push it past the 500x north star?

Method (all on the real TPU, bench.py's fetch-synchronized scan
methodology):

  1. The f32 denoiser-only step (bench.py's `f32` profile, batch 128):
     measured wall time + XLA `cost_analysis()` FLOPs of the compiled
     program -> achieved TFLOP/s.
  2. The chip's PRACTICAL f32 ceiling at the model's own precision
     setting (lax.Precision.DEFAULT, what every ConvBlock uses —
     models/layers.py): one big dense f32 matmul, and the model's own
     dominant conv shape (3x3 x 256->256 on the (F/4, T/4) mid grid)
     isolated, both f32-DEFAULT and bf16 for contrast.
  3. ideal_audio_s_per_s = audio_sec / (program FLOPs / conv ceiling):
     the throughput the f32 program would reach if every FLOP ran at
     the isolated-conv ceiling and everything else were free. If that
     bound is itself near/below the 500x target, no fusion or layout
     work can make reference-exact f32 cross it and the >=500x story
     legitimately rides the certified bf16/int8 profiles.

Prints ONE JSON line; recorded in docs/ROADMAP.md + committed as
experiments/f32_roofline_results.json.
"""
import json
import os
import time

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("ITERS", "4"))
REPEATS = int(os.environ.get("REPEATS", "3"))


def timed(fn, *args):
    """Median seconds per call of fn(*args) (fetch-synchronized)."""
    float(fn(*args))  # compile + warm
    rates = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        chk = float(fn(*args))
        rates.append(time.perf_counter() - t0)
        assert np.isfinite(chk)
    return float(np.median(rates))


def scan_bench(step):
    @jax.jit
    def bench_fn(stack, mask):
        def body(carry, m):
            out = step(m, mask)
            return carry + out[:, ::997].sum(), None

        total, _ = jax.lax.scan(body, jnp.float32(0), stack)
        return total

    return bench_fn


def program_flops(fn, *args):
    """XLA cost-analysis FLOPs of the compiled program (per call)."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def main():
    from sos_tpu.config import ExperimentConfig, fast_denoiser_config
    from sos_tpu.dsp.crm import apply_compressed_crm
    from sos_tpu.dsp.stft import istft, stft
    from sos_tpu.models import JointDenoiser

    cfg = ExperimentConfig(denoiser=fast_denoiser_config())
    samples = cfg.data.clip_seconds * cfg.data.sample_rate
    t = 1 + samples // cfg.stft.hop_length
    batch = 128
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, cfg.denoiser.freq_bins, t, 2))
    variables = jax.jit(lambda k: JointDenoiser(cfg.denoiser).init(
        k, dummy, dummy, train=False))(rng)

    k1, k2 = jax.random.split(rng)
    base = jax.random.normal(k1, (batch, samples), jnp.float32) * 0.1
    stack = jnp.stack([base + 1e-4 * i for i in range(ITERS)])
    mask = (jax.random.uniform(k2, (batch, samples)) > 0.5
            ).astype(jnp.float32)
    audio_sec = batch * (samples / cfg.data.sample_rate)

    results = {}

    # --- 1. the f32 profile program: time + FLOPs ------------------------
    model = JointDenoiser(cfg.denoiser, compute_dtype="float32")

    def step(mixed, mask):
        mixed_stft = stft(mixed)
        gated_stft = stft(mixed * mask)
        _, crm = model.apply(variables, mixed_stft, gated_stft,
                             train=False)
        return istft(apply_compressed_crm(mixed_stft, crm))

    sec = timed(scan_bench(step), stack, mask) / ITERS
    flops = program_flops(lambda m: step(m, mask), base)
    results["f32_step"] = {
        "audio_s_per_s": round(audio_sec / sec, 1),
        "ms": round(1e3 * sec, 1),
        "gflops_per_batch": round(flops / 1e9, 1),
        "achieved_tflops": round(flops / sec / 1e12, 2),
    }

    # --- 2. isolated ceilings at the model's precision -------------------
    # (a) big dense matmul, f32 DEFAULT (the MXU's practical f32 rate
    #     under the exact precision flag the model's convs use)
    for name, dt in (("matmul_f32_default", jnp.float32),
                     ("matmul_bf16", jnp.bfloat16)):
        n = 4096
        a = jnp.ones((n, n), dt)

        @jax.jit
        def mm(a):
            # 8 chained matmuls amortize dispatch
            x = a
            for _ in range(8):
                x = jnp.matmul(x, a) * (1.0 / n)
            return x.astype(jnp.float32)[::997, ::997].sum()

        sec_mm = timed(mm, a)
        fl = 8 * 2 * n**3
        results[name] = {"tflops": round(fl / sec_mm / 1e12, 2)}

    # (b) the model's own dominant conv: 3x3 x ch3->ch3 on the mid grid
    #     (InpaintNet mid blocks: 8 of these carry most of the FLOPs)
    f4, t4, ch3 = cfg.denoiser.freq_bins // 4, (t + 3) // 4, 256
    for name, dt in (("conv_mid_f32_default", jnp.float32),
                     ("conv_mid_bf16", jnp.bfloat16)):
        x0 = jnp.ones((batch, f4, t4, ch3), dt)
        w = jnp.ones((3, 3, ch3, ch3), dt) * (1.0 / (9 * ch3))

        @jax.jit
        def cv(x, w):
            for _ in range(8):
                x = jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=jax.lax.Precision.DEFAULT)
            return x.astype(jnp.float32)[:, ::31, ::31, ::97].sum()

        sec_cv = timed(cv, x0, w)
        fl = 8 * 2 * batch * f4 * t4 * 9 * ch3 * ch3
        results[name] = {"tflops": round(fl / sec_cv / 1e12, 2),
                         "ms_per_conv": round(1e3 * sec_cv / 8, 2)}

    # --- 3. the bound ------------------------------------------------------
    ceiling = results["conv_mid_f32_default"]["tflops"]
    ideal_sec = flops / (ceiling * 1e12)
    results["bound"] = {
        "conv_ceiling_tflops": ceiling,
        "ideal_audio_s_per_s_at_ceiling": round(audio_sec / ideal_sec, 1),
        "mxu_fraction_achieved": round(
            results["f32_step"]["achieved_tflops"] / ceiling, 3),
    }

    print(json.dumps({"metric": "f32_roofline", "batch": batch,
                      "results": results}))


if __name__ == "__main__":
    main()
