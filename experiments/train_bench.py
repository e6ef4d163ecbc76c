"""Training-throughput bench (VERDICT r4 #6): regression-guard the
train step the way bench.py guards inference.

Measures the FULL-SIZE production denoiser train step (device-side
mix->STFT->model->dual-MSE loss->grad->update, train/loop.py
make_denoiser_train_step — the hot loop the reference runs in
m1 train.py:59-95 / m2 agent.py) in the two supported regimes:

  f32_remat_b10  — the reference-exact default (f32, per-block remat);
  bf16_b30       — the fast certified profile (bf16 trunks, no remat,
                   the 16G-HBM sweet spot from docs/ARCHITECTURE.md).

Prints ONE JSON line; the committed snapshot
(experiments/train_bench_snapshot.json) is contract-tested so the
recorded numbers can't drift from their provenance
(tests/test_bench_contract.py).

Methodology mirrors bench.py: all timed steps run inside ONE jitted
scan (the remote-TPU runtime only reliably synchronizes on a host data
fetch), median of 3 repeats with min/max spread.
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


def main():
    import dataclasses

    from sos_tpu.config import ExperimentConfig, TrainConfig
    from sos_tpu.train.loop import init_denoiser_state, make_denoiser_train_step

    results = {}
    for name, dtype, remat, batch in (("f32_remat_b10", "float32", True, 10),
                                      ("bf16_b30", "bfloat16", False, 30)):
        cfg = ExperimentConfig(
            train=TrainConfig(batch_size=batch, compute_dtype=dtype,
                              remat=remat))
        model, state = init_denoiser_state(cfg, steps_per_epoch=100)
        train_step = make_denoiser_train_step(cfg, model,
                                              steps_per_epoch=100)
        samples = cfg.data.clip_seconds * cfg.data.sample_rate
        rng = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(rng, 3)
        batch_data = {
            "clean": jax.random.normal(k1, (ITERS, batch, samples),
                                       jnp.float32) * 0.1,
            "noise": jax.random.normal(k2, (ITERS, batch, samples),
                                       jnp.float32) * 0.1,
            "snr": jnp.zeros((ITERS, batch), jnp.float32),
            "bits": (jax.random.uniform(
                k3, (ITERS, batch, cfg.data.clip_frames)) > 0.5
            ).astype(jnp.float32),
        }

        @jax.jit
        def bench_fn(state, data):
            def body(st, one):
                st, metrics = train_step(st, one)
                return st, metrics["loss"]

            st, losses = jax.lax.scan(body, state, data)
            return losses.sum()

        float(bench_fn(state, batch_data))  # compile + warm
        rates = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            chk = float(bench_fn(state, batch_data))
            dt = time.perf_counter() - t0
            assert np.isfinite(chk)
            rates.append(1e3 * dt / ITERS)  # ms/step
        audio_s = batch * cfg.data.clip_seconds
        results[name] = {
            "ms_per_step": round(float(np.median(rates)), 1),
            "spread": [round(min(rates), 1), round(max(rates), 1)],
            "batch": batch,
            "audio_s_per_s": round(
                1e3 * audio_s / float(np.median(rates)), 1),
        }
        print(name, results[name], flush=True)

    print(json.dumps({"metric": "denoiser_train_step",
                      "unit": "ms_per_step", "regimes": results}),
          flush=True)


if __name__ == "__main__":
    main()
