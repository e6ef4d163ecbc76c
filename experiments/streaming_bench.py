"""Long-form streaming throughput (BASELINE config[4]): 60 s utterances
through StreamingDenoiser, one-pass vs boundary-consistent two-pass,
int8 profile, random full-size weights. MANY=1 measures
`denoise_many` (cross-utterance chunk batching) instead of per-utterance
`denoise`.

Unlike the fused bench (scan-in-one-program), streaming is a host-driven
chunk pipeline: the measurement includes the real host costs (chunk
slicing, overlap-add, tunnel dispatch + fetch per batch) — that is the
point of recording it separately.
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
from sos_tpu.infer.streaming import StreamingDenoiser
from sos_tpu.models import JointDenoiser, SilenceDetector

UTTS = int(os.environ.get("UTTS", "8"))
SECONDS = float(os.environ.get("SECONDS", "60"))
BATCH_CHUNKS = int(os.environ.get("BATCH_CHUNKS", "128"))
MANY = bool(os.environ.get("MANY"))
# WIRE=int16 ships chunks/outputs as int16 (half the transfer bytes —
# the dominant cost over a tunnel, see ROADMAP streaming decomposition)
WIRE = os.environ.get("WIRE", "float32")
# DEPTH: _batched_async in-flight window (default 2 = the r5 pipelined
# path). DEPTH=0 restores the pre-r5 strictly serial
# dispatch -> fetch per bucket, the A/B baseline.
DEPTH = int(os.environ.get("DEPTH", "2"))


def main():
    cfg = ExperimentConfig(denoiser=fast_denoiser_config())
    sr = cfg.data.sample_rate
    samples = cfg.data.clip_seconds * sr
    t = 1 + samples // cfg.stft.hop_length
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, cfg.denoiser.freq_bins, t, 2))
    den_vars = jax.jit(lambda k: JointDenoiser(cfg.denoiser).init(
        k, dummy, dummy, train=False))(rng)
    det_vars = jax.jit(lambda k: SilenceDetector(cfg.detector).init(
        k, dummy, num_frames=60, train=False))(rng)

    host = np.random.default_rng(0)
    utts = [host.standard_normal(int(SECONDS * sr)).astype(np.float32) * 0.1
            for _ in range(UTTS)]
    audio_sec = UTTS * SECONDS

    results = {"mode": "denoise_many" if MANY else "denoise",
               "utts": UTTS, "seconds": SECONDS,
               "batch_chunks": BATCH_CHUNKS, "wire": WIRE,
               "pipeline_depth": DEPTH}
    for mode, consistent in (("one_pass", False), ("two_pass", True)):
        s = StreamingDenoiser(cfg, det_vars, den_vars,
                              batch_chunks=BATCH_CHUNKS, profile="int8",
                              consistent_boundaries=consistent,
                              transfer_dtype=WIRE,
                              pipeline_depth=max(DEPTH, 1))
        if DEPTH == 0:  # serial baseline: fetch right after each dispatch
            s.pipeline_depth = 0
        if MANY:
            run = s.denoise_many
        else:
            def run(us, s=s):
                return [s.denoise(u) for u in us]
        t0 = time.perf_counter()
        outs = run(utts[:1])  # compile + calibrate + warm
        print(f"{mode}: warm {time.perf_counter()-t0:.1f}s", flush=True)
        assert all(np.isfinite(o).all() for o in outs)
        t0 = time.perf_counter()
        outs = run(utts)
        wall = time.perf_counter() - t0
        assert all(np.isfinite(o).all() for o in outs)
        results[mode] = {"audio_s_per_s": round(audio_sec / wall, 1),
                         "wall_s": round(wall, 2)}
        print(f"{mode}: {results[mode]}", flush=True)

    # two-pass detection overhead = (two_pass wall - one_pass wall)
    results["two_pass_overhead_pct"] = round(
        100.0 * (results["two_pass"]["wall_s"] / results["one_pass"]["wall_s"]
                 - 1.0), 1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
