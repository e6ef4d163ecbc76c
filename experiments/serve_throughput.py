"""Serve-loop burst throughput: N short WAV requests through the FULL
serving stack (file decode -> cross-request chunk batching on device ->
file write), int8 profile, full-size models.

Complements experiments/serve_latency.py (one warm request: 62 ms) and
experiments/streaming_bench.py (long-form utterances): this is the
many-concurrent-short-requests regime the reference pays a process
start + retrace + checkpoint load for per request (README.md:65-99).
"""
import json
import os
import tempfile
import time

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from sos_tpu.cli.serve import ServeLoop
from sos_tpu.config import ExperimentConfig, fast_denoiser_config
from sos_tpu.dsp import audio_io
from sos_tpu.infer.streaming import StreamingDenoiser
from sos_tpu.models import JointDenoiser, SilenceDetector

N_REQ = int(os.environ.get("N_REQ", "64"))
SECONDS = float(os.environ.get("SECONDS", "2"))
BATCH_CHUNKS = int(os.environ.get("BATCH_CHUNKS", "64"))
WIRE = os.environ.get("WIRE", "float32")  # int16: half the wire bytes
# ASYNC=0: disable the r5 pipelined dispatch->writer-fetch path (the
# synchronous compute stage) for a same-session A/B
ASYNC = os.environ.get("ASYNC", "1") != "0"


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
    s = StreamingDenoiser(cfg, det_vars, den_vars,
                          batch_chunks=BATCH_CHUNKS, profile="int8",
                          transfer_dtype=WIRE)

    host = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="serve_tp_")
    lines = []
    for i in range(N_REQ):
        src = os.path.join(tmp, f"in{i}.wav")
        audio_io.write_wav(
            src, host.standard_normal(int(SECONDS * sr)).astype(
                np.float32) * 0.1, sr)
        lines.append(f"{src}\t{os.path.join(tmp, f'out{i}.wav')}")

    emitted = []
    loop = ServeLoop(s.denoise, audio_io.read_wav, audio_io.write_wav,
                     sr, emit=emitted.append, denoise_many=s.denoise_many,
                     denoise_many_async=s.denoise_many_async if ASYNC
                     else None)

    # Warm pass: the greedy drain batches up to `depth` requests, so the
    # burst exercises bucket widths 1/2/4 — run the whole burst once so
    # every width's program is compiled before the measured pass
    # (first-compile through the tunnel is tens of seconds and would
    # otherwise dominate the wall).
    t0 = time.perf_counter()
    loop.run(iter(lines + ["QUIT"]))
    cold_wall = time.perf_counter() - t0
    emitted.clear()
    t0 = time.perf_counter()
    loop.run(iter(lines + ["QUIT"]))
    wall = time.perf_counter() - t0

    ok = sum(1 for l in emitted if l.startswith("OK"))
    audio_sec = N_REQ * SECONDS
    print(json.dumps({
        "requests": N_REQ, "request_seconds": SECONDS,
        "batch_chunks": BATCH_CHUNKS, "wire": WIRE, "ok": ok,
        "pipelined": ASYNC,
        "wall_s": round(wall, 2),
        "cold_wall_s": round(cold_wall, 2),
        "requests_per_s": round(N_REQ / wall, 1),
        "audio_s_per_s": round(audio_sec / wall, 1),
        "note": "full stack: wav decode + batched device denoise + wav "
                "write; per-request serial latency is 62 ms "
                "(serve_latency.py)",
    }), flush=True)


if __name__ == "__main__":
    main()
