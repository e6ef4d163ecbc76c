"""Single-request serve latency: cost of ONE 2 s denoise request.

The serve loop's common case is a short request (one chunk). Before the
pow2-bucket fix, StreamingDenoiser._batched padded it to the configured
`batch_chunks` width (128 in the streaming bench config) — a mostly-empty
full-width two-stage dispatch per request. Now it dispatches a width-1
program. This script measures both widths warm (median of N dispatches,
including the tunnel's fixed per-program cost, which is what a serve
client actually waits on) so the fix's effect is recorded.
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

N = int(os.environ.get("N", "20"))


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

    s = StreamingDenoiser(cfg, det_vars, den_vars, batch_chunks=128,
                          profile="int8")
    host = np.random.default_rng(0)
    wav = host.standard_normal(samples).astype(np.float32) * 0.1

    def median_wall(fn):
        fn()  # compile + warm
        walls = []
        for i in range(N):
            t0 = time.perf_counter()
            fn()
            walls.append(time.perf_counter() - t0)
        return float(np.median(walls) * 1e3)

    # New path: denoise() -> _batched pads the lone chunk to width 1.
    new_ms = median_wall(lambda: s.denoise(wav))

    # Old path: the same request padded to the full batch_chunks width
    # (what _batched did before the bucket fix).
    full = np.zeros((s.batch_chunks, s.chunk), dtype=np.float32)
    full[0, : len(wav)] = wav

    def old_request():
        out = np.asarray(s.pipeline(jnp.asarray(full))[0])
        return out[0][: s.valid]

    old_ms = median_wall(old_request)

    print(json.dumps({
        "request_seconds": cfg.data.clip_seconds,
        "batch_chunks_configured": s.batch_chunks,
        "width1_ms": round(new_ms, 1),
        "full_width_ms": round(old_ms, 1),
        "speedup": round(old_ms / new_ms, 2),
        "n": N,
    }), flush=True)


if __name__ == "__main__":
    main()
