"""Headline benchmark: end-to-end denoise inference throughput on one chip.

The HEADLINE is the production two-stage program — ONE fused XLA program
per batch of 2 s / 14 kHz clips:

  waveform -> packed STFT -> int8 SilenceDetector -> threshold ->
  bits -> sample mask (matmul despeckle) -> gated STFT ->
  int8 JointDenoiser -> cRM inverse -> iSTFT -> waveform

i.e. BASELINE.json's north star ("inference fuses STFT, detection, mask
prediction, and iSTFT into one XLA program"), reported as audio-seconds
of denoised speech per wall-clock second per chip.

Profiles measured alongside (denoiser-only, mask given — the bound the
two-stage program approaches as the detector tax shrinks):
  f32   — reference-exact numerics (NHWC fused pipeline);
  bf16  — bf16 conv trunks, f32 LSTM/mask head (drift bounded by
          tests/test_reference_parity.py: mask max drift < 0.05);
  int8  — int8 conv trunks (per-channel weights, calibrated static
          activation scales) + the packed (re,im) spectrum layout that
          removes every 2-wide-trailing-dim tensor (drift bounded by
          tests/test_quant.py: mask drift ~1e-4 scale).

Two-stage tax anatomy (measured r3, batch 128, ms/iter): denoiser-only
231; +detector int8 trunk ~35 (the XLA int8 conv emitter pads 48
channels to 128 lanes per tap = 2.67x padded work at ~full MXU rate);
+resize/BiLSTM/FC head ~10; +bits->mask->gated-STFT serialization ~14.
The despeckle run-filter is two MXU matmuls (dsp/mixing.py
_despeckle_gap_matrix) — the generic segment-sum form cost ~50 ms here.
The detector trunk at nf=64 (fast_detector_config) measured SLOWER than
nf=48 under int8 (padding waste is paid either way; wider adds real
FLOPs), so the two-stage profile keeps the reference width.

Baseline: the driver's north-star target of 500x real-time per chip
(BASELINE.json); `vs_baseline` = value / 500.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _measure(bench_fn, args, audio_sec: float, iters: int,
             repeats: int = 3) -> dict:
    """Median of `repeats` timed executions (each a scan over `iters`
    distinct inputs) plus the min/max spread. Single-shot timing over
    the remote-TPU tunnel is +-7% noisy (r3's int8 profile read 1034.9
    against 1105.88 measured the same day); the median with a published
    spread makes a tunnel artifact visible instead of masquerading as a
    regression."""
    float(bench_fn(*args))  # compile + warm
    rates = []
    for _ in range(repeats):
        start = time.perf_counter()
        checksum = float(bench_fn(*args))
        elapsed = time.perf_counter() - start
        assert np.isfinite(checksum)
        rates.append(audio_sec * iters / elapsed)
    return {"median": round(float(np.median(rates)), 2),
            "spread": [round(min(rates), 2), round(max(rates), 2)]}


def main() -> None:
    import logging
    import os

    # the concat-scale-skew warning is meant for real checkpoints; the
    # bench's random weights always trigger it — keep the output clean
    logging.getLogger("sos_tpu.models.quant").setLevel(logging.ERROR)
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)

    # Backend-liveness watchdog: the remote-TPU tunnel occasionally
    # wedges so hard that the first device roundtrip never returns
    # (backend registration still succeeds instantly, so probing
    # jax.devices() alone is not enough — measured) — without a bound,
    # the whole bench (and whoever invoked it) hangs forever. A SIGALRM
    # handler does NOT work here: the main thread never returns to
    # Python bytecode while stuck in the runtime call, so the handler
    # is queued forever (measured). A watchdog THREAD + os._exit does
    # (the stuck call releases the GIL). Only the trivial probe
    # dispatch is bounded; the real compiles (minutes-long on first
    # run) are not.
    import threading

    probe_ok = threading.Event()
    # 900 s default: long enough that a tunnel recovering mid-run still
    # yields a real measurement (observed wedges clear in 10-20 min),
    # short enough to fail the run instead of hanging it forever. A
    # malformed or non-positive override must not break the one-JSON-
    # line contract (or fail a healthy run instantly) — fall back.
    try:
        probe_budget = float(os.environ.get("SOS_BENCH_PROBE_TIMEOUT", "900"))
    except ValueError:
        probe_budget = 900.0
    if not probe_budget > 0:
        probe_budget = 900.0

    def _watchdog():
        if probe_ok.wait(timeout=probe_budget):
            return
        print(json.dumps({
            "metric": "two_stage_denoise_throughput", "value": 0.0,
            "unit": "audio_sec_per_sec_per_chip", "vs_baseline": 0.0,
            "error": f"device probe timed out after {probe_budget:.0f}s "
                     "(TPU tunnel wedged); re-run when the backend "
                     "recovers",
            # NOT this run's numbers: the committed artifact
            # experiments/bench_r5_snapshot.json (2026-08-20, v5e via
            # tunnel) — the last healthy run of this exact script,
            # quoted verbatim so the fallback payload is traceable.
            # Same {"profiles": {name: {median, spread}}} shape as the
            # healthy path so consumers parse ONE schema.
            "last_recorded": {
                "source": "experiments/bench_r5_snapshot.json",
                "vs_baseline": 2.0181,
                "profiles": {
                    "two_stage": {"median": 1009.03,
                                  "spread": [1007.64, 1009.29]},
                    "int8": {"median": 1142.76,
                             "spread": [1136.46, 1144.61]},
                    "bf16": {"median": 599.48,
                             "spread": [592.12, 599.54]},
                    "f32": {"median": 445.16,
                            "spread": [445.07, 445.37]},
                    "two_stage_bf16": {"median": 542.51,
                                       "spread": [539.95, 542.98]},
                    "two_stage_f32": {"median": 390.25,
                                      "spread": [389.4, 390.5]},
                },
            },
        }), flush=True)
        os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()
    import jax

    # one full host->device->host roundtrip under the watchdog; the
    # float() fetch is the only reliable completion barrier here
    float(jax.numpy.ones((8, 8)).sum())
    probe_ok.set()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from sos_tpu.config import ExperimentConfig, fast_denoiser_config
    from sos_tpu.dsp.crm import apply_compressed_crm, crm_sigmoid_recover
    from sos_tpu.dsp.mixing import bitstream_to_sample_mask
    from sos_tpu.dsp.stft import istft, istft_packed, stft, stft_packed
    from sos_tpu.models import JointDenoiser, SilenceDetector
    from sos_tpu.models.quant import QuantizedDenoiser, QuantizedDetector

    cfg = ExperimentConfig(denoiser=fast_denoiser_config())
    samples = cfg.data.clip_seconds * cfg.data.sample_rate
    num_frames = int(cfg.data.clip_seconds * cfg.data.frame_rate)
    ratio = cfg.data.sample_rate / cfg.data.frame_rate
    t = 1 + samples // cfg.stft.hop_length
    batch = 128
    iters = 4

    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, cfg.denoiser.freq_bins, t, 2))
    # NB: eager init is pathologically slow over the remote TPU tunnel
    # (one RPC per param); jit makes it one program.
    init_model = JointDenoiser(cfg.denoiser)
    variables = jax.jit(
        lambda k: init_model.init(k, dummy, dummy, train=False))(rng)
    det_model = SilenceDetector(cfg.detector)
    det_vars = jax.jit(
        lambda k: det_model.init(k, dummy, num_frames=num_frames,
                                 train=False))(rng)

    k1, k2 = jax.random.split(rng)
    base = jax.random.normal(k1, (batch, samples), jnp.float32) * 0.1
    stack = jnp.stack([base + 1e-4 * i for i in range(iters)])
    mask = (jax.random.uniform(k2, (batch, samples)) > 0.5).astype(jnp.float32)
    audio_sec = batch * (samples / cfg.data.sample_rate)

    # Timing methodology: the remote-TPU runtime's block_until_ready does
    # not reliably wait for execution — only a host data fetch does. So
    # all iterations run inside ONE program (lax.scan over distinct
    # inputs) and the fetched scalar checksum forces completion.
    def scan_bench(step):
        @jax.jit
        def bench_fn(stack, mask):
            def body(carry, m):
                out = step(m, mask)
                return carry + out[:, ::997].sum(), None

            total, _ = jax.lax.scan(body, jnp.float32(0), stack)
            return total

        return bench_fn

    profiles = {}

    # --- float profiles (NHWC fused pipeline) ---------------------------
    for name, dtype in (("f32", "float32"), ("bf16", "bfloat16")):
        model = JointDenoiser(cfg.denoiser, compute_dtype=dtype)

        def step(mixed, mask, model=model):
            mixed_stft = stft(mixed)
            gated_stft = stft(mixed * mask)
            _, crm = model.apply(variables, mixed_stft, gated_stft,
                                 train=False)
            return istft(apply_compressed_crm(mixed_stft, crm))

        profiles[name] = _measure(scan_bench(step), (stack, mask),
                                  audio_sec, iters)

    # --- int8 packed profile --------------------------------------------
    quant = QuantizedDenoiser(cfg.denoiser, variables, inpaint_dtype="int8")
    quant.calibrate([(jnp.asarray(np.asarray(stft(base[:8]))),
                      jnp.asarray(np.asarray(stft(base[:8] * mask[:8]))))])

    def step_int8(mixed, mask):
        mr, mi = stft_packed(mixed)
        gr, gi = stft_packed(mixed * mask)
        cr, ci = quant.crm_packed(mr, mi, gr, gi)
        rr, ri = crm_sigmoid_recover(cr), crm_sigmoid_recover(ci)
        return istft_packed(rr * mr - ri * mi, rr * mi + ri * mr)

    profiles["int8"] = _measure(scan_bench(step_int8), (stack, mask),
                              audio_sec, iters)

    # --- two-stage fused headline (the production program) --------------
    # Batch 256: the two-stage sweet spot (r3 sweep: 883 @128, 976 @256,
    # 978 @512 audio-s/s — the detector's fixed costs amortize; beyond
    # 256 it is flat). The denoiser-only profiles above stay at 128
    # (their own measured sweet spot; 256 would double their HBM here).
    quant_det = QuantizedDetector(cfg.detector, det_vars)
    quant_det.calibrate([stft(base[:8])])

    batch2 = 256
    base2 = jax.random.normal(k1, (batch2, samples), jnp.float32) * 0.1
    stack2 = jnp.stack([base2 + 1e-4 * i for i in range(iters)])
    audio_sec2 = batch2 * (samples / cfg.data.sample_rate)

    def step_two_stage(mixed, _unused):
        mr, mi = stft_packed(mixed)
        logits = quant_det.logits_packed(mr, mi, num_frames)
        bits = (jax.nn.sigmoid(logits) >= 0.5).astype(jnp.float32)
        smask = bitstream_to_sample_mask(bits, ratio, samples,
                                         cfg.data.despeckle_min_run)
        gr, gi = stft_packed(mixed * smask)
        cr, ci = quant.crm_packed(mr, mi, gr, gi)
        rr, ri = crm_sigmoid_recover(cr), crm_sigmoid_recover(ci)
        return istft_packed(rr * mr - ri * mi, rr * mi + ri * mr)

    profiles["two_stage"] = _measure(scan_bench(step_two_stage),
                                     (stack2, mask[:1]), audio_sec2, iters)

    # --- float two-stage profiles (VERDICT r4 #2a) -----------------------
    # The SAME production program at float precision, at the float sweet
    # spot batch 128 (experiments/float_two_stage_results.json: f32
    # craters to 218 @256 and bf16 loses 15% — the float activations'
    # HBM working set at 256 outweighs the detector amortization that
    # makes 256 win for int8). two_stage_bf16 carries the bf16 LSTM
    # input projection — the serving default for the bf16 profile
    # (infer/fused.py) — and clears the 500x north star without int8
    # (544.5 measured r5); two_stage_f32 is reference-exact end to end
    # (speed-of-light per experiments/f32_roofline_results.json).
    for name, dtype, bf16h in (("two_stage_f32", "float32", False),
                               ("two_stage_bf16", "bfloat16", True)):
        det_f = SilenceDetector(cfg.detector, compute_dtype=dtype,
                                bf16_head_proj=bf16h)
        den_f = JointDenoiser(cfg.denoiser, compute_dtype=dtype,
                              bf16_head_proj=bf16h)

        def step_float2s(mixed, _unused, det_f=det_f, den_f=den_f):
            mixed_stft = stft(mixed)
            logits = det_f.apply(det_vars, mixed_stft,
                                 num_frames=num_frames, train=False)
            bits = (jax.nn.sigmoid(logits) >= 0.5).astype(jnp.float32)
            smask = bitstream_to_sample_mask(bits, ratio, samples,
                                             cfg.data.despeckle_min_run)
            gated_stft = stft(mixed * smask)
            _, crm = den_f.apply(variables, mixed_stft, gated_stft,
                                 train=False)
            return istft(apply_compressed_crm(mixed_stft, crm))

        profiles[name] = _measure(scan_bench(step_float2s),
                                  (stack, mask[:1]), audio_sec, iters)

    headline = profiles["two_stage"]["median"]
    print(json.dumps({
        "metric": "two_stage_denoise_throughput",
        "value": headline,
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(headline / 500.0, 4),
        "profiles": profiles,
    }))


if __name__ == "__main__":
    main()
