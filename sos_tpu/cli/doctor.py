"""Environment and deployment diagnostics: answers "why doesn't it work here?".

The reference has no equivalent — its failure mode is a stack trace
three layers into librosa/ffmpeg/torch (SURVEY §5: no failure
detection). Production deployments need the checks in docs/OPERATIONS.md
runnable as one command:

    python -m sos_tpu doctor [--output_root model_output --name exp]
                             [--dataset_json ds.json] [--json]

Checks (one `[ ok ]/[warn]/[FAIL]` line each):
  accelerator    JAX backend, device kind/count, tiny compile+run
                 round-trip wall time (detects a wedged TPU tunnel —
                 same failure bench.py's liveness watchdog guards)
  compile-cache  persistent XLA cache dir resolves and is writable
  native-engine  C++ audio engine builds/loads and decodes a probe wav
  media-tools    ffmpeg/ffprobe on PATH (video preprocessing only)
  pesq-backend   conformant pypesq/pesq vs the native fallback
                 (error bound in docs/PARITY.md)
  experiment     (with --name) per-stage checkpoints + int8 calibration
                 file status under --output_root
  dataset        (with --dataset_json) loads and has the FIELDS schema

Exit code 0 when nothing FAILs (warnings allowed), 1 otherwise.
warn = a condition with a built-in fallback (native PESQ, gated media
tools, first-request self-calibration); FAIL = the core pipeline breaks.
"""

import argparse
import json
import os
import sys
import tempfile
import time


def _check_accelerator(results):
    import jax
    import jax.numpy as jnp

    try:
        t0 = time.perf_counter()
        devs = jax.devices()  # triggers backend init (tunnel bring-up)
        init_wall = time.perf_counter() - t0
        t0 = time.perf_counter()
        val = float(jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128))))
        wall = time.perf_counter() - t0
        assert val == 128.0 ** 3, val  # (ones @ ones) is all-128s
    except Exception as exc:  # noqa: BLE001 - diagnostic surface
        results.append(("accelerator", "FAIL", f"jax backend broken: {exc}"))
        return
    kinds = sorted({d.device_kind for d in devs})
    detail = (f"{jax.default_backend()} x{len(devs)} ({', '.join(kinds)}), "
              f"backend init {init_wall:.1f}s, compile+run {wall:.1f}s")
    if jax.default_backend() == "cpu":
        results.append(("accelerator", "warn",
                        detail + " — CPU backend; fine for tests, "
                        "TPU expected in production"))
    elif wall > 60:
        results.append(("accelerator", "warn",
                        detail + " — slow compile/run; remote tunnel "
                        "congested? (bench.py watchdog fails at 900s)"))
    else:
        results.append(("accelerator", "ok", detail))


def _check_compile_cache(results):
    import jax

    from sos_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    cache = jax.config.jax_compilation_cache_dir
    if not cache:
        results.append(("compile-cache", "warn",
                        "no persistent cache dir — every CLI start pays "
                        "full compiles (set SOS_TPU_COMPILE_CACHE)"))
        return
    try:
        with tempfile.NamedTemporaryFile(dir=cache):
            pass
        entries = sum(1 for n in os.listdir(cache)
                      if not n.startswith("."))
        results.append(("compile-cache", "ok",
                        f"{cache} writable, {entries} cached programs"))
    except OSError as exc:
        results.append(("compile-cache", "warn",
                        f"{cache} not writable ({exc}) — compiles won't "
                        "persist across restarts"))


def _check_native_engine(results):
    import numpy as np

    from sos_tpu.runtime import engine

    if not engine.native_available():
        results.append(("native-engine", "warn",
                        "libsosaudio.so unavailable (g++ missing?) — "
                        "wav decode/resample falls back to Python "
                        "(slower host data path, same results)"))
        return
    from sos_tpu.dsp import audio_io

    probe = (np.sin(np.linspace(0, 440 * np.pi, 14000))
             .astype(np.float32) * 0.5)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "probe.wav")
        audio_io.write_wav(path, probe, 14000)
        eng = engine.NativeAudioEngine(num_threads=1)
        decoded, sr = eng.load(path)
    # 16-bit wav round trip: one LSB of quantization, nothing more
    if sr == 14000 and decoded.shape == probe.shape and \
            float(np.abs(decoded - probe).max()) < 2.0 / 32767:
        results.append(("native-engine", "ok",
                        "libsosaudio.so loaded; decode round-trip exact"))
    else:
        results.append(("native-engine", "FAIL",
                        f"decode round-trip wrong (sr={sr}, "
                        f"shape={decoded.shape}) — rebuild: delete "
                        "sos_tpu/runtime/libsosaudio.so"))


def _check_media_tools(results):
    from sos_tpu.data.media import media_tools_available

    if media_tools_available():
        results.append(("media-tools", "ok", "ffmpeg + ffprobe on PATH"))
    else:
        results.append(("media-tools", "warn",
                        "ffmpeg/ffprobe not on PATH — `preprocess` on "
                        "video/non-wav inputs is gated off; wav-only "
                        "pipelines unaffected"))


def _check_pesq_backend(results):
    from sos_tpu.eval.speech import pesq_backend

    backend = pesq_backend()
    if backend == "native":
        results.append(("pesq-backend", "warn",
                        "native P.862 fallback (pypesq/pesq not "
                        "importable) — scores are self-consistent but "
                        "not certified conformant; bound in "
                        "docs/PARITY.md"))
    else:
        results.append(("pesq-backend", "ok", f"conformant `{backend}`"))


def _check_experiment(results, output_root, name):
    from sos_tpu.cli.common import default_calibration_path

    for stage in ("detector", "denoiser"):
        model_dir = os.path.join(output_root, f"{name}_{stage}", "model")
        if not os.path.isdir(model_dir):
            results.append((f"experiment/{stage}", "FAIL",
                            f"{model_dir} missing — train or "
                            "import_checkpoint first"))
            continue
        ckpts = sorted(n for n in os.listdir(model_dir)
                       if os.path.isdir(os.path.join(model_dir, n)))
        if not ckpts:
            results.append((f"experiment/{stage}", "FAIL",
                            f"{model_dir} has no checkpoints"))
            continue
        tag = "ok" if "latest" in ckpts else "warn"
        results.append((f"experiment/{stage}", tag,
                        f"{len(ckpts)} checkpoints"
                        + ("" if "latest" in ckpts else
                           " (no `latest` — `--ckpt latest` will fail)")))
    denoiser_model_dir = os.path.join(output_root, f"{name}_denoiser",
                                      "model")
    cal = default_calibration_path(denoiser_model_dir, "int8")
    if os.path.isfile(cal):
        results.append(("experiment/int8-calibration", "ok", cal))
    else:
        results.append(("experiment/int8-calibration", "warn",
                        f"{cal} absent — int8 serving self-calibrates "
                        "from the first request (numerics then depend "
                        "on traffic order); run `python -m sos_tpu "
                        "calibrate` for the pinned path"))


def _check_dataset(results, dataset_json):
    from sos_tpu.data import DatasetIndex

    try:
        index = DatasetIndex.load(dataset_json)
    except Exception as exc:  # noqa: BLE001 - diagnostic surface
        results.append(("dataset", "FAIL",
                        f"{dataset_json}: {exc}"))
        return
    missing = [f.audio_path for f in index.files
               if not os.path.isfile(f.audio_path)]
    if missing:
        results.append(("dataset", "FAIL",
                        f"{len(missing)}/{len(index.files)} audio paths "
                        f"missing (first: {missing[0]})"))
    else:
        results.append(("dataset", "ok",
                        f"{len(index.files)} files, all audio paths "
                        "resolve"))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output_root", type=str, default=None,
                        help="with --name: check that experiment's "
                             "checkpoints + calibration")
    parser.add_argument("--name", type=str, default=None)
    parser.add_argument("--dataset_json", type=str, default=None,
                        help="also validate this dataset JSON")
    parser.add_argument("--json", action="store_true",
                        help="machine-readable output (one JSON object)")
    args = parser.parse_args()

    results = []
    _check_accelerator(results)
    _check_compile_cache(results)
    _check_native_engine(results)
    _check_media_tools(results)
    _check_pesq_backend(results)
    if args.name:
        _check_experiment(results, args.output_root or "model_output",
                          args.name)
    if args.dataset_json:
        _check_dataset(results, args.dataset_json)

    failed = any(status == "FAIL" for _, status, _ in results)
    if args.json:
        print(json.dumps({
            "ok": not failed,
            "checks": [{"name": n, "status": s, "detail": d}
                       for n, s, d in results]}))
    else:
        marks = {"ok": "[ ok ]", "warn": "[warn]", "FAIL": "[FAIL]"}
        for name, status, detail in results:
            print(f"{marks[status]} {name}: {detail}")
        print("doctor: " + ("FAIL — see lines above" if failed
                            else "all checks passed (warnings are "
                                 "fallback conditions)"))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
