"""CLI smoke tests: full command-line flows on tiny configs/fixtures.

Drives the actual argparse mains (monkeypatched argv) through:
preprocess -> train_detector (1 epoch) -> predict_detector -> bridge ->
predict_denoiser -> report, all with a tiny ExperimentConfig JSON.
"""

import dataclasses
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from sos_tpu.config import (
    DataConfig,
    DenoiserModelConfig,
    DetectorModelConfig,
    ExperimentConfig,
    TrainConfig,
)
from sos_tpu.dsp import audio_io


def _tiny_cfg():
    return ExperimentConfig(
        detector=DetectorModelConfig(
            nf=4, outf=2, kernel_sizes=((1, 7), (5, 5)),
            dilations=((1, 1), (2, 2)), lstm_hidden=4, fc_hidden=4),
        denoiser=DenoiserModelConfig(
            nf_mixed=4, nf_noise=2, outf_mixed=2, outf_noise=2,
            kernel_sizes=((1, 7), (5, 5)), dilations=((1, 1), (2, 2)),
            lstm_hidden=4, fc_hidden=8, inpaint_ch=(4, 6, 8)),
        data=DataConfig(num_train_samples=8),
        train=TrainConfig(nr_epochs=1, batch_size=2, val_frequency=2),
    )


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(7)
    sr = 14000
    audio_dir = root / "clips"
    audio_dir.mkdir()
    for i in range(2):
        n = int(4.0 * sr)
        y = np.zeros(n, dtype=np.float32)
        for s in range(0, n, sr):
            y[s:s + sr // 2] = rng.standard_normal(sr // 2) * 0.3
        audio_io.write_wav(str(audio_dir / f"c{i}.wav"), y, sr)
    noise_dir = root / "noise"
    noise_dir.mkdir()
    for i in range(2):
        audio_io.write_wav(str(noise_dir / f"n{i}.wav"),
                           rng.standard_normal(sr * 6).astype(np.float32) * 0.2,
                           sr)
    cfg_path = root / "tiny_config.json"
    cfg_path.write_text(_tiny_cfg().to_json())
    return {"root": root, "audio_dir": str(audio_dir),
            "noise_dir": str(noise_dir), "cfg": str(cfg_path)}


def _run(main_fn, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    main_fn()


def _ensure_trained(cli_env, monkeypatch):
    """Make the tiny trained checkpoints + ds.json exist.

    The slow-tier tests must run standalone (`pytest -m slow`) where
    the not-slow test_cli_full_flow — which normally trains them first
    in full-suite order — is deselected. No-op when the artifacts are
    already there."""
    root = cli_env["root"]
    out_root = str(root / "model_output")
    ds_json = str(root / "ds.json")
    have = all(os.path.isdir(os.path.join(out_root, f"tiny_{s}",
                                          "model", "latest"))
               for s in ("detector", "denoiser"))
    if have and os.path.exists(ds_json):
        return
    from sos_tpu.cli import preprocess, train_denoiser, train_detector

    if not os.path.exists(ds_json):
        _run(preprocess.main,
             ["--audio_dir", cli_env["audio_dir"], "--output_json", ds_json,
              "--label_silence"], monkeypatch)
    common = ["--dataset_json", ds_json, "--noise_root",
              cli_env["noise_dir"], "--output_root", out_root,
              "--config_json", cli_env["cfg"], "--name", "tiny"]
    if not have:
        _run(train_detector.main, common + ["--epochs", "1"], monkeypatch)
        _run(train_denoiser.main, common + ["--epochs", "1"], monkeypatch)


def test_cli_full_flow(cli_env, monkeypatch):
    root = cli_env["root"]
    ds_json = str(root / "ds.json")

    from sos_tpu.cli import (
        bridge, predict_denoiser, predict_detector, preprocess, report,
        train_detector, train_denoiser)

    _run(preprocess.main,
         ["--audio_dir", cli_env["audio_dir"], "--output_json", ds_json,
          "--label_silence"], monkeypatch)
    assert os.path.exists(ds_json)

    out_root = str(root / "model_output")
    common = ["--dataset_json", ds_json, "--noise_root", cli_env["noise_dir"],
              "--output_root", out_root, "--config_json", cli_env["cfg"],
              "--name", "tiny"]
    _run(train_detector.main, common + ["--epochs", "1"], monkeypatch)
    det_model_dir = os.path.join(out_root, "tiny_detector", "model")
    assert os.path.isdir(os.path.join(det_model_dir, "latest"))

    _run(train_denoiser.main, common + ["--epochs", "1"], monkeypatch)
    den_model_dir = os.path.join(out_root, "tiny_denoiser", "model")
    assert os.path.isdir(os.path.join(den_model_dir, "latest"))

    pred_out = str(root / "pred_outputs")
    _run(predict_detector.main, common + ["--ckpt", "latest", "--snr_idx",
         "3", "--outputs", pred_out], monkeypatch)
    eval_json = os.path.join(pred_out, "eval_results_snr0.json")
    assert os.path.exists(eval_json)

    _run(bridge.main, ["--input_json", eval_json, "--snr", "0"], monkeypatch)
    pred_data = os.path.join(pred_out, "pred_data_snr0.json")
    assert os.path.exists(pred_data)

    final_out = str(root / "denoise_outputs")
    _run(predict_denoiser.main,
         ["--pred_data", pred_data, "--ckpt", "latest", "--snr", "0",
          "--output_root", out_root, "--config_json", cli_env["cfg"],
          "--name", "tiny", "--outputs", final_out], monkeypatch)
    final_json = os.path.join(final_out, "eval_results_snr0.json")
    assert os.path.exists(final_json)
    with open(final_json) as fp:
        payload = json.load(fp)
    assert "denoise_statistics" in payload

    _run(report.main, ["--results_dir", final_out], monkeypatch)

    # --output_json into ANOTHER directory: the recovered/ wavs anchor
    # next to the output json (pred_data records paths relative to
    # itself), so stage 2 resolves them from there
    other = root / "elsewhere"
    other.mkdir()
    out_json2 = str(other / "pred_data_moved.json")
    _run(bridge.main, ["--input_json", eval_json, "--snr", "0",
                       "--output_json", out_json2], monkeypatch)
    with open(out_json2) as fp:
        moved = json.load(fp)
    for item in moved["files"]:
        for key in ("mixed_audio", "clean_audio", "full_noise"):
            rel = item[key]
            assert not os.path.isabs(rel)
            assert os.path.exists(os.path.join(str(other), rel)), (key, rel)

    # save_results=False emits a bitstream-only pred_data; stage 2 must
    # refuse it with guidance, not a KeyError
    out_json3 = str(root / "pred_data_nosave.json")
    _run(bridge.main, ["--input_json", eval_json, "--snr", "0",
                       "--output_json", out_json3,
                       "--save_results", "false"], monkeypatch)
    from sos_tpu.infer.evaluate import evaluate_denoiser

    with pytest.raises(ValueError, match="save_results"):
        evaluate_denoiser(
            ExperimentConfig.from_json(open(cli_env["cfg"]).read()),
            None, out_json3, str(root / "nowhere"))


@pytest.mark.slow
def test_cli_one_shot_denoise(cli_env, monkeypatch):
    """The single-command wav->wav tool runs on trained tiny checkpoints."""
    _ensure_trained(cli_env, monkeypatch)
    root = cli_env["root"]
    out_root = str(root / "model_output")
    out_wav = str(root / "denoised.wav")
    from sos_tpu.cli import denoise
    from sos_tpu.dsp import audio_io

    in_wav = os.path.join(cli_env["audio_dir"], "c0.wav")
    _run(denoise.main,
         ["--input", in_wav, "--output", out_wav,
          "--output_root", out_root, "--config_json", cli_env["cfg"],
          "--name", "tiny", "--chunk_seconds", "2.0",
          "--overlap_seconds", "0.5"], monkeypatch)
    assert os.path.exists(out_wav)
    y, sr = audio_io.load(out_wav)
    assert sr == 14000 and len(y) > 0 and np.isfinite(y).all()


@pytest.mark.slow
def test_cli_eval_synthetic(cli_env, monkeypatch, capsys):
    """Batched per-SNR quality evaluation runs on the trained tiny model."""
    _ensure_trained(cli_env, monkeypatch)
    root = cli_env["root"]
    out_root = str(root / "model_output")
    out_json = str(root / "synth_eval.json")
    from sos_tpu.cli import eval_synthetic

    _run(eval_synthetic.main,
         ["--dataset_json", str(root / "ds.json"),
          "--noise_root", cli_env["noise_dir"],
          "--output_root", out_root, "--config_json", cli_env["cfg"],
          "--name", "tiny", "--ckpt", "latest", "--snr_idx", "3",
          "--max_batches", "1", "--out", out_json], monkeypatch)
    with open(out_json) as fp:
        report = json.load(fp)
    assert "snr_0" in report
    agg = report["snr_0"]
    assert agg["num_clips"] >= 1
    assert np.isfinite(agg["avg_stoi"]) or np.isnan(agg["avg_stoi"])
    assert np.isfinite(agg["avg_ssnr_regular"])


def test_cli_import_checkpoint(cli_env, monkeypatch, tmp_path):
    """A torch .pth converts into a usable orbax checkpoint."""
    import torch

    from sos_tpu.cli import import_checkpoint, predict_detector
    from tests.torch_oracles import DetectorOracle
    from tests.test_model_parity import SPECS

    # oracle matching the tiny config's detector architecture
    oracle = DetectorOracle(
        (((1, 7), (1, 1)), ((5, 5), (2, 2))), freq_bins=256, nf=4, outf=2,
        hidden=4, fc_hidden=4)
    pth = str(tmp_path / "ckpt_epoch7.pth")
    torch.save({"model_state_dict": oracle.state_dict()}, pth)

    out_root = str(tmp_path / "imported_output")
    _run(import_checkpoint.main,
         ["--stage", "detector", "--pth", pth, "--name", "imp",
          "--output_root", out_root, "--config_json", cli_env["cfg"]],
         monkeypatch)
    model_dir = os.path.join(out_root, "imp_detector", "model")
    assert os.path.isdir(os.path.join(model_dir, "ckpt_epoch7"))
    assert os.path.isdir(os.path.join(model_dir, "latest"))

    # the imported checkpoint serves predict_detector directly
    from sos_tpu.data.preprocess import build_dataset_json

    ds_json = str(tmp_path / "ds.json")
    build_dataset_json(cli_env["audio_dir"], ds_json)
    pred_out = str(tmp_path / "pred")
    _run(predict_detector.main,
         ["--dataset_json", ds_json, "--noise_root", cli_env["noise_dir"],
          "--output_root", out_root, "--config_json", cli_env["cfg"],
          "--name", "imp", "--ckpt", "7", "--unknown_clean_signal", "true",
          "--outputs", pred_out], monkeypatch)
    assert os.path.exists(os.path.join(pred_out, "eval_results.json"))


@pytest.mark.slow
def test_cli_serve_protocol(cli_env, monkeypatch):
    """Drive the long-lived serve loop over stdin: PING, two denoise
    requests (pipeline stays warm), an error, QUIT."""
    import subprocess

    _ensure_trained(cli_env, monkeypatch)

    root = cli_env["root"]
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "from sos_tpu.cli.serve import main; main()",
         "--output_root", str(root / "model_output"),
         "--name", "tiny", "--config_json", cli_env["cfg"]],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True, env=env,
        cwd=str(root))
    # NB: python -c consumes argv[0]; pass CLI args via sys.argv patching
    out1 = str(root / "served1.wav")
    out2 = str(root / "served2.wav")
    # interactive: STATS/PING answer immediately from the reader thread,
    # so request them at defined points instead of one bulk write
    def say(line):
        proc.stdin.write(line + "\n")
        proc.stdin.flush()

    def hear():
        return proc.stdout.readline().strip()

    try:
        assert hear() == "READY"
        say("PING")
        assert hear() == "PONG"
        say(f"{cli_env['audio_dir']}/c0.wav\t{out1}")
        say(f"{cli_env['audio_dir']}/c1.wav\t{out2}")
        say("/nonexistent.wav\t/tmp/x.wav")
        assert hear().startswith("OK " + out1)
        assert hear().startswith("OK " + out2)
        assert hear().startswith("ERR")
        say("STATS")  # after all responses: counters are settled
        stats = hear()
        assert stats.startswith("STATS ") and "ok=2" in stats \
            and "err=1" in stats and "busy_s=" in stats, stats
        say("QUIT")
        assert hear() == "BYE"
    finally:
        proc.stdin.close()
        proc.wait(timeout=60)
    assert proc.returncode == 0
    assert os.path.exists(out1) and os.path.exists(out2)


def test_train_flag_overrides(cli_env):
    """--compute_dtype/--no_remat/--save_step_frequency flow into
    TrainConfig."""
    import argparse

    from sos_tpu.cli.common import add_common_train_args, config_from_args

    parser = argparse.ArgumentParser()
    add_common_train_args(parser)
    args = parser.parse_args(
        ["--dataset_json", "x.json", "--compute_dtype", "bfloat16",
         "--no_remat", "--save_step_frequency", "7",
         "--config_json", cli_env["cfg"]])
    cfg = config_from_args(args, stage="denoiser")
    assert cfg.train.compute_dtype == "bfloat16"
    assert cfg.train.remat is False
    assert cfg.train.save_step_frequency == 7


def test_serve_loop_overlaps_io_with_compute():
    """The serve pipeline decodes request N+1 and writes result N-1 while
    'the chip' computes request N: wall-clock for k queued requests
    approaches max(stage)*k, not sum(stages)*k (serial)."""
    import time

    from sos_tpu.cli.serve import ServeLoop

    D = 0.05  # per-stage latency (load / denoise / write)
    k = 4
    emitted = []

    def load(path):
        time.sleep(D)
        return np.zeros(1400, np.float32), 14000

    def denoise(wav):
        time.sleep(D)
        return wav

    def write(path, wav, sr):
        time.sleep(D)

    loop = ServeLoop(denoise, load, write, 14000, emit=emitted.append)
    reqs = [f"in{i}.wav\tout{i}.wav" for i in range(k)] + ["QUIT"]
    t0 = time.perf_counter()
    loop.run(iter(reqs))
    wall = time.perf_counter() - t0

    oks = [ln for ln in emitted if ln.startswith("OK ")]
    assert len(oks) == k
    assert [ln.split()[1] for ln in oks] == [f"out{i}.wav" for i in range(k)]
    assert emitted[-1] == "BYE"
    serial = 3 * D * k
    # overlapped: ~(k+2)*D plus scheduling noise; assert well under serial
    assert wall < serial * 0.75, (wall, serial)


def test_serve_loop_async_dispatch_overlaps_fetch():
    """With denoise_many_async, the compute stage only DISPATCHES:
    batch N+1's dispatch happens while the writer is still fetching
    batch N (the chip-keeps-busy-across-batches pipelining), and
    responses still come back in request order."""
    import threading
    import time

    from sos_tpu.cli.serve import ServeLoop

    D = 0.1
    emitted = []
    log, log_lock = [], threading.Lock()

    def dma(wavs):
        with log_lock:
            log.append(("dispatch", time.perf_counter()))

        def fin():
            time.sleep(D)  # the blocking device fetch
            with log_lock:
                log.append(("finalized", time.perf_counter()))
            return list(wavs)

        return fin

    def load(path):
        return np.full(1400, float(path[2]), np.float32), 14000

    loop = ServeLoop(denoise=lambda w: w, load=load,
                     write=lambda *a: None, sample_rate=14000,
                     emit=emitted.append, depth=2,
                     denoise_many_async=dma)
    k = 8
    reqs = [f"in{i}.wav\tout{i}.wav" for i in range(k)] + ["QUIT"]
    loop.run(iter(reqs))

    oks = [ln.split()[1] for ln in emitted if ln.startswith("OK ")]
    assert oks == [f"out{i}.wav" for i in range(k)]
    assert emitted[-1] == "BYE"
    dispatches = [t for kind, t in log if kind == "dispatch"]
    finalized = [t for kind, t in log if kind == "finalized"]
    assert len(dispatches) >= 2
    # the second batch was dispatched before the first batch's fetch
    # completed — i.e. the main loop did not block on the writer
    assert dispatches[1] < finalized[0], (dispatches, finalized)


def test_serve_loop_async_finalize_failure_isolates_requests():
    """A failing pipelined batch falls back to per-request denoise in
    the writer: one poisoned request yields one ERR, the others drained
    with it still succeed, all in arrival order."""
    from sos_tpu.cli.serve import ServeLoop

    emitted = []

    def dma(wavs):
        def fin():
            raise RuntimeError("device fell over")

        return fin

    def denoise(wav):
        if wav[0] > 1.5:  # the poisoned request
            raise ValueError("bad audio")
        return wav

    def load(path):
        return np.full(1400, float(path[2]), np.float32), 14000

    loop = ServeLoop(denoise=denoise, load=load, write=lambda *a: None,
                     sample_rate=14000, emit=emitted.append, depth=4,
                     denoise_many_async=dma)
    reqs = ["in0.wav\tout0.wav", "in2.wav\tout2.wav",
            "in1.wav\tout1.wav", "QUIT"]
    loop.run(iter(reqs))
    lines = [ln for ln in emitted if ln.startswith(("OK ", "ERR "))]
    assert len(lines) == 3
    assert lines[0].startswith("OK out0.wav")
    assert lines[1].startswith("ERR") and "bad audio" in lines[1]
    assert lines[2].startswith("OK out1.wav")
    assert loop.n_ok == 2 and loop.n_err == 1


def test_serve_loop_async_dispatch_failure_falls_back():
    """denoise_many_async raising at DISPATCH time (bad batch) drops to
    the synchronous per-request path — requests still answered."""
    from sos_tpu.cli.serve import ServeLoop

    emitted = []

    def dma(wavs):
        raise RuntimeError("dispatch exploded")

    loop = ServeLoop(denoise=lambda w: w,
                     load=lambda p: (np.zeros(1400, np.float32), 14000),
                     write=lambda *a: None, sample_rate=14000,
                     emit=emitted.append, denoise_many_async=dma)
    loop.run(iter(["a.wav\tout_a.wav", "QUIT"]))
    assert any(ln.startswith("OK out_a.wav") for ln in emitted)
    assert loop.n_ok == 1 and loop.n_err == 0


def test_top_level_dispatcher(capsys):
    """`python -m sos_tpu <cmd>` resolves every CLI from one entry."""
    from sos_tpu.__main__ import COMMANDS, main

    assert main([]) == 2
    assert main(["--help"]) == 0
    out = capsys.readouterr().out
    for name in COMMANDS:
        assert name in out

    assert main(["not_a_command"]) == 2

    # dispatch reaches the target module's argparse
    with pytest.raises(SystemExit) as exc:
        main(["report", "--help"])
    assert exc.value.code == 0
    assert "report" in capsys.readouterr().out


def test_dispatcher_help_imports_no_cli_modules():
    """--help must stay instant: command summaries come from ast-parsed
    docstrings, never from importing the 13 jax/matplotlib-heavy CLI
    modules (isolated subprocess so other tests' imports can't mask a
    regression)."""
    code = (
        "import sys\n"
        "from sos_tpu.__main__ import main\n"
        "assert main(['--help']) == 0\n"
        "loaded = [m for m in sys.modules if m.startswith('sos_tpu.cli')]\n"
        "assert not loaded, loaded\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True,
                   cwd=os.path.dirname(os.path.dirname(__file__)))


def test_report_html_dashboard(tmp_path, monkeypatch, capsys):
    """--html bundles the per-SNR table, training curves and profile
    deltas into one self-contained file (plots embedded base64)."""
    results = tmp_path / "results"
    results.mkdir()
    stats = {k: 1.0 for k in (
        "avg_l1", "avg_stoi", "avg_csig", "avg_cbak", "avg_covl",
        "avg_pesq", "avg_ssnr_regular", "avg_ssnr_shift", "avg_ssnr_clip",
        "avg_ssnr_exsi", "avg_overall_snr")}
    for snr, s in ((0, stats), (10, {k: 2.0 for k in stats})):
        (results / f"eval_results_snr{snr}.json").write_text(
            json.dumps({"denoise_statistics": s}))
    # a predict_detector artifact (prediction stats only, no denoise
    # block) must surface as the stage-1 detection section, not vanish
    det = {"base": 0.6, "accuracy": 0.9, "precision": 0.8,
           "true_pos_rate(recall)": 0.95, "f1": 0.87, "roc_auc": 0.91,
           "mcc": 0.75}
    (results / "eval_results_snr-10.json").write_text(
        json.dumps({"prediction_statistics": {"all": det}}))
    log = tmp_path / "log"
    log.mkdir()
    rows = [
        {"kind": "train", "step": s, "epoch": 0, "loss": 1.0 / (s + 1)}
        for s in range(3)
    ] + [{"kind": "val", "step": 2, "epoch": 0, "loss": 0.5},
         {"kind": "epoch", "step": 2, "epoch": 0, "accuracy": 0.9,
          "ckpt_epoch": 1}]
    (log / "metrics.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows))
    eval_a = tmp_path / "a.json"
    eval_b = tmp_path / "b.json"
    eval_a.write_text(json.dumps({"snr_0": {"avg_stoi": 0.8}}))
    eval_b.write_text(json.dumps({"snr_0": {"avg_stoi": 0.79}}))
    # eval_synthetic --out payload incl. the noisy-input baseline; its
    # snr_5 row merges with the results_dir SNRs in one table
    quality = tmp_path / "quality.json"
    quality.write_text(json.dumps({"snr_5": dict(
        {k: 1.5 for k in stats},
        **{f"noisy_{k}": 0.5 for k in stats})}))

    from sos_tpu.cli import report

    out = tmp_path / "dash.html"
    _run(report.main,
         ["--results_dir", str(results), "--train_log", str(log),
          "--quality", str(quality),
          "--compare", str(eval_a), str(eval_b), "--html", str(out)],
         monkeypatch)
    capsys.readouterr()
    html = out.read_text()
    # detection curves + denoise curves + training curves
    assert html.count("data:image/png;base64,") == 3
    assert "Denoising quality vs input SNR" in html
    assert "Silence detection quality vs input SNR" in html
    assert "roc_auc" in html and "0.9100" in html
    # the quality row merged in, and its baseline companion rendered
    assert "+5" in html and "noisy-input" in html and "0.5000" in html
    assert "best epoch metric" in html and "ckpt_epoch1" in html
    assert "Profile comparison" in html and "-0.0100" in html


@pytest.mark.slow
def test_cli_batch_denoise_dir(cli_env, monkeypatch):
    """--input_dir/--output_dir denoises every wav in one invocation,
    matching the single-file tool's output per file."""
    _ensure_trained(cli_env, monkeypatch)
    root = cli_env["root"]
    out_root = str(root / "model_output")
    batch_out = str(root / "batch_denoised")
    from sos_tpu.cli import denoise
    from sos_tpu.dsp import audio_io

    common = ["--output_root", out_root, "--config_json", cli_env["cfg"],
              "--name", "tiny", "--chunk_seconds", "2.0",
              "--overlap_seconds", "0.5"]
    _run(denoise.main,
         ["--input_dir", cli_env["audio_dir"], "--output_dir", batch_out]
         + common, monkeypatch)
    names = sorted(os.listdir(batch_out))
    assert names == ["c0.wav", "c1.wav"]

    # per-file parity with the single-file path
    single = str(root / "single_c1.wav")
    _run(denoise.main,
         ["--input", os.path.join(cli_env["audio_dir"], "c1.wav"),
          "--output", single] + common, monkeypatch)
    a, _ = audio_io.load(os.path.join(batch_out, "c1.wav"))
    b, _ = audio_io.load(single)
    np.testing.assert_allclose(a, b, atol=1e-6)

    # group splitting (memory bound) never changes outputs: force a
    # flush after every file and require identical bits
    monkeypatch.setattr(denoise, "GROUP_CHUNK_BATCHES", 0)
    split_out = str(root / "batch_denoised_split")
    _run(denoise.main,
         ["--input_dir", cli_env["audio_dir"], "--output_dir", split_out]
         + common, monkeypatch)
    for n in names:
        x, _ = audio_io.load(os.path.join(batch_out, n))
        y, _ = audio_io.load(os.path.join(split_out, n))
        np.testing.assert_array_equal(x, y)

    # arg validation: mixing modes / missing pair fails fast
    with pytest.raises(SystemExit):
        _run(denoise.main, ["--input_dir", cli_env["audio_dir"]] + common,
             monkeypatch)
    with pytest.raises(SystemExit):
        _run(denoise.main, common, monkeypatch)


def test_serve_loop_sigterm_style_shutdown():
    """request_shutdown (the SIGTERM path) == QUIT: already-received
    requests still get responses, BYE is emitted, run() returns — even
    when the signal lands while a request's DECODE is in flight and the
    decode outlasts any fixed drain timeout (the drain must wait on the
    busy reader, not a clock)."""
    import queue as _q
    import threading
    import time

    from sos_tpu.cli.serve import ServeLoop

    emitted = []
    lines_q: "_q.Queue" = _q.Queue()

    def lines():
        while True:
            item = lines_q.get()
            if item is None:
                return
            yield item

    in_load_b = threading.Event()

    def load(path):
        if path == "b.wav":
            in_load_b.set()  # SIGTERM is requested now, mid-decode
            time.sleep(0.7)  # slower than the drain's 0.2 s poll window
        return np.zeros(1400, np.float32), 14000

    loop = ServeLoop(lambda wav: wav, load, lambda *a: None, 14000,
                     emit=emitted.append)
    t = threading.Thread(target=loop.run, args=(lines(),), daemon=True)
    t.start()
    lines_q.put("a.wav\tout_a.wav")
    lines_q.put("b.wav\tout_b.wav")
    assert in_load_b.wait(timeout=10)  # deterministic: b is mid-decode
    loop.request_shutdown()
    t.join(timeout=10)
    assert not t.is_alive()
    oks = [ln.split()[1] for ln in emitted if ln.startswith("OK ")]
    assert oks == ["out_a.wav", "out_b.wav"]
    assert emitted[-1] == "BYE"


def test_serve_shutdown_before_run_exits_immediately():
    """SIGTERM during --warmup (before run()) isn't lost: run() emits
    BYE and returns without serving."""
    from sos_tpu.cli.serve import ServeLoop

    emitted = []
    loop = ServeLoop(lambda w: w, lambda p: (np.zeros(4, np.float32), 14000),
                     lambda *a: None, 14000, emit=emitted.append)
    loop.request_shutdown()  # before run(): only the flag exists

    def never_yields():
        import time
        while True:
            time.sleep(0.05)
            yield  # pragma: no cover

    import threading
    t = threading.Thread(target=loop.run, args=(never_yields(),),
                         daemon=True)
    t.start()
    t.join(timeout=10)
    assert not t.is_alive()
    assert emitted == ["BYE"]


def test_serve_sigterm_answers_line_already_read():
    """A request line the reader has already pulled off the input when
    SIGTERM lands must still be answered (the shutdown check happens
    before reading the next line, never after) — a supervisor redeploy
    must not silently drop a successfully submitted request."""
    import threading

    from sos_tpu.cli.serve import ServeLoop

    emitted = []
    loop = ServeLoop(lambda wav: wav,
                     lambda p: (np.zeros(1400, np.float32), 14000),
                     lambda *a: None, 14000, emit=emitted.append)

    def lines():
        yield "a.wav\tout_a.wav"
        # generator body resumes inside the reader's next(it) — i.e.
        # AFTER this iteration's shutdown check: the SIGTERM lands with
        # line b already on its way to the reader
        loop.request_shutdown()
        yield "b.wav\tout_b.wav"

    t = threading.Thread(target=loop.run, args=(lines(),), daemon=True)
    t.start()
    t.join(timeout=10)
    assert not t.is_alive()
    oks = [ln.split()[1] for ln in emitted if ln.startswith("OK ")]
    assert oks == ["out_a.wav", "out_b.wav"]
    assert emitted[-1] == "BYE"


@pytest.mark.slow
def test_cli_calibrate_offline(cli_env, monkeypatch, tmp_path):
    """`python -m sos_tpu calibrate` derives int8 scales from a corpus
    offline and writes the exact schema the serving pipeline loads, so
    serving numerics no longer depend on which batch arrives first."""
    from sos_tpu.cli import calibrate
    from sos_tpu.infer.fused import FusedDenoisePipeline
    from sos_tpu.train.checkpoints import CheckpointManager
    from sos_tpu.train.loop import init_denoiser_state, init_detector_state
    from sos_tpu.train.state import TrainClock

    cfg = _tiny_cfg()
    out_root = str(tmp_path / "model_output")
    cfg = dataclasses.replace(cfg, output_root=out_root, name="cal")
    for stage, init in (("detector", init_detector_state),
                        ("denoiser", init_denoiser_state)):
        _, state = init(cfg, steps_per_epoch=1)
        CheckpointManager(os.path.join(
            out_root, f"cal_{stage}", "model")).save(
                state, TrainClock(), "latest")
    cfg_path = tmp_path / "cal_config.json"
    cfg_path.write_text(cfg.to_json())

    out = str(tmp_path / "scales.json")
    _run(calibrate.main,
         ["--input_dir", cli_env["audio_dir"], "--out", out,
          "--output_root", out_root, "--config_json", str(cfg_path),
          "--name", "cal", "--batch", "2", "--max_clips", "4",
          "--clip_seconds", "2.0"], monkeypatch)
    with open(out) as fp:
        state = json.load(fp)
    assert set(state) == {"denoiser", "detector"}
    assert state["denoiser"]["enc_x"] and state["detector"]["conv"]

    # the serving pipeline loads these scales verbatim (no self-calibration)
    _, state_det = init_detector_state(cfg, steps_per_epoch=1)
    _, state_den = init_denoiser_state(cfg, steps_per_epoch=1)
    pipe = FusedDenoisePipeline(
        cfg, state_det.variables(), state_den.variables(),
        profile="int8", calibration_path=out)
    assert pipe.ensure_calibrated()
    got = pipe._quant.calibration_state()
    assert got == state["denoiser"]


def test_cli_doctor(tmp_path, monkeypatch, capsys):
    """doctor: ok/warn-only environment is exit 0 with machine-readable
    --json; pointing it at a missing experiment FAILs with exit 1 and
    the calibration check stays a warn (self-calibration fallback)."""
    from sos_tpu.cli.doctor import main as doctor_main

    monkeypatch.setattr(sys, "argv", ["prog", "--json"])
    with pytest.raises(SystemExit) as exc:
        doctor_main()
    assert exc.value.code == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["ok"]
    checks = {c["name"]: c["status"] for c in rep["checks"]}
    # every environment check ran; on the test CPU backend none may FAIL
    for name in ("accelerator", "compile-cache", "native-engine",
                 "media-tools", "pesq-backend"):
        assert checks[name] in ("ok", "warn"), (name, checks)

    monkeypatch.setattr(sys, "argv", [
        "prog", "--json", "--output_root", str(tmp_path), "--name",
        "ghost"])
    with pytest.raises(SystemExit) as exc:
        doctor_main()
    assert exc.value.code == 1
    rep = json.loads(capsys.readouterr().out)
    assert not rep["ok"]
    checks = {c["name"]: c["status"] for c in rep["checks"]}
    assert checks["experiment/detector"] == "FAIL"
    assert checks["experiment/denoiser"] == "FAIL"
    assert checks["experiment/int8-calibration"] == "warn"


def test_cli_train_joint_writes_metrics_log(cli_env, monkeypatch):
    """train_joint trains both stages in one step AND (r5) leaves the
    same durable metrics.jsonl observability trail fit() does, under
    the detector stage's log dir."""
    import json as _json

    _ensure_trained(cli_env, monkeypatch)
    from sos_tpu.cli import train_joint

    root = cli_env["root"]
    out_root = str(root / "model_output")
    _run(train_joint.main,
         ["--dataset_json", str(root / "ds.json"), "--noise_root",
          cli_env["noise_dir"], "--output_root", out_root,
          "--config_json", cli_env["cfg"], "--name", "tinyj",
          "--epochs", "1"], monkeypatch)

    for stage in ("detector", "denoiser"):
        assert os.path.isdir(os.path.join(
            out_root, f"tinyj_{stage}", "model", "latest")), stage

    log = os.path.join(out_root, "tinyj_detector", "log", "metrics.jsonl")
    rows = [_json.loads(l) for l in open(log)]
    train_rows = [r for r in rows if r["kind"] == "train"]
    assert train_rows, rows
    for r in train_rows:
        assert {"detector_loss", "denoiser_loss",
                "steps_per_sec"} <= set(r)
        assert np.isfinite(r["detector_loss"])
        assert np.isfinite(r["denoiser_loss"])
    assert any(r["kind"] == "epoch" for r in rows)
