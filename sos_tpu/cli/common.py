"""Shared CLI plumbing: experiment dirs, config construction, checkpoint IO."""

from __future__ import annotations

import argparse
import os
from typing import Tuple

from sos_tpu.config import ExperimentConfig


def experiment_dirs(cfg: ExperimentConfig, stage: str,
                    make: bool = True) -> Tuple[str, str, str]:
    """(exp_dir, log_dir, model_dir) under output_root/{name}_{stage}.

    Mirrors the reference's `../model_output/{experiment}` convention
    (m1 common.py:10-13) without depending on the CWD basename.
    `make=False` is the pure path lookup — for cross-stage references
    (e.g. the detector CLI locating the denoiser's calibration file)
    that must not create empty sibling experiment trees.
    """
    exp_dir = os.path.join(cfg.output_root, f"{cfg.name}_{stage}")
    log_dir = os.path.join(exp_dir, "log")
    model_dir = os.path.join(exp_dir, "model")
    if make:
        os.makedirs(log_dir, exist_ok=True)
        os.makedirs(model_dir, exist_ok=True)
    return exp_dir, log_dir, model_dir


def add_common_train_args(parser: argparse.ArgumentParser,
                          need_dataset: bool = True) -> None:
    parser.add_argument("--continue", dest="cont", action="store_true",
                        help="continue training from checkpoint; a "
                             "mid-epoch checkpoint (see "
                             "--save_step_frequency) resumes exactly at "
                             "the next minibatch of that epoch")
    parser.add_argument("--save_step_frequency", type=int, default=None,
                        help="save a mid-epoch 'latest' checkpoint every "
                             "N steps (0/unset = per-epoch only)")
    parser.add_argument("--ckpt", type=str, default="latest",
                        help="checkpoint to restore ('latest' or epoch number)")
    parser.add_argument("--dataset_json", type=str, required=need_dataset,
                        help="dataset JSON")
    parser.add_argument("--test_dataset_json", type=str, default=None)
    parser.add_argument("--noise_root", type=str, action="append", default=[],
                        help="noise corpus root(s) (DEMAND/AudioSet style)")
    parser.add_argument("--output_root", type=str, default="model_output")
    parser.add_argument("--name", type=str, default="experiment")
    parser.add_argument("--config_json", type=str, default=None,
                        help="ExperimentConfig JSON file (CLI flags override)")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--seed", type=int, default=None,
                        help="training seed (init + batch order); used by "
                             "multi-seed quality certification runs")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="data-parallel device count (default: all)")
    parser.add_argument("--compute_dtype", type=str, default=None,
                        choices=("float32", "bfloat16"),
                        help="training compute dtype. float32 (default) is "
                             "reference-exact; bfloat16 (+--no_remat) "
                             "trains ~2.4x faster and is certified "
                             "quality-equivalent within seed noise by a "
                             "3-seed matched-step experiment (|dSTOI| <= "
                             "0.023 mean, PESQ/SNR neutral — "
                             "docs/EXPERIMENTS.md)")
    parser.add_argument("--no_remat", action="store_true",
                        help="disable per-block rematerialization "
                             "(faster; needs the activations to fit HBM)")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host SPMD: bring up jax.distributed "
                             "(env-driven on TPU pods) and shard data "
                             "per host")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator address host:port (multi-host "
                             "off-pod; implies --distributed)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)


def setup_distributed(args) -> Tuple[int, int]:
    """Optionally bring up multi-host jax.distributed; returns
    (process_index, process_count). Call BEFORE any device use so the
    backend initializes with the global topology. Training CLIs then
    shard their batchers per host and divide the global batch size."""
    if getattr(args, "distributed", False) or getattr(args, "coordinator",
                                                      None):
        from sos_tpu.parallel import distributed

        distributed.initialize(getattr(args, "coordinator", None),
                               getattr(args, "num_processes", None),
                               getattr(args, "process_id", None),
                               require=True)
    import jax

    return jax.process_index(), jax.process_count()


def shard_batchers_for_host(*batchers, cfg, pid: int, nproc: int):
    """Per-host data sharding: disjoint balanced window shards + the
    per-host slice of the global batch size."""
    if nproc <= 1:
        return batchers if len(batchers) > 1 else batchers[0]
    from sos_tpu.parallel.distributed import process_local_batch_size

    local_bs = process_local_batch_size(cfg.train.batch_size)
    for b in batchers:
        b.shard(pid, nproc)
        b.batch_size = local_bs
    return batchers if len(batchers) > 1 else batchers[0]


def default_calibration_path(denoiser_model_dir: str, profile,
                             explicit: str = None):
    """The int8 activation-scale file convention shared by the serving
    CLIs: <denoiser model dir>/int8_calibration.json (None for non-int8
    profiles; an explicit path always wins)."""
    if explicit is not None:
        return explicit
    if profile != "int8":
        return None
    return os.path.join(denoiser_model_dir, "int8_calibration.json")


def enable_compile_cache(path: str = None) -> None:
    """Persist compiled XLA programs across CLI invocations (first
    full-size compile over a remote chip is 30-120 s; cached reloads are
    sub-second). Called by config_from_args so every CLI benefits."""
    import jax

    cache = path or os.environ.get(
        "SOS_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "sos_tpu_xla"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # cache even small/fast-compiling programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def config_from_args(args, stage: str) -> ExperimentConfig:
    enable_compile_cache()
    if getattr(args, "config_json", None):
        import dataclasses

        with open(args.config_json) as fp:
            base = ExperimentConfig.from_json(fp.read())
        base = dataclasses.replace(base, name=args.name,
                                   output_root=args.output_root)
    else:
        base = ExperimentConfig(name=args.name, output_root=args.output_root)
    train_kw = {}
    if getattr(args, "epochs", None) is not None:
        train_kw["nr_epochs"] = args.epochs
    if getattr(args, "batch_size", None) is not None:
        train_kw["batch_size"] = args.batch_size
    elif stage == "denoiser" and not getattr(args, "config_json", None):
        train_kw["batch_size"] = 40  # m2 common.py:52
    if getattr(args, "lr", None) is not None:
        train_kw["lr"] = args.lr
    if getattr(args, "seed", None) is not None:
        train_kw["seed"] = args.seed
    if getattr(args, "save_step_frequency", None) is not None:
        train_kw["save_step_frequency"] = args.save_step_frequency
    if getattr(args, "compute_dtype", None) is not None:
        train_kw["compute_dtype"] = args.compute_dtype
    if getattr(args, "no_remat", False):
        train_kw["remat"] = False
    if train_kw:
        import dataclasses
        base = dataclasses.replace(
            base, train=dataclasses.replace(base.train, **train_kw))
    return base
