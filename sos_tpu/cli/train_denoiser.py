"""Train the stage-2 joint denoiser.

Usage:
    python -m sos_tpu.cli.train_denoiser --dataset_json data/train.json \
        --noise_root data/noise_data_DEMAND/train_noise [--continue --ckpt latest]

Equivalent of model_2 `train.py` (m2 train.py:27-92): dual MSE loss
(inpainted noise vs full noise + cRM-reconstructed vs clean), batch 40,
Adam + StepLR(15).
"""

import argparse

from sos_tpu.cli.common import (add_common_train_args, config_from_args,
                                experiment_dirs, setup_distributed,
                                shard_batchers_for_host)
from sos_tpu.data import DenoiserBatcher, DatasetIndex, NoiseBank, denoiser_windows
from sos_tpu.data.windows import subsample_windows
from sos_tpu.train.checkpoints import CheckpointManager
from sos_tpu.train.fit import fit
from sos_tpu.train.loop import (
    init_denoiser_state,
    make_denoiser_eval_step,
    make_denoiser_train_step,
)
from sos_tpu.train.state import TrainClock


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_train_args(parser)
    args = parser.parse_args()
    pid, nproc = setup_distributed(args)
    cfg = config_from_args(args, stage="denoiser")
    _, log_dir, model_dir = experiment_dirs(cfg, "denoiser")

    train_idx = DatasetIndex.load(args.dataset_json)
    test_idx = DatasetIndex.load(args.test_dataset_json or args.dataset_json)
    noise = NoiseBank.from_roots(args.noise_root, cfg.data.sample_rate)

    train_windows = denoiser_windows(
        train_idx.files, cfg.data.clip_seconds, cfg.data.overlap_seconds)
    test_windows = subsample_windows(
        denoiser_windows(test_idx.files, cfg.data.clip_seconds,
                         cfg.data.overlap_seconds),
        fraction=0.1, seed=cfg.data.random_seed)

    train_b = DenoiserBatcher(train_windows, noise, cfg.data,
                              cfg.train.batch_size, shuffle=True,
                              seed=cfg.train.seed)
    test_b = DenoiserBatcher(test_windows, noise, cfg.data,
                             cfg.train.batch_size, shuffle=False,
                             seed=cfg.train.seed + 1)

    train_b, test_b = shard_batchers_for_host(train_b, test_b, cfg=cfg,
                                          pid=pid, nproc=nproc)
    steps_per_epoch = max(1, len(train_b))
    model, state = init_denoiser_state(cfg, steps_per_epoch)
    clock = TrainClock()
    if args.cont:
        mgr = CheckpointManager(model_dir)
        name = args.ckpt if args.ckpt in ("latest", "best_acc") \
            else f"ckpt_epoch{args.ckpt}"
        state, clock = mgr.load(name, template=state)
        print(f"resumed from {name} at epoch {clock.epoch}")

    train_step = make_denoiser_train_step(cfg, model, steps_per_epoch)
    eval_step = make_denoiser_eval_step(cfg, model)
    fit(cfg, state, clock, train_step, eval_step, train_b, test_b,
        model_dir, log_dir, num_devices=args.num_devices)


if __name__ == "__main__":
    main()
