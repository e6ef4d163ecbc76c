"""Train the stage-1 silent-interval detector.

Usage:
    python -m sos_tpu.cli.train_detector --dataset_json data/train.json \
        --noise_root data/noise_data_DEMAND/train_noise [--continue --ckpt latest]

Equivalent of model_1 `train.py` (m1 train.py:29-99): 100 epochs, BCE
loss, Adam + StepLR(15), val every 10 steps, best-acc tracking.
"""

import argparse

from sos_tpu.cli.common import (add_common_train_args, config_from_args,
                                experiment_dirs, setup_distributed,
                                shard_batchers_for_host)
from sos_tpu.data import DetectorBatcher, DatasetIndex, NoiseBank, detector_windows
from sos_tpu.data.windows import subsample_windows
from sos_tpu.train.checkpoints import CheckpointManager
from sos_tpu.train.fit import fit
from sos_tpu.train.loop import (
    init_detector_state,
    make_detector_eval_step,
    make_detector_train_step,
)
from sos_tpu.train.state import TrainClock


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_train_args(parser)
    args = parser.parse_args()
    pid, nproc = setup_distributed(args)
    cfg = config_from_args(args, stage="detector")
    _, log_dir, model_dir = experiment_dirs(cfg, "detector")

    train_idx = DatasetIndex.load(args.dataset_json)
    test_idx = DatasetIndex.load(args.test_dataset_json or args.dataset_json)
    noise = NoiseBank.from_roots(args.noise_root, cfg.data.sample_rate)

    train_windows = subsample_windows(
        detector_windows(train_idx.files, cfg.data.clip_frames),
        num=cfg.data.num_train_samples, seed=cfg.data.random_seed)
    base_test = detector_windows(test_idx.files, cfg.data.clip_frames)
    test_windows = subsample_windows(
        base_test, num=max(cfg.train.batch_size, len(base_test) // 10),
        seed=cfg.data.random_seed)

    train_b = DetectorBatcher(train_windows, noise, cfg.data,
                              cfg.train.batch_size, shuffle=True,
                              seed=cfg.train.seed)
    test_b = DetectorBatcher(test_windows, noise, cfg.data,
                             cfg.train.batch_size, shuffle=False,
                             seed=cfg.train.seed + 1)

    train_b, test_b = shard_batchers_for_host(train_b, test_b, cfg=cfg,
                                          pid=pid, nproc=nproc)
    steps_per_epoch = max(1, len(train_b))
    model, state = init_detector_state(cfg, steps_per_epoch)
    clock = TrainClock()
    if args.cont:
        mgr = CheckpointManager(model_dir)
        name = args.ckpt if args.ckpt in ("latest", "best_acc") \
            else f"ckpt_epoch{args.ckpt}"
        state, clock = mgr.load(name, template=state)
        print(f"resumed from {name} at epoch {clock.epoch}")

    train_step = make_detector_train_step(cfg, model, steps_per_epoch)
    eval_step = make_detector_eval_step(cfg, model)
    fit(cfg, state, clock, train_step, eval_step, train_b, test_b,
        model_dir, log_dir, num_devices=args.num_devices, track_accuracy=True)


if __name__ == "__main__":
    main()
