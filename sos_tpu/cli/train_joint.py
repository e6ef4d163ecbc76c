"""Joint end-to-end training of both stages in one SPMD step.

Usage:
    python -m sos_tpu.cli.train_joint --dataset_json data/train.json \
        --noise_root data/noise_data_DEMAND/train_noise

BASELINE config[3] capability: one data pipeline and one jitted step
train the detector (BCE) and the denoiser (dual MSE) together; both
checkpoints land in their stage directories, loadable by the regular
predict CLIs.
"""

import argparse

import jax

from sos_tpu.cli.common import (add_common_train_args, config_from_args,
                                experiment_dirs, setup_distributed)
from sos_tpu.data import DenoiserBatcher, DatasetIndex, NoiseBank, denoiser_windows
from sos_tpu.parallel import make_mesh, replicated, shard_batch
from sos_tpu.train.checkpoints import CheckpointManager
from sos_tpu.train.joint import init_joint_states, make_joint_train_step
from sos_tpu.train.state import TrainClock


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_train_args(parser)
    args = parser.parse_args()
    pid, nproc = setup_distributed(args)
    cfg = config_from_args(args, stage="joint")
    _, det_log_dir, det_model_dir = experiment_dirs(cfg, "detector")
    _, _, den_model_dir = experiment_dirs(cfg, "denoiser")

    train_idx = DatasetIndex.load(args.dataset_json)
    noise = NoiseBank.from_roots(args.noise_root, cfg.data.sample_rate)
    windows = denoiser_windows(train_idx.files, cfg.data.clip_seconds,
                               cfg.data.overlap_seconds)
    batcher = DenoiserBatcher(windows, noise, cfg.data, cfg.train.batch_size,
                              shuffle=True, seed=cfg.train.seed)
    from sos_tpu.cli.common import shard_batchers_for_host

    batcher = shard_batchers_for_host(batcher, cfg=cfg, pid=pid, nproc=nproc)
    steps_per_epoch = max(1, len(batcher))

    (det_model, det_state), (den_model, den_state) = init_joint_states(
        cfg, steps_per_epoch, seed=cfg.train.seed)
    step = make_joint_train_step(cfg, det_model, den_model, steps_per_epoch)
    det_mgr = CheckpointManager(det_model_dir)
    den_mgr = CheckpointManager(den_model_dir)
    clock = TrainClock()

    num_devices = args.num_devices
    if num_devices is None:
        num_devices = len(jax.devices())
        if nproc > 1:
            if cfg.train.batch_size % num_devices:
                raise ValueError(
                    f"multi-host: global batch {cfg.train.batch_size} must "
                    f"divide the global device count {num_devices}")
        else:
            while cfg.train.batch_size % num_devices:
                num_devices -= 1
    mesh = make_mesh(num_devices=num_devices)
    from sos_tpu.parallel import distributed
    from sos_tpu.train.fit import MetricsLog
    from sos_tpu.utils.meters import StepTimer

    # the joint run's durable log lives under the detector stage dir
    # (either stage dir would do; report --train_log picks it up there)
    jsonl = MetricsLog(det_log_dir)
    timer = StepTimer()
    try:
        with mesh:
            det_state = distributed.replicate(det_state, replicated(mesh))
            den_state = distributed.replicate(den_state, replicated(mesh))
            for epoch in range(cfg.train.nr_epochs):
                batcher.set_epoch(epoch)
                for batch in batcher:
                    timer.start()
                    det_state, den_state, metrics = step(
                        det_state, den_state, shard_batch(batch, mesh))
                    timer.stop()
                    if clock.step % 10 == 0:
                        det_loss = float(metrics["detector_loss"])
                        den_loss = float(metrics["denoiser_loss"])
                        print(f"step {clock.step}: det={det_loss:.4f} "
                              f"den={den_loss:.4f}")
                        jsonl.write("train", clock.step, epoch,
                                    dict(detector_loss=det_loss,
                                         denoiser_loss=den_loss,
                                         steps_per_sec=timer.steps_per_sec))
                    clock.tick()
                clock.tock()
                det_mgr.save_epoch(det_state, clock)
                den_mgr.save_epoch(den_state, clock)
                jsonl.write("epoch", clock.step, epoch, {})
    finally:
        jsonl.close()
    print("joint training complete")


if __name__ == "__main__":
    main()
