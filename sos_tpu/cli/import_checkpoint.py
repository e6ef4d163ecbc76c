"""Import reference PyTorch checkpoints into the experiment layout.

Usage:
    python -m sos_tpu.cli.import_checkpoint --stage detector \
        --pth ckpt_epoch87.pth [--name experiment] [--fast_profile]

Converts a released `.pth` (m1/m2 agent.py:62-83 layout) into an orbax
checkpoint named like the source epoch under
`{output_root}/{name}_{stage}/model/`, so every other CLI can use it via
`--ckpt {epoch}` / `--ckpt latest`. `--fast_profile` widens the
48-channel encoders to 64 losslessly (zero-padded weights; see
docs/ARCHITECTURE.md §2) for ~1.3x faster inference on v5e.
"""

import argparse
import os
import re

from sos_tpu.cli.common import config_from_args, experiment_dirs
from sos_tpu.train.checkpoints import CheckpointManager, state_from_torch_variables
from sos_tpu.train.state import TrainClock


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--stage", choices=("detector", "denoiser"),
                        required=True)
    parser.add_argument("--pth", type=str, required=True)
    parser.add_argument("--name", type=str, default="experiment")
    parser.add_argument("--output_root", type=str, default="model_output")
    parser.add_argument("--config_json", type=str, default=None)
    parser.add_argument("--fast_profile", action="store_true",
                        help="widen 48-ch encoders to 64 (lossless zero-pad)")
    args = parser.parse_args()

    import dataclasses

    cfg = config_from_args(args, stage=args.stage)
    if args.fast_profile:
        from sos_tpu.config import fast_denoiser_config, fast_detector_config

        if args.stage == "detector":
            cfg = dataclasses.replace(cfg, detector=fast_detector_config())
        else:
            cfg = dataclasses.replace(cfg, denoiser=fast_denoiser_config())
    _, _, model_dir = experiment_dirs(cfg, args.stage)

    from sos_tpu.models.torch_import import (
        denoiser_torch_to_flax, detector_torch_to_flax, load_pth)

    state_np = load_pth(args.pth)
    if args.stage == "detector":
        from sos_tpu.train.loop import init_detector_state

        variables = detector_torch_to_flax(
            state_np, nf=cfg.detector.nf if args.fast_profile else None)
        _, template = init_detector_state(cfg, steps_per_epoch=1)
    else:
        from sos_tpu.train.loop import init_denoiser_state

        variables = denoiser_torch_to_flax(
            state_np,
            nf_noise=cfg.denoiser.nf_noise if args.fast_profile else None)
        _, template = init_denoiser_state(cfg, steps_per_epoch=1)

    state = state_from_torch_variables(variables, template)
    match = re.search(r"epoch(\d+)", os.path.basename(args.pth))
    epoch = int(match.group(1)) if match else 0
    mgr = CheckpointManager(model_dir)
    clock = TrainClock(epoch=epoch)
    path = mgr.save_epoch(state, clock)
    print(f"imported {args.pth} -> {path} (and 'latest')")


if __name__ == "__main__":
    main()
