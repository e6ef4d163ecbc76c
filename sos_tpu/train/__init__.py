"""Training subsystem: functional train states, jitted steps, checkpoints."""

from sos_tpu.train.state import TrainState, TrainClock  # noqa: F401
from sos_tpu.train.loop import (  # noqa: F401
    make_detector_train_step,
    make_detector_eval_step,
    make_denoiser_train_step,
    make_denoiser_eval_step,
    make_lr_schedule,
    init_detector_state,
    init_denoiser_state,
)
