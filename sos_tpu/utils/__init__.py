"""Utilities: meters, logging, directory helpers."""

from sos_tpu.utils.meters import AverageMeter, StepTimer  # noqa: F401
from sos_tpu.utils.io import ensure_dir, cycle  # noqa: F401
