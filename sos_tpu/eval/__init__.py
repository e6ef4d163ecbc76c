"""Evaluation suite: detection statistics + speech-quality metrics."""

from sos_tpu.eval.detection import detection_statistics  # noqa: F401
from sos_tpu.eval.speech import evaluate_metrics, composite_eval  # noqa: F401
from sos_tpu.eval.stoi import stoi  # noqa: F401
