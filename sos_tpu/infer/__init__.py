"""Inference: detector/denoiser predictors, fused single-program pipeline, streaming."""

from sos_tpu.infer.detect import DetectorPredictor  # noqa: F401
from sos_tpu.infer.denoise import DenoiserPredictor  # noqa: F401
from sos_tpu.infer.fused import FusedDenoisePipeline  # noqa: F401
from sos_tpu.infer.streaming import StreamingDenoiser, StreamingSession  # noqa: F401
from sos_tpu.infer.synthetic_eval import evaluate_synthetic  # noqa: F401
