"""Data layer: dataset-JSON index, bitstream windowing, noise sampling, pipelines."""

from sos_tpu.data.index import DatasetIndex, FileRecord  # noqa: F401
from sos_tpu.data.windows import (  # noqa: F401
    detector_windows,
    denoiser_windows,
    subsample_windows,
)
from sos_tpu.data.sampling import NoiseBank  # noqa: F401
from sos_tpu.data.pipeline import (  # noqa: F401
    DetectorBatcher,
    DenoiserBatcher,
    device_mix_and_stft_detector,
    device_mix_and_stft_denoiser,
)
