"""Native (C++) host runtime: audio decode/resample/mix engine."""

from sos_tpu.runtime.engine import (  # noqa: F401
    NativeAudioEngine,
    native_available,
    resampled_length,
)
