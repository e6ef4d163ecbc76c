"""Native (C++) host runtime: audio decode/resample/mix engine."""

from sos_tpu.runtime.engine import NativeAudioEngine, native_available  # noqa: F401
